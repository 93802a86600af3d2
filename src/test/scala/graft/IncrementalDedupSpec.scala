package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Incremental dedup (new crawl batch vs the persisted corpus index):
  * the batch×index path must compute EXACTLY the bootstrap's verdicts on
  * the restriction, aggregate them faithfully, and emit one verdict per
  * batch doc — on both dispatch paths.
  */
class IncrementalDedupSpec extends SparkTestBase {

  private def isBatch(c: Column): Column =
    c >= 100000 && pmod(c, lit(10L)) === 7

  test("pair verdicts ≡ bootstrap jaccardVerifiedPairs restricted to " +
      "batch×index pairs") {
    val restricted = TrainingOps.jaccardVerifiedPairs(spark, sf())
      .filter(isBatch(col("doc_a")) =!= isBatch(col("doc_b")))
      .select(
        when(isBatch(col("doc_a")), col("doc_a")).otherwise(col("doc_b"))
          .as("batch_id"),
        when(isBatch(col("doc_a")), col("doc_b")).otherwise(col("doc_a"))
          .as("corpus_id"),
        col("inter"), col("is_dup"))
      .collect().map(_.toSeq).toSet
    val incr = TrainingOps.incrementalPairVerdicts(spark, sf())
      .select("batch_id", "corpus_id", "inter", "is_dup")
      .collect().map(_.toSeq).toSet
    assert(incr.nonEmpty, "no batch×index candidates on the fixture")
    assert(incr === restricted,
      s"incremental verdicts diverge from the bootstrap restriction: " +
        s"only-incremental=${(incr -- restricted).take(3)} " +
        s"only-bootstrap=${(restricted -- incr).take(3)}")
  }

  test("aggregation laws: counts/match derive from the pair verdicts; " +
      "every batch doc gets a row") {
    val verdicts = TrainingOps.incrementalPairVerdicts(spark, sf())
      .collect().map(r => (r.getLong(r.fieldIndex("batch_id")),
        r.getLong(r.fieldIndex("corpus_id")),
        r.getBoolean(r.fieldIndex("is_dup"))))
    val byBatch = verdicts.groupBy(_._1)
    val out = TrainingOps.incrementalDedup(spark, sf()).collect()
    val nBatchDocs = TrainingOps.nearDupCorpus(spark, sf())
      .filter(isBatch(col("doc_id"))).count()
    assert(out.length.toLong === nBatchDocs,
      "one verdict row per batch doc, including zero-candidate docs")
    out.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val nc = r.getLong(r.fieldIndex("n_candidates"))
      val nd = r.getLong(r.fieldIndex("n_dup_matches"))
      val cm = r.getLong(r.fieldIndex("corpus_match"))
      val admit = r.getBoolean(r.fieldIndex("admit"))
      val vs = byBatch.getOrElse(id, Array.empty[(Long, Long, Boolean)])
      assert(nc === vs.length.toLong, s"doc $id candidate count")
      val dups = vs.filter(_._3)
      assert(nd === dups.length.toLong, s"doc $id dup count")
      assert(cm === (if (dups.isEmpty) -1L else dups.map(_._2).min),
        s"doc $id corpus_match")
      assert(admit === dups.isEmpty, s"doc $id admit")
    }
  }

  test("re-posted twins are rejected and matched back to their base doc") {
    val out = TrainingOps.incrementalDedup(spark, sf()).collect()
    val rejected = out.filter(!_.getBoolean(4))
    assert(rejected.nonEmpty, "no batch doc was rejected — fixture broken?")
    // at least one twin's best corpus match is its OWN base (id - 100000):
    // the tail-chopped twin shares most of its shingles with the original
    val selfMatched = rejected.count(r => r.getLong(3) === r.getLong(0) - 100000)
    assert(selfMatched > 0,
      "no rejected twin matched its base doc — the index probe is not " +
        "finding the planted near-dups")
    // and every rejected doc names a real match; every admitted doc none
    out.foreach { r =>
      if (r.getBoolean(4)) assert(r.getLong(3) === -1L)
      else assert(r.getLong(3) >= 0L)
    }
  }

  test("dispatch equality: forced-shuffle path (gate 0) returns the " +
      "identical verdict set") {
    val a = TrainingOps.incrementalDedup(spark, sf())
      .collect().map(_.toSeq).toSet
    val b = TrainingOps.incrementalDedup(spark, sf(), maxBroadcastBytes = 0L)
      .collect().map(_.toSeq).toSet
    assert(a === b, "dispatch paths disagree")
  }
}
