package graft

import graft.operators.TrainingOps

/** Laws for the inter-document duplicate-span-mass signal
  * (TrainingOps.dupSpanMassFrom): doc-frequency semantics, the coverage
  * arithmetic, and the fixture-level guarantee that synthetic twins earn
  * nonzero duplicate mass.
  */
class DupSpanMassSpec extends SparkTestBase {

  private def run(rows: (Long, Long)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TrainingOps.dupSpanMassFrom(rows.toDF("doc_id", "shh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("a shingle is duplicate iff it occurs in more than one doc") {
    val m = run(
      1L -> 10L, 1L -> 11L, 1L -> 12L, // shares {11,12} with doc 2
      2L -> 11L, 2L -> 12L,            // fully covered by doc 1
      3L -> 99L)                       // unique everywhere
    assert(m(1L) == ((3L, 2L, 666L)))
    assert(m(2L) == ((2L, 2L, 1000L)))
    assert(m(3L) == ((1L, 0L, 0L)))
  }

  test("single-doc corpus: zero duplicate mass by definition") {
    val m = run(1L -> 10L, 1L -> 11L)
    assert(m(1L) == ((2L, 0L, 0L)))
  }

  test("span removal: first occurrence survives, later copies are edited out") {
    import spark.implicits._
    // doc 1: 20 words (2 chunks); doc 2: exact copy — must be fully
    // removed; doc 3: shares doc 1's first 10-word chunk, then unique tail
    val c1 = (0 until 10).map(i => s"a$i").mkString(" ")
    val c2 = (0 until 10).map(i => s"b$i").mkString(" ")
    val c3 = (0 until 10).map(i => s"z$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$c1 $c2"), (2L, s"$c1 $c2"), (3L, s"$c1 $c3")
    ).toDF("doc_id", "text")
    val m = TrainingOps.removeDupSpansFrom(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(m(1L) == ((2L, 2L, s"$c1 $c2"))) // first occurrence: intact
    assert(m(2L) == ((2L, 0L, "")))         // exact copy: fully removed
    assert(m(3L) == ((2L, 1L, c3)))         // shared prefix gone, tail kept
  }

  test("span removal: within-doc repeats collapse; global keeper is unique") {
    import spark.implicits._
    val c = (0 until 10).map(i => s"w$i").mkString(" ")
    val corpus = Seq((7L, s"$c $c")).toDF("doc_id", "text") // chunk twice
    val m = TrainingOps.removeDupSpansFrom(corpus).head()
    assert((m.getLong(1), m.getLong(2), m.getString(3)) == ((2L, 1L, c)))
  }

  test("span removal sf fixture: totals account, twins are net removed") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val out = TrainingOps.removeDupSpans(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: kept exceeds total")
    }
    // keeper-uniqueness law: exactly one occurrence survives per distinct
    // chunk, so total kept mass == distinct chunk-hash count
    val corpus = TrainingOps.nearDupCorpus(spark, dir)
      .withColumn("w", filter(split(col("text"), "\\s+"), x => x =!= ""))
      .filter(size(col("w")) > 0)
      .withColumn("nc", ceil(size(col("w")) / lit(10.0)).cast("int"))
      .select(explode(transform(sequence(lit(0), col("nc") - 1),
        i => array_join(slice(col("w"), i * 10 + 1, lit(10)), " "))).as("c"))
    val distinctChunks = corpus.distinct().count()
    assert(out.map(_.getLong(2)).sum == distinctChunks,
      "sum(kept) must equal the distinct chunk count")
    // twins (doc_id >= 100000) are truncated copies: whenever a twin still
    // contains an aligned full chunk of its original, it loses that chunk
    // to the original's smaller doc_id — on this corpus that is most twins
    val twins = out.filter(_.getLong(0) >= 100000L)
    assert(twins.nonEmpty)
    assert(twins.count(r => r.getLong(2) < r.getLong(1)) > twins.length / 2,
      "most twins must lose chunks to their originals")
  }

  test("sf fixture: twins earn duplicate mass, invariants hold per doc") {
    val out = TrainingOps.dupSpanMass(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, nd, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd <= n, s"doc ${r.getLong(0)}: dup count exceeds total")
      assert(pm == nd * 1000 / n, "per-mille arithmetic")
    }
    // every corpus doc has a synthetic near-dup twin (doc_id + 100000,
    // a prefix mutation), so heavy duplicate coverage must exist — the
    // signal the operator exists to surface
    assert(out.count(_.getLong(3) >= 500) > out.length / 2,
      "twin-dominated corpus: most docs are mostly duplicated elsewhere")
  }
}
