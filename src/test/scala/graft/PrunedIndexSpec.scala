package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.{SearchOps, TrainingOps}

/** Impact-ordered static index pruning: truncation moves CANDIDACY,
  * never scores — the lossless bound, score preservation, and the
  * recall-vs-p dial.
  */
class PrunedIndexSpec extends SparkTestBase {

  private def recallAt10(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select("query_id", "doc_id")
      .join(approx.select("query_id", "doc_id"), Seq("query_id", "doc_id"))
      .count()
    hit.toDouble / exact.count()
  }

  test("lossless bound: p ≥ max df reproduces the full BM25 ranking " +
      "exactly") {
    val full = SearchOps.docBm25TopK(spark, sf())
      .collect().map(_.toSeq).toSet
    val pruned = SearchOps.docBm25PrunedTopK(spark, sf(), p = 1 << 20)
      .collect().map(_.toSeq).toSet
    assert(pruned == full,
      s"only-pruned=${(pruned -- full).take(3)} " +
        s"only-full=${(full -- pruned).take(3)}")
  }

  test("partial-sum law: a pruned score is a lower bound on the full " +
      "score (truncation removes contributions, never inflates), and " +
      "every pruned pair exists in the full candidate set") {
    // full scored table = BM25 with k past any candidate count
    val fullScores = SearchOps.docBm25TopK(spark, sf(), k = 1 << 20)
      .select(col("query_id"), col("doc_id"), col("score").as("full_score"))
    val pruned = SearchOps.docBm25PrunedTopK(spark, sf())
    val joined = pruned.join(fullScores, Seq("query_id", "doc_id"), "left")
    assert(joined.filter(col("full_score").isNull).isEmpty,
      "pruned result contains a pair the full index never scored")
    val inflated = joined.filter(col("score") > col("full_score"))
    assert(inflated.isEmpty,
      s"truncation inflated a score: ${inflated.take(3).mkString(";")}")
    // and the bound is TIGHT somewhere: docs whose every query-term
    // posting survived keep their exact score
    assert(!joined.filter(col("score") === col("full_score")).isEmpty,
      "no pruned pair kept its full score — the exactness claim of " +
        "surviving contributions is not exercised")
  }

  test("recall dial: recall@10 vs the full ranking is monotone in p and " +
      "substantial at the serving default") {
    val full = SearchOps.docBm25TopK(spark, sf()).cache()
    val r16 = recallAt10(SearchOps.docBm25PrunedTopK(spark, sf(), p = 16), full)
    val rDefault = recallAt10(SearchOps.docBm25PrunedTopK(spark, sf()), full)
    assert(r16 <= rDefault + 1e-9, s"recall not monotone: $r16 vs $rDefault")
    // impact ordering keeps the postings that score high; the fixture's
    // tiny synthetic vocabulary ties tf values far more than natural
    // Zipf text (the cut is near-arbitrary among ties), so the measured
    // number here is the pessimistic floor, not the technique's ceiling
    assert(rDefault >= 0.3, s"recall@10 at default p: $rDefault")
  }

  test("plan gates: the prune rank is two-stage on the term key; no " +
      "sort-merge join, no cartesian in the serving plan") {
    val plan = castToImpl(SearchOps.docBm25PrunedTopK(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "query plan must hash-join")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("__subrank"),
      "prune must rank within (token, subgroup) first — no task may " +
        "hold a Zipf-hot term's full posting list")
  }
}
