package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SearchOps

/** Laws of the retrieval family (SearchOps): the two-stage partial top-k
  * ≡ the global window on the generalized (string-id) kernel, the
  * cross-modal law (a caption query's rank-1 hit is its joint-duplicate
  * twin at the maximal self score), postings repartition-invariance, and
  * the plan gates (query side broadcast — never an SMJ or a cartesian).
  */
class SearchOpsSpec extends SparkTestBase {

  test("postings are repartition-invariant and carry exact tf") {
    val corpus = graft.operators.TrainingOps.docs(spark, sf())
    val a = SearchOps.postingsOf(corpus, "doc_id").collect().toSet
    val b = SearchOps.postingsOf(corpus.repartition(7), "doc_id")
      .collect().toSet
    assert(a == b && a.nonEmpty)
    // spot law: Σ tf per doc == that doc's whitespace token count
    val perDoc = SearchOps.postingsOf(corpus, "doc_id")
      .groupBy("doc_id").agg(sum("tf").as("s"))
    val direct = corpus.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("s"))
    assert(perDoc.exceptAll(direct).isEmpty)
  }

  test("two-stage rankTopK is exactly the global top-k window, string ids " +
      "included") {
    val post = SearchOps.postingsOf(
      graft.operators.TrainingOps.docs(spark, sf()), "doc_id")
    val lex = SearchOps.lexiconOf(post,
      graft.operators.TrainingOps.docs(spark, sf())
        .agg(count(lit(1)).as("n_docs")))
    val qt = lex.orderBy(desc("df"), asc("token")).limit(6)
      .withColumn("query_id", lit(0L))
      .select(col("query_id"), col("token"), col("idf").as("w"))
    val scored = post.join(broadcast(qt), "token")
      .groupBy("query_id", "doc_id").agg(sum(col("tf") * col("w")).as("score"))
    val twoStage = SearchOps.rankTopK(scored, "doc_id", 10)
    val global = scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("score"), asc("doc_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select("query_id", "doc_id", "score", "rank")
    assert(twoStage.exceptAll(global).isEmpty &&
      global.exceptAll(twoStage).isEmpty)
    assert(twoStage.count() == 10)
  }

  test("cross-modal law: every caption query's rank-1 hit is its own " +
      "re-encode twin, at the maximal (self) score") {
    val got = SearchOps.captionTfidfTopK(spark, nImages = 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.foreach { case (q, rows) =>
      val top = rows.find(_._4 == 1L).get
      assert(top._2 == f"img-$q%08d_d",
        s"query $q rank-1 should be the twin, got ${top._2}")
      // the twin's score is the strict maximum: no other image shares the
      // unique img-token, so every other score is strictly smaller
      val rest = rows.filter(_._4 > 1L).map(_._3)
      assert(rest.forall(_ < top._3))
    }
  }

  test("plan gates: query-term side broadcasts (no SortMergeJoin), no " +
      "cartesian product, and both rank stages are present") {
    Seq(SearchOps.docTfidfTopK(spark, sf()),
        SearchOps.captionTfidfTopK(spark, nImages = 200L)).foreach { df =>
      val plan = castToImpl(df).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        "query side must broadcast:\n" + plan)
      assert(!plan.contains("CartesianProduct"),
        "the n_docs scalar must broadcast, not cartesian:\n" + plan)
      assert(plan.contains("__subrank"),
        "two-stage partial top-k must be in the plan:\n" + plan)
    }
  }
}
