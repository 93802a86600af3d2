package graft

import org.apache.spark.sql.functions._

import graft.operators.CrawlOps

/** Laws of anchor-text aggregation (CrawlOps.anchorTopTermsFrom):
  * multiplicity counting, deterministic tie-breaks, contiguous ranks
  * capped at k, and targets with fewer than k terms.
  */
class AnchorTextSpec extends SparkTestBase {
  import spark.implicits._

  test("hand case: counts keep link multiplicity; ties break term-asc") {
    val edges = Seq(
      (1L, "news"), (1L, "news"), (1L, "sport"), (1L, "sport"),
      (1L, "tech"),
      (2L, "only")
    ).toDF("dst", "term")
    val out = CrawlOps.anchorTopTermsFrom(edges, k = 2)
      .orderBy("dst", "term_rank")
      .as[(Long, String, Long, Long)].collect().toSeq
    // dst 1: news(2) and sport(2) tie → term asc; tech(1) cut by k=2
    assert(out == Seq(
      (1L, "news", 2L, 1L),
      (1L, "sport", 2L, 2L),
      (2L, "only", 1L, 1L)))
  }

  test("fixture query: ranks are contiguous from 1 and never exceed k, " +
      "and every (dst, term) count equals the raw edge multiplicity") {
    val out = CrawlOps.anchorTextTopTerms(spark, sf(), k = 3).cache()
    try {
      assert(out.filter(col("term_rank") < 1 || col("term_rank") > 3)
        .count() == 0L)
      val contiguous = out.groupBy("dst")
        .agg(count(lit(1)).as("n"), max("term_rank").as("maxr"))
        .filter(col("n") =!= col("maxr")).count()
      assert(contiguous == 0L)
      // recount independently and compare on the ranked subset
      val raw = spark.read.parquet(s"${sf()}/events.parquet")
        .select((col("event_id") % 631).as("dst"),
          col("event_type").as("term"))
        .groupBy("dst", "term").agg(count(lit(1)).as("cnt2"))
      val mismatches = out.join(raw, Seq("dst", "term"))
        .filter(col("cnt") =!= col("cnt2")).count()
      assert(mismatches == 0L)
    } finally { out.unpersist(); () }
  }
}
