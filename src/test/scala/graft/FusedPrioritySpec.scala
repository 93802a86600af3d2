package graft

import org.apache.spark.sql.functions._

import graft.operators.{CrawlOps, TrainingOps}

/** The crawl ↔ corpus loop closed: fused priority laws — the exact
  * re-weighting formula, live (non-constant) feedback, echo of both
  * inputs, and per-host rank discipline.
  */
class FusedPrioritySpec extends SparkTestBase {

  private lazy val out = CrawlOps.fusedFrontierPriority(spark, sf()).cache()

  test("re-weighting formula is exact: fused = priority * keep_pm div " +
      "1000, and both inputs echo their source operators") {
    assert(out.filter(col("fused_priority") =!=
      expr("priority * keep_pm div 1000")).isEmpty)
    val fb = TrainingOps.sourceQualityFeedback(spark, sf())
      .select(col("source"), col("keep_permille_smoothed").as("want"))
    assert(out.join(fb, Seq("source"))
      .filter(col("keep_pm") =!= col("want")).isEmpty)
    val opic = CrawlOps.opicPriority(spark, sf())
      .select(col("child"), col("priority").as("want_p"))
    assert(out.join(opic, Seq("child"))
      .filter(col("priority") =!= col("want_p")).isEmpty)
  }

  test("the feedback is live, not a constant: sources differ in yield " +
      "on this corpus, so the re-weighting actually reorders") {
    assert(out.select("keep_pm").distinct().count() > 1,
      "every source has identical yield — the fusion is vacuous here")
    // at least one host's fused order differs from its raw-priority order
    val reordered = out
      .withColumn("raw_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("host")
          .orderBy(desc("priority"), asc("child"))).cast("long"))
      .filter(col("raw_rank") =!= col("host_rank"))
    assert(reordered.count() > 0,
      "yield re-weighting changed no host queue on this fixture")
  }

  test("per-host rank discipline: contiguous from 1, strictly ordered " +
      "by (fused desc, child asc)") {
    val shape = out.groupBy("host")
      .agg(count(lit(1)).as("n"), min("host_rank").as("lo"),
        max("host_rank").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(shape.isEmpty)
    val outOfOrder = out.as("a").join(out.as("b"),
      col("a.host") === col("b.host") &&
        col("a.host_rank") === col("b.host_rank") - 1)
      .filter(col("a.fused_priority") < col("b.fused_priority") ||
        (col("a.fused_priority") === col("b.fused_priority") &&
          col("a.child") >= col("b.child")))
    assert(outOfOrder.isEmpty)
  }
}
