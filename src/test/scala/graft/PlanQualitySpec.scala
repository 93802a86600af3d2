package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.operators.{CrawlOps, ScanOps, TrainingOps}

/** Physical-plan quality gates: the 100 TB design point requires scans to
  * prune columns, small sides to broadcast, and row-local ops to stay
  * shuffle-free — asserted here so a regression in plan shape fails CI,
  * not just slows the bench.
  */
class PlanQualitySpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def planString(df: DataFrame): String = {
    val qe = castToImpl(df).queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("dedup bootstrap: pruned scan + broadcast limits join") {
    val p = planString(CrawlOps.dedupBootstrap(spark, sf()))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "limits join is not broadcast:\n" + p)
    // scan must read only the 3 needed columns of events
    assert(p.contains("ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,event_type:string>"),
      "events scan is not column-pruned:\n" + p)
  }

  test("row-local text ops compile to a single shuffle-free scan") {
    for (df <- Seq(
        TrainingOps.langId(spark, sf()),
        TrainingOps.fingerprints(spark, sf()),
        TrainingOps.qualityScores(spark, sf()),
        ScanOps.htmlClean(spark, sf()))) {
      val p = planString(df)
      assert(!p.contains("Exchange"), "unexpected shuffle:\n" + p)
      // "*(n)" prefixes mark WholeStageCodegen spans in toString form
      assert(p.contains("*(1)"), "no codegen span:\n" + p)
    }
  }

  test("brute-force ANN: query side broadcast, corpus never shuffled pre-score") {
    val p = planString(TrainingOps.bruteForceTopK(spark, sf()))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query side not broadcast:\n" + p)
    // embeddings scan reads only (vec_id, embedding) — label pruned
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "embeddings scan not pruned to (vec_id, embedding):\n" + p)
  }

  test("robots gate: rules join is broadcast, not shuffled") {
    val p = planString(CrawlOps.robotsGate(spark, sf()))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), "rules join fell back to SMJ:\n" + p)
  }

  test("section assignment: LIKE-rules join is broadcast") {
    val p = planString(ScanOps.sectionAssign(spark, sf()))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("json payload drill reads only (event_id, props)") {
    val p = planString(ScanOps.jsonPayload(spark, sf()))
    assert(p.contains("ReadSchema: struct<event_id:bigint,props:string>"),
      "props scan not pruned:\n" + p)
  }
}
