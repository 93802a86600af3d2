package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.operators.CrawlOps

/** Laws of the bucketed at-rest seen layout (CrawlOps.antiJoinSeenBucketed):
  * row-identity with the plain anti-join (layout must never change
  * results), the ZERO-exchange plan the layout buys, and idempotent
  * re-writes of the bucketed tables.
  */
class BucketedSeenSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    val qe = castToImpl(df).queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("bucketed layout changes the plan, never the rows: result is " +
      "identical to the plain anti-join") {
    val bucketed = CrawlOps.antiJoinSeenBucketed(spark, sf())
    val plain = CrawlOps.antiJoinSeen(spark, sf())
    assert(bucketed.exceptAll(plain).isEmpty &&
      plain.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)
  }

  test("the probe join plans with ZERO exchanges: both scans carry the " +
      "bucket spec, the merge anti-join runs bucket-to-bucket") {
    val p = planOf(CrawlOps.antiJoinSeenBucketed(spark, sf()))
    assert(!p.contains("Exchange"),
      "bucketed co-location must remove every exchange:\n" + p)
    assert(p.contains("SortMergeJoin") && p.contains("LeftAnti"),
      "expected a merge anti-join:\n" + p)
    assert(p.contains("Bucketed: true"),
      "scans must actually select the bucketed layout:\n" + p)
  }

  test("re-writing the layout is idempotent: a second call overwrites " +
      "and returns the identical rows") {
    val first = CrawlOps.antiJoinSeenBucketed(spark, sf()).collect().toSet
    val second = CrawlOps.antiJoinSeenBucketed(spark, sf()).collect().toSet
    assert(first == second)
  }
}
