package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.CrawlOps

/** Content-change revisit laws: verdict partition matches the planted
  * mutation classes exactly, re_emit follows the verdict, sentinel
  * discipline, and the one-uniform-key-join plan.
  */
class RecrawlChangedSpec extends SparkTestBase {

  private lazy val out = CrawlOps.recrawlChanged(spark, sf()).cache()

  test("verdicts match the planted classes: %3==0 changed, %3==1 " +
      "unchanged, %3==2 gone, %7==0 minted new — counts exact") {
    val ids = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val want = Map(
      "changed" -> ids.count(_ % 3 == 0).toLong,
      "unchanged" -> ids.count(_ % 3 == 1).toLong,
      "gone" -> ids.count(_ % 3 == 2).toLong,
      "new" -> ids.count(_ % 7 == 0).toLong)
    val got = out.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"verdict counts $got != planted $want")
  }

  test("re_emit is exactly the changed/new set (the refetch's output " +
      "mass); unchanged and gone never re-emit") {
    assert(out.filter(col("re_emit") =!=
      col("verdict").isin("changed", "new")).isEmpty)
  }

  test("sentinel discipline: -1 exactly on the absent side, never both") {
    val bad = out.filter(
      (col("verdict") === "new" && col("old_fp") =!= -1L) ||
        (col("verdict") === "gone" && col("new_fp") =!= -1L) ||
        (col("old_fp") === -1L && col("new_fp") === -1L) ||
        (col("verdict").isin("changed", "unchanged") &&
          (col("old_fp") === -1L || col("new_fp") === -1L)))
    assert(bad.isEmpty)
  }

  test("plan gate: one full-outer join on the URL key; no cartesian") {
    val plan = castToImpl(CrawlOps.recrawlChanged(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
