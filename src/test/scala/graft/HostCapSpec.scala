package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Per-host document caps: exact count bound per source, chosen by the
  * portable hash — deterministic, two-stage ≡ global window.
  */
class HostCapSpec extends SparkTestBase {

  test("every source keeps exactly min(cap, its doc count), ranks " +
      "contiguous from 1") {
    val cap = 10
    val kept = TrainingOps.docHostCap(spark, sf(), cap).cache()
    val perSource = kept.groupBy("source")
      .agg(count(lit(1)).as("n"), max("keep_rank").as("maxr"),
        min("keep_rank").as("minr"))
    val totals = TrainingOps.docs(spark, sf())
      .groupBy("source").agg(count(lit(1)).as("total"))
    val bad = perSource.join(totals, Seq("source"))
      .filter(col("n") =!= least(lit(cap.toLong), col("total")) ||
        col("maxr") =!= col("n") || col("minr") =!= 1L)
    assert(bad.isEmpty, s"cap violated: ${bad.take(3).mkString(";")}")
  }

  test("two-stage partial rank ≡ the global per-source window") {
    val cap = 10
    val got = TrainingOps.docHostCap(spark, sf(), cap)
      .collect().map(_.toSeq).toSet
    val h = TrainingOps.docs(spark, sf()).select(col("doc_id"),
      col("source"), TrainingOps.hash60(col("doc_id").cast("string")).as("h"))
    val want = h.withColumn("keep_rank", row_number().over(
        Window.partitionBy("source").orderBy(asc("h"), asc("doc_id")))
        .cast("long"))
      .filter(col("keep_rank") <= cap)
      .select("doc_id", "source", "keep_rank")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("repartition invariance: membership is a pure function of ids") {
    val a = TrainingOps.docHostCap(spark, sf(), 10)
      .collect().map(_.toSeq).toSet
    val b = TrainingOps.docHostCap(spark, sf(), 10)
      .repartition(7).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
