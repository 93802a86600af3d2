package graft

import org.apache.spark.sql.functions._

import graft.plans.PartitionFilterCheck

/** O1 — the engine-level analog of BigQuery's require_partition_filter
  * (reference deploy/create_bigquery_table.sql:31).
  */
class PartitionFilterCheckSpec extends SparkTestBase {

  private val dir = "target/test-pfc"

  private def writeFixture(): Unit = {
    import spark.implicits._
    Seq(("2025-01-01", "a", 1), ("2025-01-02", "b", 2))
      .toDF("dt", "source", "v")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)
  }

  test("unfiltered scan of a dt-partitioned table is rejected when enabled") {
    writeFixture()
    val check = PartitionFilterCheck(spark)
    spark.conf.set(check.ConfKey, "true")
    try {
      val plan = spark.read.parquet(dir).select("source")
        .queryExecution.analyzed
      val e = intercept[IllegalStateException](check(plan))
      assert(e.getMessage.contains("requirePartitionFilter"))
    } finally spark.conf.unset(check.ConfKey)
  }

  test("dt-filtered scan passes; non-partitioned scans are never touched") {
    writeFixture()
    val check = PartitionFilterCheck(spark)
    spark.conf.set(check.ConfKey, "true")
    try {
      check(spark.read.parquet(dir)
        .filter(col("dt") === "2025-01-01").select("source")
        .queryExecution.analyzed) // no throw
      check(spark.read.parquet(s"${sf()}/events.parquet")
        .select("event_id").queryExecution.analyzed) // no throw
    } finally spark.conf.unset(check.ConfKey)
  }

  test("disabled by default — maintenance reads stay possible") {
    writeFixture()
    val check = PartitionFilterCheck(spark)
    check(spark.read.parquet(dir).select("source").queryExecution.analyzed)
  }
}
