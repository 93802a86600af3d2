package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.ScanOps

/** WARC record scan laws: the parser must EARN every output field from
  * the record bytes (the DuckDB oracle recomputes them analytically, this
  * spec pins the structural laws the hash compare can't localize).
  */
class WarcParseSpec extends SparkTestBase {

  private lazy val out = ScanOps.warcParse(spark, sf()).cache()
  private lazy val nEvents =
    spark.read.parquet(s"${sf()}/events.parquet").count()

  test("record accounting: one response per event plus one per odd event; " +
      "request records are filtered, never surfaced") {
    val nOdd = spark.read.parquet(s"${sf()}/events.parquet")
      .filter(col("event_id") % 2 === 1).count()
    assert(out.count() == nEvents + nOdd)
    assert(out.filter(col("warc_type") =!= "response").count() == 0L)
    // record positions: the first response parses at slab position 1,
    // the second (odd rows) at 3 — position 2 is the request record
    assert(out.filter(!col("rec_idx").isin(1L, 3L)).count() == 0L)
    assert(out.filter(col("rec_idx") === 3L).count() == nOdd)
  }

  test("content-length check: valid is false exactly on the %13 rows' " +
      "first record (declared one byte long), true everywhere else") {
    val badRows = out.filter(!col("valid"))
    assert(badRows.filter(
      col("event_id") % 13 =!= 0 || col("rec_idx") =!= 1L).count() == 0L)
    val n13 = spark.read.parquet(s"${sf()}/events.parquet")
      .filter(col("event_id") % 13 === 0).count()
    assert(badRows.count() == n13)
    // and on those rows the mismatch is exactly the planted single byte
    assert(badRows.filter(
      col("decl_len") =!= col("payload_len") + 1).count() == 0L)
  }

  test("parsed fields match the synthesis law: uri path letter tracks the " +
      "record ordinal, payload_len = 9 + len(id) + id % 17 on record 1") {
    val lawBreak = out.filter(col("rec_idx") === 1L).filter(
      col("payload_len") =!=
        lit(9) + length(col("event_id").cast("string")) +
        (col("event_id") % 17) ||
      !col("uri").contains("/articles/a"))
    assert(lawBreak.count() == 0L)
    assert(out.filter(col("rec_idx") === 3L)
      .filter(!col("uri").contains("/articles/b")).count() == 0L)
  }

  test("plan gate: the WARC scan is row-local — zero exchanges " +
      "(split + posexplode + regexp, all inside the scan stage)") {
    val plan = castToImpl(ScanOps.warcParse(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"WARC parse must not shuffle:\n$plan")
  }
}
