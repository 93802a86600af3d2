package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.{CleanOps, CrawlOps, TrainingOps}

/** Laws of the cleaning family (CleanOps) and the adaptive-politeness
  * operator: pigeonhole recall of the edit-distance blocking, planted-PII
  * accounting + redaction idempotence, boilerplate accounting against the
  * planted footers, exact-p95 delay vs a direct computation, and the
  * no-cartesian / single-exchange plan gates.
  */
class CleanOpsSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    castToImpl(df).queryExecution.executedPlan.toString

  test("edit blocking finds EVERY planted substitution twin at lev exactly " +
      "2 (pigeonhole recall), never via a cartesian product") {
    val docs = TrainingOps.docs(spark, sf())
    val nDocs = docs.count()
    val dups = CleanOps.editNearDups(spark, sf())
    val twinPairs = dups.filter(
      col("id_b") === col("id_a") + CleanOps.EditTwinOffset)
    assert(twinPairs.count() == nDocs,
      s"every one of the $nDocs twins must surface")
    assert(twinPairs.filter(col("lev") =!= 2 || !col("is_dup")).count() == 0)
    assert(!plan(dups).contains("CartesianProduct"))
  }

  test("edit twin corpus: twins are equal-length, at exactly 2 substituted " +
      "positions") {
    val c = CleanOps.editTwinCorpus(spark, sf())
    val base = c.filter(col("doc_id") < CleanOps.EditTwinOffset)
      .select(col("doc_id"), col("text").as("ta"))
    val twin = c.filter(col("doc_id") >= CleanOps.EditTwinOffset)
      .select((col("doc_id") - CleanOps.EditTwinOffset).as("doc_id"),
        col("text").as("tb"))
    val joined = base.join(twin, "doc_id")
      .select(length(col("ta")).as("la"), length(col("tb")).as("lb"),
        levenshtein(col("ta"), col("tb")).as("lev"))
    assert(joined.filter(col("la") =!= col("lb") || col("lev") =!= 2)
      .count() == 0)
  }

  test("PII accounting matches the planting exactly; redaction is " +
      "idempotent and total") {
    val out = CleanOps.piiScrub(spark, sf())
    // counts are exactly the planted indicators — the base corpus is a
    // PII-free word salad
    val wrong = out.filter(
      col("n_emails") =!= when(col("doc_id") % 5 === 0, 1L).otherwise(0L) ||
      col("n_phones") =!= when(col("doc_id") % 7 === 0, 1L).otherwise(0L) ||
      col("n_ips") =!= when(col("doc_id") % 11 === 0, 1L).otherwise(0L))
    assert(wrong.count() == 0)
    assert(out.filter(col("doc_id") % 5 === 0).count() > 0)
    // scrubbing the scrubbed text finds nothing (idempotence = totality
    // of the redaction)
    val again = CleanOps.piiScrubOf(
      out.select(col("doc_id"), col("clean_text").as("text")))
    assert(again.filter(col("n_emails") + col("n_phones") + col("n_ips")
      =!= 0L).count() == 0)
    // zero shuffles: the scan IS the job
    assert(!plan(out).contains("Exchange"))
  }

  test("boilerplate: both planted footers removed from every doc, body and " +
      "unique notes kept verbatim") {
    val out = CleanOps.boilerplateRemoval(spark, sf())
    val docs = TrainingOps.docs(spark, sf())
    val expected = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, lit(4L)).otherwise(3L).as("n_lines"),
      when(col("doc_id") % 3 === 0, lit(2L)).otherwise(1L).as("kept_lines"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" | unique note "),
          col("doc_id").cast("string")))
        .otherwise(col("text")).as("clean_text"))
    assert(out.exceptAll(expected).isEmpty &&
      expected.exceptAll(out).isEmpty)
  }

  test("adaptive delay: exact integer p95 per host matches a direct " +
      "computation; delay is floored at the base; histogram-cumulative " +
      "plan shape") {
    val out = CrawlOps.adaptiveDelay(spark, sf())
    val got = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lat = spark.read.parquet(sf() + "/events.parquet")
      .select(col("event_type"), pmod(col("event_id"), lit(997L)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.map(_._1).toSet == lat.keySet)
    got.foreach { case (host, nObs, p95, delay) =>
      val xs = lat(host)
      assert(nObs == xs.length)
      val idx = (95 * xs.length + 99) / 100 // ceil(0.95 n), 1-based
      assert(p95 == xs(idx - 1), s"$host p95")
      assert(delay == math.max(1000L, p95 * 2))
    }
    // the AQE plan string repeats the plan under "== Initial Plan ==" —
    // gate on the final section only. Histogram-cumulative shape: the
    // (host, lat) count combines map-side BEFORE any window, and no
    // full-history sort (rangepartitioning) appears anywhere.
    val p = plan(out).split("== Initial Plan ==")(0)
    assert(p.contains("partial_count"),
      "latency histogram must combine map-side:\n" + p)
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "no global/per-host history sort belongs here:\n" + p)
    assert(p.contains("hashpartitioning(host"),
      "cumulative window must partition by host:\n" + p)
  }
}
