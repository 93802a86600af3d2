package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.ScanOps

/** Composed discovery laws: robots advertises the sitemap, the sitemap
  * lists the URLs, the politeness budget rides along — the full
  * discovery loop in one plan.
  */
class SitemapDiscoverySpec extends SparkTestBase {

  private lazy val out = ScanOps.sitemapDiscovery(spark, sf()).cache()

  test("coverage: every sitemap entry of every advertised host appears " +
      "exactly once — the composition loses nothing") {
    val entries = ScanOps.sitemapScan(spark, sf())
    assert(out.count() == entries.count())
    assert(out.groupBy("host", "loc").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("the advertisement is consistent: sitemap_url lives on the host " +
      "it was advertised for, and every loc lives on that host too") {
    val bad = out.filter(
      !col("sitemap_url").startsWith(concat(lit("https://"), col("host"))) ||
        !col("loc").startsWith(concat(lit("https://"), col("host"))))
    assert(bad.isEmpty, s"cross-host discovery: ${bad.take(3).mkString(";")}")
  }

  test("the politeness budget rides along: crawl_delay_ms echoes the " +
      "host's parsed Crawl-delay rule") {
    val delays = ScanOps.robotsParse(spark, sf())
      .filter(col("directive") === "Crawl-delay")
      .select(col("host"), col("crawl_delay_ms").as("want"))
    val bad = out.join(delays, Seq("host"))
      .filter(col("crawl_delay_ms") =!= col("want"))
    assert(bad.isEmpty)
  }

  test("robots rule rows are unchanged by the Sitemap field (appended " +
      "last): only the three rule directives surface, line numbers " +
      "start at 1") {
    val rp = ScanOps.robotsParse(spark, sf())
    assert(rp.filter(!col("directive")
      .isin("Allow", "Disallow", "Crawl-delay")).isEmpty)
    assert(rp.groupBy("host").agg(min("line_no").as("lo"))
      .filter(col("lo") =!= 1).isEmpty)
  }

  test("plan gate: both composition joins broadcast the one-row-per-" +
      "host dims; no cartesian") {
    val plan = castToImpl(ScanOps.sitemapDiscovery(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("SortMergeJoin"))
  }
}
