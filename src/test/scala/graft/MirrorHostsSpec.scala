package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.CrawlOps

/** Mirror-host detection laws. Fixture ground truth by construction:
  * m(k) serves exactly the even docs of h(k) — a full mirror, 1000‰ of
  * the m side; s(k) mixes syndicated (%5) docs with its own (%3, salted
  * fp) articles — a partial syndicator. The host key 37 is coprime with
  * 2/3/5, so neither containment nor vacuity can arise from modular
  * correlation (the % 40 bug this fixture once had).
  */
class MirrorHostsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val pairs = CrawlOps.mirrorHosts(spark, sf()).cache()
  private lazy val docIds: Seq[Long] =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id").as[Long].collect().toSeq

  test("internal consistency: flag derives from overlap_pm; shared is " +
      "bounded by both sizes; pm is a per-mille of the smaller side") {
    val bad = pairs.filter(
      (col("is_mirror") =!= (col("overlap_pm") >= CrawlOps.MirrorPerMille)) ||
        col("shared") < 1 ||
        col("shared") > least(col("size_a"), col("size_b")) ||
        col("overlap_pm") > 1000)
    assert(bad.isEmpty, s"inconsistent: ${bad.take(3).mkString(";")}")
  }

  test("every planted full mirror is flagged: (h_k, m_k) at exactly " +
      "1000 per-mille for every k with an even doc") {
    val ks = docIds.filter(_ % 2 == 0).map(_ % 37).distinct
    val hm = pairs.filter(
      col("host_a").startsWith("h") && col("host_b").startsWith("m") &&
        expr("substr(host_a, 2)") === expr("substr(host_b, 2)")).cache()
    assert(hm.count() == ks.size.toLong,
      s"expected ${ks.size} h-m pairs, got ${hm.count()}")
    val weak = hm.filter(!col("is_mirror") || col("overlap_pm") =!= 1000)
    assert(weak.isEmpty, s"full mirror not at 1000pm: ${weak.take(3).mkString(";")}")
  }

  test("a genuinely partial syndicator stays below the bar: pick a k " +
      "where s_k's own articles outnumber its syndicated copies") {
    // s_k size = |%5 docs| + |%3 docs| at hk=k (the %15 docs carry both
    // a syndicated and a salted fp); shared with h_k = |%5 docs|
    val k = docIds.groupBy(_ % 37).collectFirst {
      case (k, ds)
          if ds.count(_ % 5 == 0) >= 1 &&
            ds.count(_ % 3 == 0) > ds.count(_ % 5 == 0) => k
    }
    assert(k.isDefined, "fixture has no partial-syndicator host")
    val hs = pairs.filter(
      col("host_a") === s"h${k.get}" && col("host_b") === s"s${k.get}")
    assert(hs.count() == 1L, s"missing h-s pair for k=$k")
    assert(hs.filter(col("is_mirror")).isEmpty,
      s"partial syndicator flagged as mirror: ${hs.take(1).mkString}")
  }

  test("both verdicts occur on the fixture (the threshold is a live " +
      "boundary, not a constant)") {
    assert(pairs.filter(col("is_mirror")).count() > 0)
    assert(pairs.filter(!col("is_mirror")).count() > 0)
  }

  test("mirror clusters: the h/m/n triple groups TRANSITIVELY into one " +
      "component with one canonical host; every clustered host appears " +
      "exactly once; the canonical marks its own row") {
    val cl = CrawlOps.mirrorClusters(spark, sf()).cache()
    // hosts appear exactly once — the clusters partition the mirror set
    assert(cl.groupBy("host").count().filter(col("count") > 1).isEmpty)
    // a k with a %4 doc has all three of h/m/n mirroring pairwise →
    // one cluster of size 3 (transitivity made visible)
    val k3 = docIds.filter(_ % 4 == 0).map(_ % 37).distinct
    assert(k3.nonEmpty)
    val triple = cl.filter(col("host").isin(
      s"h${k3.head}", s"m${k3.head}", s"n${k3.head}"))
    assert(triple.count() == 3L, s"triple for k=${k3.head} not clustered")
    assert(triple.select("canonical_host").distinct().count() == 1L,
      "triple members disagree on the canonical host")
    assert(triple.filter(col("cluster_size") =!= 3).isEmpty)
    // exactly one canonical per cluster, and it marks its own row
    val canonLaw = cl.groupBy("canonical_host")
      .agg(sum(when(col("is_canonical"), 1L).otherwise(0L)).as("nc"))
      .filter(col("nc") =!= 1L)
    assert(canonLaw.isEmpty, "each cluster needs exactly one canonical")
    assert(cl.filter(col("is_canonical") &&
      col("host") =!= col("canonical_host")).isEmpty)
  }

  test("plan gate: pair seeding never cross-joins, and the hot-" +
      "fingerprint guard join precedes the self-join") {
    val plan = castToImpl(CrawlOps.mirrorHosts(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "mirror pair seeding must never cross-join")
  }
}
