package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Bench

/** Stage-wise timing of the frontier headline job — dev feedback loop.
  * Forces materialization through the noop sink (a bare count() lets
  * Catalyst prune the very projections being measured) and warms codegen
  * before each timing.
  */
object FrontierProfile {

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "8000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.UrlFunctions._

    def t(name: String)(df: => DataFrame): Unit = {
      force(df) // warmup (codegen + JIT)
      val (_, sec) = Bench.timed(force(df))
      println(f"[profile] $name%-28s $sec%8.2f s  (${(n / sec).toLong}%,d rows/s of n)")
    }

    val nHosts = 1000
    def cand = spark.range(0, n).toDF("uid")
      .withColumn("host", concat(lit("h"),
        pmod(col("uid") * 2654435761L, lit(nHosts.toLong)), lit(".example.com")))
      .withColumn("raw_url", concat(lit("HTTPS://WWW."), col("host"),
        lit("/Section/"), pmod(col("uid"), lit(50L)), lit("/articles/a"),
        col("uid"), lit("?utm_source=feed&z="), pmod(col("uid"), lit(97L)),
        lit("&lang=en&utm_medium=rss&id="), col("uid"),
        lit("&ref=home&utm_campaign=daily&s=1#sec")))
      .withColumn("canonical_url", canonicalize_url(col("raw_url")))
    def seen = spark.range(0, n, 3).toDF("uid")
      .withColumn("host", concat(lit("h"),
        pmod(col("uid") * 2654435761L, lit(nHosts.toLong)), lit(".example.com")))
      .withColumn("canonical_url", concat(lit("https://www."), col("host"),
        lit("/Section/"), pmod(col("uid"), lit(50L)), lit("/articles/a"),
        col("uid"), lit("?id="), col("uid"), lit("&lang=en&ref=home&s=1&z="),
        pmod(col("uid"), lit(97L))))
      .select("canonical_url")

    t("gen+canonicalize")(cand)
    t("bloom build") {
      graft.seen.UrlSeen.buildSegments(seen, "canonical_url", 32,
        math.max(1000L, n / 32), 1e-6)
    }
    val segments = graft.seen.UrlSeen.buildSegments(seen, "canonical_url", 32,
      math.max(1000L, n / 32), 1e-6).cache()
    segments.count()
    t("probe only (no confirm)") {
      // phase-1 path in isolation: flag rows, no join
      graft.seen.UrlSeen.filterUnseen(cand, segments,
        seen.limit(0), "canonical_url", 32)
    }
    t("filterUnseen (full)") {
      graft.seen.UrlSeen.filterUnseen(cand, segments, seen, "canonical_url", 32)
    }
    t("filterUnseen (copart)") {
      // the 10^10-scale path forced regardless of segment size
      graft.seen.UrlSeen.filterUnseenCopartitioned(
        cand, segments, seen, "canonical_url", 32)
    }
    val unseen = graft.seen.UrlSeen
      .filterUnseen(cand, segments, seen, "canonical_url", 32)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    unseen.count()
    t("salted rank (from persist)") {
      graft.politeness.Scheduler.saltedHostRank(unseen, "host",
        bucketCol = floor(col("uid") / 100000L), orderCols = Seq(col("uid").asc))
    }
    t("rank+epochs (from persist)") {
      graft.politeness.Scheduler.assignEpochs(
        graft.politeness.Scheduler.saltedHostRank(unseen, "host",
          bucketCol = floor(col("uid") / 100000L),
          orderCols = Seq(col("uid").asc)),
        "host_rank", lit(1000))
    }
    spark.stop()
  }
}
