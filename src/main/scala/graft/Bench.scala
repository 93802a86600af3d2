package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver benchmark: runs every SparkEntry query plus the frontier
  * headline job, prints ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  */
object Bench {

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The north-rule headline: frontier scheduling + dedup over `n`
    * synthetic candidate URLs — canonicalize → xxhash64 → Bloom-segment
    * prefilter → exact confirm anti-join → salted per-host rank → epoch
    * assignment. Returns the scheduled (unseen) candidates.
    */
  def frontierJob(spark: SparkSession, n: Long, nHosts: Int = 1000,
      nSegments: Int = 32): DataFrame = {
    import graft.functions.UrlFunctions._
    val cand = spark.range(0, n).toDF("uid")
      .withColumn("host",
        concat(lit("h"), pmod(col("uid") * 2654435761L, lit(nHosts.toLong)),
          lit(".example.com")))
      .withColumn("raw_url",
        concat(lit("HTTPS://WWW."), col("host"), lit("/articles/a"),
          col("uid"), lit("?utm_source=x&id="), col("uid"), lit("#frag")))
      .withColumn("canonical_url", canonicalize_url(col("raw_url")))
    // seen: every third URL (same construction → exact-parity probe)
    val seen = spark.range(0, n, 3).toDF("uid")
      .withColumn("host",
        concat(lit("h"), pmod(col("uid") * 2654435761L, lit(nHosts.toLong)),
          lit(".example.com")))
      .withColumn("canonical_url",
        concat(lit("https://www."), col("host"), lit("/articles/a"),
          col("uid"), lit("?id="), col("uid")))
      .select("canonical_url")
    val segments = graft.seen.UrlSeen.buildSegments(
      seen, "canonical_url", nSegments,
      expectedItemsPerSegment = math.max(1000L, n / nSegments), fpp = 1e-6)
    val unseen = graft.seen.UrlSeen.filterUnseen(
      cand, segments, seen, "canonical_url", nSegments)
    // politeness: salted per-host rank (order-aligned buckets) → epochs
    val ranked = graft.politeness.Scheduler.saltedHostRank(
      unseen, "host",
      bucketCol = floor(col("uid") / 100000L),
      orderCols = Seq(col("uid").asc))
    graft.politeness.Scheduler.assignEpochs(ranked, "host_rank", lit(1000))
  }

  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val frontierN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "2000000").toLong
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val (_, sec) = timed {
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      }
      results(name) = sec
    }
    // frontier headline (throughput metric, north rule)
    frontierJob(spark, frontierN / 10).count() // warmup: codegen + JIT
    val (frontierRows, frontierSec) = timed(frontierJob(spark, frontierN).count())
    results("frontier_tick") = frontierSec
    val urlsPerSec = (frontierN / frontierSec).toLong

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.values.sum}%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"frontier_n":$frontierN,"frontier_scheduled_rows":$frontierRows,"frontier_urls_per_sec":$urlsPerSec}""")
    spark.stop()
  }
}
