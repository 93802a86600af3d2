package graft

import org.apache.spark.sql.SparkSession

import graft.model.Fixtures
import graft.pipeline.CrawlTick
import graft.store.FrontierStore

/** spark-submit entry point for the frontier loop — the engine's analog of
  * the reference's cron-launched `python main.py` (deploy/setup_scheduler
  * .sh:15, one invocation per 5-min tick):
  *
  * {{{
  * spark-submit --class graft.FrontierMain \
  *   target/scala-2.13/newscrawlerspark_2.13-0.1.0.jar \
  *   <storeDir> [nSources] [nTicks] [--salted] [--compact-every=K]
  * }}}
  *
  * Each invocation RESUMES from the store's latest snapshot (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics"): the
  * start tick is the last committed fetch epoch + 1, the URL-seen state is
  * read back from the snapshot chain (per-delta Blooms OR-merged, never
  * rebuilt from URLs), and every tick commits atomically before the next
  * starts. Kill it anywhere; the next run continues from the last manifest.
  *
  * One JSON metrics line per tick on stdout (snapshot id, rows, dedup
  * counters, wall seconds) — the structured-metrics contract.
  */
object FrontierMain {

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val storeDir = pos.headOption.getOrElse("target/frontier-store")
    val nSources = pos.lift(1).map(_.toInt).getOrElse(20)
    val nTicks = pos.lift(2).map(_.toInt).getOrElse(2)
    val salted = args.contains("--salted")
    val compactEvery = args.collectFirst {
      case a if a.startsWith("--compact-every=") =>
        a.stripPrefix("--compact-every=").toInt
    }.getOrElse(0)

    // spark-submit injects master/conf; default to local[*] when launched
    // bare (e.g. from sbt) so the same main serves both paths
    val spark = SparkSession.builder()
      .appName("graft-frontier")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val store = new FrontierStore(storeDir).init()
    val startTick: Int = store.latest() match {
      case None =>
        store.initSeen(spark,
          Fixtures.urlSeenSeed(spark, nSources, Fixtures.DefaultPreSeen)
            .toDF().select("canonical_url"))
        0
      case Some(m) => (m.fetchEpoch + 1).toInt.max(0)
    }

    val sources = Fixtures.sourceSpecs(nSources).toDF()
    val robots = Fixtures.robots(nSources).toDF()

    (startTick until startTick + nTicks).foreach { tick =>
      val t0 = System.nanoTime()
      val listings = Fixtures.listItemsAt(spark, nSources, 30, tick).toDF()
      val pages = Fixtures.pageStore(spark, nSources, maxTick = tick).toDF()
      val t = CrawlTick.runTick(spark, listings, sources,
        store.seen(spark), robots, pages, salted)
      val m = store.commit(spark, t.emitted, t.stats, fetchEpoch = tick.toLong)
      t.cleanup() // release the tick's cached intermediates (ADVICE r1)
      val sec = (System.nanoTime() - t0) / 1e9
      println(
        s"""{"tick":$tick,"snapshot":${m.snapshotId},"new_articles":${m.newArticles},"skipped":${m.skipped},"errors":${m.errors},"segments":${m.segmentCounts.size},"sec":${f"$sec%.2f"}}""")
      if (compactEvery > 0 && (tick + 1) % compactEvery == 0) {
        val c = store.compact(spark)
        println(s"""{"compaction":${c.snapshotId},"folded_deltas":true}""")
      }
    }
    spark.stop()
  }
}
