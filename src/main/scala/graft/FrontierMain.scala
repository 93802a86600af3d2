package graft

import org.apache.spark.sql.SparkSession

import graft.model.Fixtures
import graft.pipeline.CrawlTick
import graft.seen.SeenProbe
import graft.store.FrontierStore

/** spark-submit entry point for the frontier loop — the engine's analog of
  * the reference's cron-launched `python main.py` (deploy/setup_scheduler
  * .sh:15, one invocation per 5-min tick):
  *
  * {{{
  * spark-submit --class graft.FrontierMain \
  *   target/scala-2.13/newscrawlerspark_2.13-0.1.0.jar \
  *   <storeDir> [nSources] [nTicks] [--salted] [--compact-every=K] \
  *   [--listings=<parquet>] [--pages=<parquet>] [--sources=<parquet>] \
  *   [--robots=<parquet>] [--exact-probe] \
  *   [--recrawl-every=K] [--refresh-interval=N] \
  *   [--check-invariants] [--images=<parquet>] \
  *   [--expire-every=K] [--retain-last=R] [--gc-orphans=graceMinutes]
  * }}}
  *
  * Each invocation RESUMES from the store's latest snapshot (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics"): the
  * start tick is the last committed fetch epoch + 1, the URL-seen state is
  * read back from the snapshot chain (per-delta Blooms OR-merged, never
  * rebuilt from URLs), and every tick commits atomically before the next
  * starts. Kill it anywhere; the next run continues from the last manifest.
  *
  * The seen probe is the PRODUCTION path by default: the tick routes
  * through `SeenProbe.BloomConfirm(store.segments, store.seen)` — the
  * size-dispatched two-phase plan (broadcast probe for small segment sets,
  * co-partitioned zip-probe at the 10^10 design point), fed by the store's
  * persisted per-delta blooms. `--exact-probe` forces the plain join
  * (debug / tiny stores).
  *
  * Inputs default to the deterministic fixtures; `--listings=`/`--pages=`
  * (and optionally `--sources=`/`--robots=`) point the SAME pipeline at
  * external parquet with the ListItem / PageRow / SourceSpec / RobotsRule
  * schemas — the lifecycle demo runs over user data, not only fixtures.
  * External listings are read per tick with a `tick` partition-pruning
  * filter when a `tick` column exists.
  *
  * One JSON metrics line per tick on stdout (snapshot id, rows, dedup
  * counters, wall seconds) — the structured-metrics contract.
  *
  * `--compact-every=K` runs BOTH maintenance actions every K ticks: the
  * seen-chain fold (`compact`) and the article small-file rewrite
  * (`compactArticles`, file-set lineage in the manifest and on stdout).
  *
  * `--recrawl-every=K` closes the refresh loop: every K ticks the loop
  * retracts the URLs whose latest fetch is older than
  * `--refresh-interval=N` ticks (Scheduler.recrawlDue →
  * FrontierStore.retract), so when a stale URL reappears in a later
  * listing it is crawled AGAIN — the reference's periodic re-scan of
  * known pages, expressed as snapshot events. Runs before any compaction
  * in the same tick so the fold resolves the retraction immediately.
  *
  * `--expire-every=K` runs snapshot expiration every K ticks (after any
  * compaction on the same tick, so the fold's redundant deltas are
  * immediately reclaimable): `--retain-last=R` (default 4) keeps the last
  * R snapshots' read closures; everything older loses its data files but
  * keeps its manifest (the lineage audit trail). `--gc-orphans=M` sweeps
  * crash debris no manifest references, older than M minutes, once at the
  * end of the run. Together with `--compact-every` this is the full
  * Iceberg maintenance cycle (rewrite_data_files / expire_snapshots /
  * remove_orphan_files) driven from the spark-submit lifecycle entrypoint.
  */
object FrontierMain {

  private def flag(args: Array[String], name: String): Option[String] =
    args.collectFirst {
      case a if a.startsWith(s"--$name=") => a.stripPrefix(s"--$name=")
    }

  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val storeDir = pos.headOption.getOrElse("target/frontier-store")
    val nSources = pos.lift(1).map(_.toInt).getOrElse(20)
    val nTicks = pos.lift(2).map(_.toInt).getOrElse(2)
    val salted = args.contains("--salted")
    val exactProbe = args.contains("--exact-probe")
    val compactEvery = flag(args, "compact-every").map(_.toInt).getOrElse(0)
    val recrawlEvery = flag(args, "recrawl-every").map(_.toInt).getOrElse(0)
    val refreshInterval = flag(args, "refresh-interval").map(_.toLong)
      .getOrElse(4L)
    val expireEvery = flag(args, "expire-every").map(_.toInt).getOrElse(0)
    val retainLast = flag(args, "retain-last").map(_.toInt).getOrElse(4)
    val gcOrphansMin = flag(args, "gc-orphans").map(_.toLong)
    val checkInvariants = args.contains("--check-invariants")
    val imagesPath = flag(args, "images")
    val listingsPath = flag(args, "listings")
    val pagesPath = flag(args, "pages")
    val sourcesPath = flag(args, "sources")
    val robotsPath = flag(args, "robots")

    // spark-submit injects the master; set it explicitly for bare launches
    // (sbt runMain) — getOrCreate() without any master throws (ADVICE r2)
    val builder = SparkSession.builder()
      .appName("graft-frontier")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = (if (sys.props.get("spark.master").isEmpty)
        builder.master("local[*]") else builder)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SQL names for the native expressions, same set the
    // spark.sql.extensions hook injects (idempotent if both run)
    graft.functions.GraftFunctions.registerAll(spark)
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

    val sources = sourcesPath.map(spark.read.parquet(_))
      .getOrElse(Fixtures.sourceSpecs(nSources).toDF())
    val robots = robotsPath.map(spark.read.parquet(_))
      .getOrElse(Fixtures.robots(nSources).toDF())

    (startTick until startTick + nTicks).foreach { tick =>
      val t0 = System.nanoTime()
      val listings = listingsPath.map { p =>
        val df = spark.read.parquet(p)
        // external multi-tick listing dumps carry a `tick` column; prune it
        if (df.columns.contains("tick"))
          df.filter(org.apache.spark.sql.functions.col("tick") === tick)
            .drop("tick")
        else df
      }.getOrElse(Fixtures.listItemsAt(spark, nSources, 30, tick).toDF())
      val pages = pagesPath.map(spark.read.parquet(_))
        .getOrElse(Fixtures.pageStore(spark, nSources, maxTick = tick).toDF())
      val probe: SeenProbe =
        if (exactProbe) SeenProbe.Exact(store.seen(spark))
        else SeenProbe.BloomConfirm(
          store.segments(spark), store.seen(spark), store.nSegments)
      val t = CrawlTick.runTick(spark, listings, sources, probe,
        robots, pages, salted)
      // per-row invariant enforcement AT the sink (north rule: pairs are
      // written WITH the invariant): caption equality vs the image table;
      // violating rows are excluded from the commit and counted. The PSNR
      // leg needs reference bytes, which exist only where a reference
      // render does (ImageInvariantsSpec) — the caption gate is the
      // store-path contract.
      import org.apache.spark.sql.functions.col
      val (emitRows, nViolations, invRelease) =
        if (!checkInvariants)
          (t.emitted, 0L, () => ())
        else {
          val imgs = imagesPath.map(spark.read.parquet(_))
            .getOrElse(Fixtures.images(spark, 2000L).toDF())
          val checked = graft.functions.ImageOps
            .withInvariants(t.emitted, imgs)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val bad = checked.filter(!col("caption_ok")).count()
          (checked.filter(col("caption_ok"))
              .select(t.emitted.columns.map(col): _*), bad,
            () => { checked.unpersist(blocking = false); () })
        }
      val m = store.commit(spark, emitRows, t.stats, fetchEpoch = tick.toLong,
        errors = Some(t.errors))
      invRelease()
      t.cleanup() // release the tick's cached intermediates (ADVICE r1)
      val sec = (System.nanoTime() - t0) / 1e9
      val invJson =
        if (checkInvariants) s""","invariant_violations":$nViolations""" else ""
      println(
        s"""{"tick":$tick,"snapshot":${m.snapshotId},"new_articles":${m.newArticles},"skipped":${m.skipped},"errors":${m.errors},"segments":${m.segmentCounts.size},"probe":"${if (exactProbe) "exact" else "bloom"}"$invJson,"sec":${f"$sec%.2f"}}""")
      if (recrawlEvery > 0 && (tick + 1) % recrawlEvery == 0) {
        import org.apache.spark.sql.functions.{col, lit}
        // age basis = the committing TICK (crawl_tick), not the per-host
        // politeness slot the rows' own fetch_epoch column carries
        val arts = store.articlesWithTick(spark)
          .select(col("canonical_url"), col("source"),
            col("crawl_tick").as("fetch_epoch"))
        val intervals = arts.select("source").distinct()
          .withColumn("refresh_interval", lit(refreshInterval))
        val due = graft.politeness.Scheduler.recrawlDue(
          arts, intervals, nowEpoch = tick.toLong)
        val r = store.retract(spark, due)
        println(s"""{"recrawl_at_tick":$tick,"snapshot":${r.snapshotId},"retracted":${r.segmentCounts.values.sum}}""")
      }
      if (compactEvery > 0 && (tick + 1) % compactEvery == 0) {
        val c = store.compact(spark)
        println(s"""{"compaction":${c.snapshotId},"folded_deltas":true}""")
        // fold the article small files on the same cadence (the Iceberg
        // rewrite_data_files maintenance action); lineage = file sets
        val hasArticles = store.latest().map(_.snapshotId)
          .exists(id => store.articleChain(id).exists(_.articlesPath.nonEmpty))
        if (hasArticles) {
          val a = store.compactArticles(spark)
          println(s"""{"article_compaction":${a.snapshotId},"files_rewritten":${a.filesRewritten},"files_added":${a.filesAdded}}""")
        }
      }
      if (expireEvery > 0 && (tick + 1) % expireEvery == 0) {
        val ids = store.snapshotIds()
        val retainFrom = ids.takeRight(retainLast.max(1)).head
        if (retainFrom > store.gcHorizon()) {
          val e = store.expireSnapshots(retainFrom)
          println(s"""{"expire_at_tick":$tick,"horizon":${e.horizon},"data_dirs_deleted":${e.dirsDeleted},"files_deleted":${e.filesDeleted},"bytes_freed":${e.bytesFreed}}""")
        }
      }
    }
    gcOrphansMin.foreach { min =>
      val o = store.removeOrphanFiles(olderThanMs = min * 60_000L)
      println(s"""{"orphan_sweep":true,"dirs_deleted":${o.dirsDeleted},"files_deleted":${o.filesDeleted},"bytes_freed":${o.bytesFreed},"skipped_recent":${o.skippedRecent}}""")
    }
    spark.stop()
  }
}
