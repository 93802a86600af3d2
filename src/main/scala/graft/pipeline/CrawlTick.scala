package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions._
import graft.politeness.Scheduler

/** One crawl tick — the engine's re-expression of the reference's whole
  * `_run_crawl` dataflow (/root/reference/main.py:273-361) as a single
  * declarative Catalyst plan: listings scan → filters (F4) → robots gate →
  * per-source dedup with claim semantics (D4/D5/D6) → caps (T3) →
  * cross-source first-wins dedup → fetch-enrichment join (S9) → politeness
  * epoch assignment (C3) → typed output + per-source stats (A1).
  *
  * == Defined deterministic semantics ==
  * The reference runs sources on a 5-thread pool sharing one unsynchronized
  * seen-set (/root/reference/main.py:320-331,
  * /root/reference/utils/bigquery_client.py:147-157) — cross-source claim
  * timing is racy. We define the deterministic version (SURVEY.md §7.4.1):
  *
  *  1. per-source loop semantics are exact (sequential within a source):
  *     a. items with item_idx ≥ list_cap are never considered (list slice,
  *        e.g. /root/reference/scrapers/simple/techcrunch.py:85);
  *     b. blank-title items → skipped (F4, e.g. qq.py:83-85);
  *     c. robots-disallowed items → skipped (north rule; reference has none);
  *     d. seen items — snapshot-seen OR duplicate of an earlier CLAIMED item
  *        in this tick (D4 claim-immediately) — stop the source
  *        (stop_at_first_seen, mingpao.py:47-48; the stopping item counts
  *        skipped) or are skipped (skip_and_continue, coinlive.py:51-54);
  *     e. surviving items are selected and claimed;
  *     f. fetch errors (status ≠ 200) count errors and drop the row
  *        (techcrunch.py:119-122) — the claim stands;
  *     g. the first save_cap fetch-ok rows per source emit (qq.py:105).
  *  2. ACROSS sources, claims do not interleave: each source dedups against
  *     the tick-start snapshot plus its own claims; a URL selected by
  *     several sources in one tick is emitted once, by the lowest
  *     (source_idx, item_idx) — first-wins (losers count skipped). This is
  *     one legal schedule of the reference's race, made deterministic.
  *  3. the persistent URL-seen set advances by EMITTED canonical URLs only —
  *     matching the reference across invocations (its in-memory claims die
  *     with the process; only BigQuery-inserted links survive,
  *     utils/bigquery_client.py:338-339).
  *
  * The sequential port of the same semantics lives in [[RefSimulator]]; the
  * exact-equality of (emit ordering, URL-seen set, stats) is asserted in
  * CrawlTickSpec — the north-rule criterion.
  *
  * == Key step semantics ==
  * `is_seen = snapshot_seen ∨ occurrence_rank > 1` replaces the sequential
  * claim-probe: a non-first occurrence is seen either via the earlier
  * occurrence's claim (if it was selected) or via the snapshot (if it
  * wasn't — same canonical ⇒ same snapshot verdict). This removes the loop
  * dependency entirely; no iteration, no collect.
  *
  * == Scale notes (100 TB / 10^10-frontier design point) ==
  *  - windows partition by (source, canonical) and (source) — source
  *    cardinality is the fan-out unit; the heavy per-host politeness window
  *    uses the salted two-stage rank (Scheduler.saltedHostRank) so one
  *    mega-host never lands in one task;
  *  - the snapshot-seen probe is strategy-dispatched ([[graft.seen.SeenProbe]]):
  *    SeenProbe.Exact is a plain left join (small scale / oracle parity);
  *    SeenProbe.BloomConfirm routes through UrlSeen.flagSeen — Bloom-segment
  *    prefilter (broadcast ≤ 1 GiB of segments, co-partitioned zip-probe
  *    above, no driver collect) + exact confirm — the path FrontierMain
  *    feeds from the store's persisted per-delta blooms. All variants
  *    produce the identical truth table;
  *  - the fetch/page join carries narrow columns only (canonical_url,
  *    image_id, caption); image bytes are joined at the sink, never
  *    shuffled through the pipeline (SURVEY.md §7.4.6);
  *  - emit_idx is the order-isomorphic composite (source_idx << 32 | item_idx),
  *    not a global row_number — a total order with zero global passes.
  */
object CrawlTick {

  val EpochMillis = 300000L // 5-min ticks, reference cadence (setup_scheduler.sh:15)

  /** Columns: the full tick plan, pre-fetch.
    *
    * @param listings  (source, page_idx, item_idx, url, title, ...)
    * @param sources   SourceSpec rows (tiny → broadcast)
    * @param probe     the snapshot-seen probe strategy: SeenProbe.Exact for
    *                  small scale / oracle parity, SeenProbe.BloomConfirm
    *                  for the 10^10 path (size-dispatched broadcast vs
    *                  co-partitioned probe + exact confirm). All variants
    *                  produce the identical truth table.
    * @param robots    (host, path_prefix, allow, crawl_delay_ms) (tiny → broadcast)
    */
  def select(listings: DataFrame, sources: DataFrame, probe: graft.seen.SeenProbe,
      robots: DataFrame): DataFrame =
    selectManaged(listings, sources, probe, robots)._1

  /** [[select]] plus the probe's cache-release hook (ADVICE r3): BloomConfirm
    * probes persist intermediates that a tick loop must release after the
    * outputs materialize — [[runTick]] folds the hook into
    * [[TickResult.cleanup]]. One-shot callers may use the plain [[select]].
    */
  def selectManaged(listings: DataFrame, sources: DataFrame,
      probe: graft.seen.SeenProbe, robots: DataFrame)
      : (DataFrame, () => Unit) = {
    val spec = broadcast(sources.select("source", "source_idx", "dedup_policy",
      "list_cap", "save_cap", "crawl_delay_ms", "language", "kind"))

    val considered = listings
      .join(spec, Seq("source"))
      .filter(col("item_idx") < col("list_cap")) // gate (a): list slice T3
      .withColumn("canonical_url", canonicalize_url(col("url")))
      .withColumn("host", url_host(col("canonical_url")))
      .withColumn("path", url_path(col("canonical_url")))
      .withColumn("ok_title", length(trim(col("title"))) > 0) // gate (b): F4

    // gate (c): robots longest-prefix — broadcast join, codegen'd match
    val withRobots = Scheduler.applyRobots(considered, robots, "host", "path")

    // snapshot-seen probe — strategy-dispatched, exact on every path
    val (probed, probeCleanup) = graft.seen.UrlSeen.flagSeenManaged(
      withRobots, probe, "canonical_url", "snapshot_seen")

    val eligible = col("ok_title") && col("allowed")

    // occurrence rank among ELIGIBLE rows of (source, canonical): gate (d)
    val flagged = probed
      .withColumn("occ_rank",
        when(eligible, row_number().over(
          Window.partitionBy(col("source"), col("canonical_url"),
            when(eligible, lit(1)).otherwise(lit(0)))
            .orderBy(col("item_idx")))))
      .withColumn("is_seen",
        eligible && (col("snapshot_seen") || col("occ_rank") > 1))

    // stop_at_first_seen: the source's processed range ends AT the first
    // seen eligible item (inclusive — it counts skipped; mingpao.py:47-48)
    val wSrc = Window.partitionBy(col("source"))
    val ranged = flagged
      .withColumn("stop_idx",
        when(col("dedup_policy") === graft.model.DedupPolicy.StopAtFirstSeen,
          min(when(col("is_seen"), col("item_idx"))).over(wSrc)))
      .withColumn("processed",
        col("stop_idx").isNull || col("item_idx") <= col("stop_idx"))

    val out = ranged
      .withColumn("selected",
        col("processed") && eligible && !col("is_seen"))
      .withColumn("skip_reason",
        when(!col("processed"), lit(null).cast("string"))
          .when(!col("ok_title"), lit("blank_title"))
          .when(!col("allowed"), lit("robots"))
          .when(col("is_seen"), lit("seen"))
          .otherwise(lit(null).cast("string")))
    (out, probeCleanup)
  }

  /** Legacy shape: exact-join probe over the snapshot DataFrame. */
  def select(listings: DataFrame, sources: DataFrame, seenSnapshot: DataFrame,
      robots: DataFrame): DataFrame =
    select(listings, sources, graft.seen.SeenProbe.Exact(seenSnapshot), robots)

  /** selected rows × page store → fetched rows + per-source error counts.
    * pages carries only narrow columns (no bytes) — see scale notes.
    */
  def fetchJoin(selected: DataFrame, pages: DataFrame): DataFrame =
    selected.join(
      pages.select(col("canonical_url"), col("image_id"),
        col("caption"), col("status")),
      Seq("canonical_url"), "left")
      .withColumn("fetch_ok", coalesce(col("status") === 200, lit(false)))

  /** Full tick: returns (emitted DataFrame in CrawlResult shape + stats cols,
    * per-source stats DataFrame).
    *
    * @param salted use the salted two-stage host rank (scale path) instead
    *               of the single-window rank — identical output, proven in
    *               PolitenessSpec
    */
  def run(spark: SparkSession, listings: DataFrame, sources: DataFrame,
      seenSnapshot: DataFrame, robots: DataFrame, pages: DataFrame,
      salted: Boolean = false): (DataFrame, DataFrame) = {
    val t = runTick(spark, listings, sources, seenSnapshot, robots, pages, salted)
    (t.emitted, t.stats)
  }

  /** [[run]] with an explicit probe strategy (scale path). */
  def run(spark: SparkSession, listings: DataFrame, sources: DataFrame,
      probe: graft.seen.SeenProbe, robots: DataFrame, pages: DataFrame,
      salted: Boolean): (DataFrame, DataFrame) = {
    val t = runTick(spark, listings, sources, probe, robots, pages, salted)
    (t.emitted, t.stats)
  }

  /** One tick's outputs plus an explicit cache-release hook. The tick
    * `.cache()`s two multiply-consumed intermediates; a long-running driver
    * looping ticks MUST call `cleanup()` after materializing (committing)
    * the outputs, or cached blocks accumulate across ticks (ADVICE r1).
    * [[run]] keeps the old shape for single-shot callers whose caches die
    * with the session.
    *
    * `errors` CAPTURES the failed rows, not just their count (r2 gap #5 —
    * the reference keeps the tracebacks, main.py:342-347): one row per
    * claimed-but-failed fetch, (canonical_url, source, item_idx, reason).
    * FrontierStore.commit persists it under the snapshot's lineage.
    */
  final case class TickResult(emitted: DataFrame, stats: DataFrame,
      errors: DataFrame, cleanup: () => Unit)

  def runTick(spark: SparkSession, listings: DataFrame, sources: DataFrame,
      seenSnapshot: DataFrame, robots: DataFrame, pages: DataFrame,
      salted: Boolean = false): TickResult =
    runTick(spark, listings, sources,
      graft.seen.SeenProbe.Exact(seenSnapshot), robots, pages, salted)

  /** [[runTick]] with an explicit probe strategy — the production
    * composition (FrontierMain routes store.segments() through here).
    */
  def runTick(spark: SparkSession, listings: DataFrame, sources: DataFrame,
      probe: graft.seen.SeenProbe, robots: DataFrame, pages: DataFrame,
      salted: Boolean): TickResult = {

    val (sel, probeCleanup) = selectManaged(listings, sources, probe, robots)
    val flagged = sel.cache()

    val fetched = fetchJoin(flagged.filter(col("selected")), pages)

    // gate (g): save_cap over fetch-ok rows, per source, in list order
    val capped = fetched
      .withColumn("save_rank",
        when(col("fetch_ok"), row_number().over(
          Window.partitionBy(col("source"), col("fetch_ok"))
            .orderBy(col("item_idx")))))
      .withColumn("emit", col("fetch_ok") && col("save_rank") <= col("save_cap"))

    // cross-source first-wins (defined semantics #2)
    val deduped = capped
      .withColumn("xsrc_rank",
        when(col("emit"), row_number().over(
          Window.partitionBy(col("canonical_url"), col("emit"))
            .orderBy(col("source_idx"), col("item_idx")))))
      .withColumn("final_emit", col("emit") && col("xsrc_rank") === 1)
      .cache()

    val emitted0 = deduped.filter(col("final_emit"))
      .withColumn("effective_delay_ms",
        greatest(col("crawl_delay_ms"), col("robots_delay_ms")))
      .withColumn("emit_idx",
        (col("source_idx").cast("long") * lit(1L << 32)) + col("item_idx"))

    // politeness: per-host rank in emit order → deterministic fetch epoch
    val ranked =
      if (salted)
        Scheduler.saltedHostRank(emitted0, "host",
          bucketCol = col("source_idx"),
          orderCols = Seq(col("source_idx").asc, col("item_idx").asc))
      else
        Scheduler.plainHostRank(emitted0, "host",
          Seq(col("source_idx").asc, col("item_idx").asc))
    val emitted = Scheduler.assignEpochs(ranked, "host_rank",
        col("effective_delay_ms"), EpochMillis)
      .select(
        md5(col("canonical_url")).as("id"),
        col("canonical_url"), col("source"), col("title"), col("caption"),
        col("image_id"), col("host"), col("fetch_epoch"), col("emit_idx"),
        col("kind"), col("language"),
        // P12: the reference table's metadata JSON column
        // (create_bigquery_table.sql:24, serialized utils/bigquery_client
        // .py:320-322) — deterministic provenance payload
        to_json(struct(col("source"), col("kind"))).as("metadata"),
        col("source_idx"), col("item_idx"))

    // per-source stats (A1): new/skipped/errors
    val skips = flagged
      .groupBy("source")
      .agg(sum(when(col("skip_reason").isNotNull, 1).otherwise(0)).as("skipped0"))
    val fetchErrs = deduped
      .groupBy("source")
      .agg(
        sum(when(!col("fetch_ok"), 1).otherwise(0)).as("errors"),
        sum(when(col("emit") && col("xsrc_rank") =!= 1, 1).otherwise(0))
          .as("xsrc_losses"),
        sum(when(col("final_emit"), 1).otherwise(0)).as("new_articles"))
    val stats = sources.select("source").distinct()
      .join(skips, Seq("source"), "left")
      .join(fetchErrs, Seq("source"), "left")
      .select(
        col("source"),
        coalesce(col("new_articles"), lit(0L)).as("new_articles"),
        (coalesce(col("skipped0"), lit(0L)) +
          coalesce(col("xsrc_losses"), lit(0L))).as("skipped"),
        coalesce(col("errors"), lit(0L)).as("errors"))

    // C5: error rows captured, not just counted — every claimed candidate
    // whose fetch failed (status ≠ 200 or no page row), with the reason
    val errorRows = deduped.filter(!col("fetch_ok"))
      .select(
        col("canonical_url"), col("source"), col("item_idx"),
        when(col("status").isNull, lit("missing_page"))
          .otherwise(concat(lit("http_"), col("status"))).as("reason"))

    TickResult(emitted, stats, errorRows,
      () => { flagged.unpersist(); deduped.unpersist(); probeCleanup(); () })
  }
}
