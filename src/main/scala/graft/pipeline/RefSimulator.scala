package graft.pipeline

import scala.collection.mutable

import graft.functions.UrlCanonicalizer
import graft.model.{DedupPolicy, ListItem, PageRow, RobotsRule, SourceSpec}

/** Sequential, obviously-correct port of the reference crawler's loop
  * semantics (SURVEY.md §5 "reference simulator") — the oracle the Spark
  * [[CrawlTick]] plan must match EXACTLY (emit ordering, URL-seen set,
  * per-source stats): the north-rule criterion.
  *
  * This is a direct transliteration of the per-source loop in
  * /root/reference/scrapers/base_scraper.py + base_simple_scraper.py under
  * the deterministic schedule defined in [[CrawlTick]]'s doc: sources
  * independent within a tick against the tick-start snapshot, their own
  * claims applied sequentially (D4), cross-source duplicates resolved
  * first-wins by (source_idx, item_idx) afterwards.
  *
  * Deliberately imperative — mutable seen-set, `break`-style control flow —
  * so its correctness is auditable by eye against the reference loops.
  */
object RefSimulator {

  final case class SimEmit(
      canonicalUrl: String, source: String, title: String, caption: String,
      imageId: String, host: String, fetchEpoch: Long, emitIdx: Long,
      metadata: String)

  final case class SimStats(source: String, newArticles: Long, skipped: Long,
      errors: Long)

  final case class SimResult(
      emits: Vector[SimEmit], // in emit_idx order
      stats: Map[String, SimStats],
      seenAfter: Set[String]) // snapshot ∪ emitted

  def run(
      listings: Seq[ListItem],
      sources: Seq[SourceSpec],
      seenSnapshot: Set[String],
      robots: Seq[RobotsRule],
      pages: Map[String, PageRow],
      epochMillis: Long = CrawlTick.EpochMillis): SimResult = {

    val bySource = listings.groupBy(_.source)
    val specByName = sources.map(s => s.source -> s).toMap
    val rulesByHost = robots.groupBy(_.host)

    // longest-prefix robots match; default allow, delay 0
    def robotsFor(host: String, path: String): (Boolean, Int) = {
      val rules = rulesByHost.getOrElse(host, Nil)
        .filter(r => path.startsWith(r.path_prefix))
      if (rules.isEmpty) (true, 0)
      else {
        val best = rules.maxBy(_.path_prefix.length)
        (best.allow, best.crawl_delay_ms)
      }
    }

    final case class Sel(spec: SourceSpec, item: ListItem, canonical: String,
        host: String, robotsDelay: Int)

    val perSourceSelected = mutable.ArrayBuffer[Sel]()
    val statsMap = mutable.Map[String, (Long, Long, Long)]() // new, skip, err

    // --- phase 1: the per-source sequential loop (reference semantics) ---
    for (spec <- sources.sortBy(_.source_idx)) {
      var skipped = 0L
      var errors = 0L
      val claimed = mutable.Set[String]() // this source's D4 claims
      val items = bySource.getOrElse(spec.source, Nil).sortBy(_.item_idx)
        .filter(_.item_idx < spec.list_cap) // gate (a)
      var stopped = false
      val it = items.iterator
      while (it.hasNext && !stopped) {
        val item = it.next()
        if (item.title.trim.isEmpty) { // gate (b)
          skipped += 1
        } else {
          val canonical = UrlCanonicalizer.canonicalize(item.url)
          val host = UrlCanonicalizer.hostOf(canonical)
          val path = UrlCanonicalizer.pathOf(canonical)
          val (allowed, robotsDelay) = robotsFor(host, path)
          if (!allowed) { // gate (c)
            skipped += 1
          } else if (seenSnapshot.contains(canonical) ||
              claimed.contains(canonical)) { // gate (d)
            skipped += 1
            if (spec.dedup_policy == DedupPolicy.StopAtFirstSeen) stopped = true
          } else { // gate (e): select + claim immediately
            claimed += canonical
            perSourceSelected += Sel(spec, item, canonical, host, robotsDelay)
          }
        }
      }
      statsMap(spec.source) = (0L, skipped, errors)
    }

    // --- phase 2: fetch (f) + save_cap (g), per source in list order ---
    final case class Emit0(sel: Sel, page: PageRow)
    val emittedPerSource = mutable.ArrayBuffer[Emit0]()
    for ((source, sels) <- perSourceSelected.groupBy(_.spec.source)) {
      var (nw, sk, er) = statsMap(source)
      var saved = 0L
      for (sel <- sels.sortBy(_.item.item_idx)) {
        pages.get(sel.canonical) match {
          case Some(p) if p.status == 200 =>
            saved += 1
            if (saved <= sel.spec.save_cap) emittedPerSource += Emit0(sel, p)
          case _ => er += 1 // fetch error: claimed, counted, not emitted
        }
      }
      statsMap(source) = (nw, sk, er)
    }

    // --- phase 3: cross-source first-wins dedup ---
    val ordered = emittedPerSource.sortBy(e =>
      (e.sel.spec.source_idx, e.sel.item.item_idx))
    val winners = mutable.ArrayBuffer[Emit0]()
    val globalSeen = mutable.Set[String]()
    for (e <- ordered) {
      if (globalSeen.add(e.sel.canonical)) {
        winners += e
        val (nw, sk, er) = statsMap(e.sel.spec.source)
        statsMap(e.sel.spec.source) = (nw + 1, sk, er)
      } else {
        val (nw, sk, er) = statsMap(e.sel.spec.source)
        statsMap(e.sel.spec.source) = (nw, sk + 1, er)
      }
    }

    // --- phase 4: politeness epochs — per-host rank in emit order ---
    val hostRank = mutable.Map[String, Long]()
    val emits = winners.map { e =>
      val rank = hostRank.getOrElse(e.sel.host, 0L) + 1
      hostRank(e.sel.host) = rank
      val delay = math.max(e.sel.spec.crawl_delay_ms, e.sel.robotsDelay)
      val budget = math.max(1L, epochMillis / math.max(delay, 1))
      SimEmit(
        canonicalUrl = e.sel.canonical,
        source = e.sel.spec.source,
        title = e.sel.item.title,
        caption = e.page.caption,
        imageId = e.page.image_id,
        host = e.sel.host,
        fetchEpoch = (rank - 1) / budget,
        emitIdx = (e.sel.spec.source_idx.toLong << 32) | e.sel.item.item_idx.toLong,
        // same serialization as Spark's to_json(struct(source, kind))
        metadata = s"""{"source":"${e.sel.spec.source}","kind":${e.sel.spec.kind}}""")
    }.toVector

    SimResult(
      emits = emits,
      stats = statsMap.map { case (s, (nw, sk, er)) =>
        s -> SimStats(s, nw, sk, er) }.toMap,
      seenAfter = seenSnapshot ++ emits.map(_.canonicalUrl))
  }
}
