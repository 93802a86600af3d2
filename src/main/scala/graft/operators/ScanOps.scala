package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}

/** Scan/projection operators rounding out the reference inventory
  * (SURVEY.md §2.1/§2.4/§2.8): JSON-API payload drilling (S4), epoch
  * parsing with ms-autodetect and the UTC+8 shift (P5), HTML cleaning
  * chains (P8), and the substring-match section-assignment join (J4).
  */
object ScanOps {

  /** S4 — JSON-API list scan: drill a nested JSON payload column.
    * Reference: scrapers/simple/coinlive.py:32-35 (`data.list`),
    * wallstreetcn.py:31-34 (`data.items`). `from_json` gives the typed
    * struct (schema-on-read); the scalar path is `get_json_object`.
    */
  def jsonPayload(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"),
        from_json(col("props"), schema).getField("k").cast("long").as("k"),
        get_json_object(col("props"), "$.k").cast("long").as("k_str"))
  }

  /** P5 — epoch parse with ms-autodetect (`ts/1000 if ts > 1e12`) and the
    * reference's fixed UTC+8 shift, as pure integer arithmetic (timestamp
    * rendering differs across engines; the semantics live in the math).
    * Reference: utils/spider_util.py:124-138; ms-detect stcn.py:51-61.
    */
  def epochParse(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("sec", unix_timestamp(col("ts")))
      // half the rows arrive in milliseconds — the autodetect input
      .withColumn("raw_epoch",
        when(col("event_id") % 2 === 0, col("sec") * 1000).otherwise(col("sec")))
      .withColumn("norm_s",
        when(col("raw_epoch") > 1000000000000L,
          floor(col("raw_epoch") / 1000).cast("long"))
          .otherwise(col("raw_epoch")))
      .select(
        col("event_id"), col("raw_epoch"), col("norm_s"),
        (col("norm_s") + 8L * 3600L).as("local_epoch_s"))

  /** P8 — HTML clean chain: drop script subtrees, strip tags, collapse
    * whitespace. The reference does this per source with bs4 `decompose()`
    * (e.g. scrapers/simple/cnyes.py:42-57, afp.py:50-51, iyiou.py:22-39);
    * here it is a codegen'd regexp_replace chain. The HTML is synthesized
    * around the document text so the oracle constructs the identical input.
    */
  def htmlClean(spark: SparkSession, sfDir: String): DataFrame = {
    val html = concat(
      lit("""<div class="article"><h1>t</h1><p>"""), col("text"),
      lit("""</p><script>var ad = 1;</script><img src="x.png"/></div>"""))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        trim(regexp_replace(
          regexp_replace(
            regexp_replace(html, "(?s)<script.*?</script>", ""),
            "<[^>]+>", " "),
          "\\s+", " ")).as("clean_text"))
  }

  /** J4 — section assignment by substring match with priority: a tiny
    * rules table broadcast-joined with a LIKE predicate, longest/highest-
    * priority match wins. Reference: scrapers/browser/scmp.py:116-123
    * (first matching category in link).
    */
  def sectionAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val paths = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"),
        when(col("event_id") % 10 === 0,
          concat(lit("/private/a"), col("event_id").cast("string")))
          .when(col("event_id") % 10 === 5,
            concat(lit("/private/open/a"), col("event_id").cast("string")))
          .otherwise(concat(lit("/articles/a"), col("event_id").cast("string")))
          .as("path"))
    val rules = Seq(
      ("/private/open", "open_archive", 3),
      ("/private", "restricted", 2),
      ("/articles", "news", 1)
    ).toDF("pattern", "section", "priority")
    val matched = paths
      .join(broadcast(rules), expr("path LIKE pattern || '%'"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_id").orderBy(desc("priority"))))
      .filter(col("rn") === 1)
    matched.select(
      col("event_id"), col("path"),
      coalesce(col("section"), lit("other")).as("section"))
  }

  /** S6 — POST-form positional-array scan: the reference parses an
    * `aaData` array-of-arrays payload by POSITION, not by key
    * (scrapers/browser/infocastfn.py:74-97). Synthesized payload →
    * `from_json(ArrayType(ArrayType(String)))` → posexplode → positional
    * `element_at`.
    */
  def jsonPositional(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = concat(
      lit("""[["r0",""""), col("event_id").cast("string"),
      lit(""""],["r1",""""), (col("event_id") + 1).cast("string"),
      lit(""""]]"""))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        posexplode(from_json(payload, ArrayType(ArrayType(StringType)))))
      .select(
        col("event_id"), col("pos"),
        element_at(col("col"), 1).as("tag"),
        element_at(col("col"), 2).cast("long").as("val"))
  }

  /** F1 — recency-text keep-filter: only items whose relative-time text
    * matches "N mins ago" survive (reference regex apnews.py:82,100-106).
    */
  def recencyFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val tsText = when(col("event_id") % 3 === 0,
        concat((col("event_id") % 59 + 1).cast("string"), lit(" mins ago")))
      .when(col("event_id") % 3 === 1, lit("2 hours ago"))
      .otherwise(lit("yesterday"))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), tsText.as("ts_text"))
      .filter(regexp_like(col("ts_text"), lit("^[0-9]+ mins ago$")))
      .withColumn("mins_ago",
        regexp_extract(col("ts_text"), "^([0-9]+) mins ago$", 1).cast("long"))
  }

  /** O1 — the 7-day lookback every reference query carries
    * (`DATE(pub_date) >= CURRENT_DATE-7`, utils/bigquery_client.py:130,200,
    * 254) — anchored to the table's own max date (deterministic, no wall
    * clock) so both engines cut the identical window. The dt predicate
    * reaches the scan as a pushed filter; at real scale this is the
    * partition-pruning clause PartitionFilterCheck enforces.
    */
  def recentWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val d = spark.read.parquet(s"$sfDir/events.parquet")
      .select(to_date(col("ts")).as("dt"))
    val maxD = d.agg(max("dt").as("max_dt"))
    d.crossJoin(broadcast(maxD))
      .filter(col("dt") >= date_sub(col("max_dt"), 7))
      .groupBy("dt")
      .agg(count(lit(1)).as("n"))
  }

  /** P9 — title decomposition: `security_company - title` split on the
    * first dash (reference hibor.py:102-105).
    */
  def titleSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val t = concat(col("event_type"), lit("-Article -"), col("event_id").cast("string"))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), t.as("raw_title"))
      .withColumn("company", element_at(split(col("raw_title"), "-", 2), 1))
      .withColumn("title", element_at(split(col("raw_title"), "-", 2), 2))
  }

  /** P12 — metadata JSON serialization at the sink
    * (utils/bigquery_client.py:320-322): `to_json(struct(...))` with a
    * fixed field order so the oracle constructs the identical string.
    */
  def metadataJson(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        to_json(struct(
          col("event_type").as("source"),
          (col("event_id") % 3).as("kind"))).as("metadata"))

  /** P3 — mojibake repair (reference: utils/spider_util.py:58-62,
    * `ftfy.fix_text`). The dominant — and the only deterministically
    * reversible — ftfy case is UTF-8 bytes misdecoded as ISO-8859-1
    * ("café" → "cafÃ©"); the repair is re-encode latin-1 → re-decode
    * UTF-8, two codegen'd built-ins, no UDF. The fixture synthesizes the
    * mojibake by running the corruption forward on a string with 2- and
    * 3-byte UTF-8 sequences; the oracle reproduces the corruption with
    * explicit per-codepoint UTF-8 byte math and asserts the repair
    * recovers the original exactly.
    */
  def mojibakeRepair(spark: SparkSession, sfDir: String): DataFrame = {
    val orig = concat(lit("café №"), col("event_id").cast("string"),
      lit(" — “naïve”"))
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"),
        decode(encode(orig, "UTF-8"), "ISO-8859-1").as("moji"))
      .withColumn("repaired",
        decode(encode(col("moji"), "ISO-8859-1"), "UTF-8"))
      .withColumn("was_mojibake", col("repaired") =!= col("moji"))
  }

  /** C6 — retry/fallback chains: the reference tries selector after
    * selector until one parses (e.g. scrapers/simple/jqka.py date formats;
    * per-source try/except ladders). Declaratively: `try_to_timestamp` per
    * alternative + `coalesce` picks the first success — null-safe, no
    * exceptions, fully codegen'd; `used` records which alternative won.
    */
  def fallbackChain(spark: SparkSession, sfDir: String): DataFrame = {
    val e = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("s1",
        when(col("event_id") % 3 === 0,
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).otherwise(lit("n/a")))
      .withColumn("s2",
        when(col("event_id") % 3 === 1,
          date_format(col("ts"), "dd/MM/yyyy HH:mm:ss")).otherwise(lit("bad")))
    val p1 = try_to_timestamp(col("s1"), lit("yyyy-MM-dd HH:mm:ss"))
    val p2 = try_to_timestamp(col("s2"), lit("dd/MM/yyyy HH:mm:ss"))
    e.select(
      col("event_id"),
      when(p1.isNotNull, "primary").when(p2.isNotNull, "alt")
        .otherwise("default").as("used"),
      unix_timestamp(coalesce(p1, p2, col("ts"))).as("parsed_epoch_s"))
  }

  /** robots.txt parse (north rule: "enforces robots.txt rules") — the
    * missing front half of the robots story: raw robots.txt text → the
    * (host, path_prefix, allow, crawl_delay_ms) rules rows that
    * `Scheduler.applyRobots` enforces by longest prefix. Pure string
    * plan: split on newlines, posexplode, directive/value regexp —
    * codegen'd, shuffle-free per host. The fixture synthesizes a
    * deterministic robots body per host (the reference crawls without
    * robots handling; this implements what its operators would need).
    */
  def robotsParse(spark: SparkSession, sfDir: String): DataFrame =
    robotsLines(spark, sfDir)
      .filter(col("directive").isin("Allow", "Disallow", "Crawl-delay"))
      .select(
        concat(lit("h"), col("hnum").cast("string"), lit(".example.com"))
          .as("host"),
        col("pos").cast("long").as("line_no"),
        col("directive"),
        // sentinel-typed (non-null) columns: '' / -1 mark "not this kind
        // of directive" — consumers split on `directive`
        when(col("directive") =!= "Crawl-delay", col("value")).otherwise("")
          .as("path_prefix"),
        (col("directive") === "Allow").as("allow"),
        when(col("directive") === "Crawl-delay",
          col("value").cast("long") * 1000).otherwise(-1L)
          .as("crawl_delay_ms"))

  /** The raw robots line parse behind [[robotsParse]] (all directives
    * kept): split on newlines, posexplode, directive/value regexp. The
    * fixture body per host now ends with the RFC 9309 `Sitemap:` field
    * — appended LAST so the rule rows' line numbers are unchanged.
    */
  def robotsLines(spark: SparkSession, sfDir: String): DataFrame = {
    val hosts = spark.read.parquet(s"$sfDir/events.parquet")
      .select((col("event_id") % 7).as("hnum")).distinct()
    val txt = concat(
      lit("User-agent: *\nCrawl-delay: "), col("hnum").cast("string"),
      lit("\nDisallow: /private"),
      when(col("hnum") % 2 === 0, lit("\nAllow: /private/open"))
        .otherwise(lit("")),
      lit("\nSitemap: https://h"), col("hnum").cast("string"),
      lit(".example.com/sitemap.xml"))
    val dirRe = "^([A-Za-z-]+):\\s*(.*)$"
    hosts.select(col("hnum"), txt.as("robots_txt"))
      .select(col("hnum"), posexplode(split(col("robots_txt"), "\n")))
      .withColumn("directive", regexp_extract(col("col"), dirRe, 1))
      .withColumn("value", regexp_extract(col("col"), dirRe, 2))
  }

  /** The `Sitemap:` advertisements from the robots scan — (host,
    * sitemap_url), the discovery pointer [[sitemapDiscovery]] follows.
    */
  def robotsSitemaps(spark: SparkSession, sfDir: String): DataFrame =
    robotsLines(spark, sfDir)
      .filter(col("directive") === "Sitemap")
      .select(
        concat(lit("h"), col("hnum").cast("string"), lit(".example.com"))
          .as("host"),
        col("value").as("sitemap_url"))

  /** SOURCE DISCOVERY COMPOSED (oracled as q_sitemap_discovery): the
    * crawl's discovery loop as one plan — robots.txt advertises the
    * sitemap (`Sitemap:` field, RFC 9309 §2.3), the sitemap lists the
    * URLs, and the same robots scan supplies the host's crawl-delay
    * budget — so each output row is a SCHEDULABLE candidate: (host,
    * sitemap_url, loc, lastmod_day, recency_rank, crawl_delay_ms),
    * exactly the tuple the frontier's politeness scheduler consumes.
    * Both joins are on `host` (bounded cardinality, broadcast-sized
    * dims at any corpus scale: one row per host per side).
    */
  def sitemapDiscovery(spark: SparkSession, sfDir: String): DataFrame = {
    val sm = robotsSitemaps(spark, sfDir)
    val delays = robotsParse(spark, sfDir)
      .filter(col("directive") === "Crawl-delay")
      .select(col("host"), col("crawl_delay_ms"))
    sitemapScan(spark, sfDir)
      .join(broadcast(sm), Seq("host"))
      .join(broadcast(delays), Seq("host"))
      .select("host", "sitemap_url", "loc", "lastmod_day",
        "recency_rank", "crawl_delay_ms")
  }

  /** Sitemap scan (the source-discovery half the robots story implies):
    * raw sitemap.xml text → one frontier-candidate row per `<url>` entry,
    * with `host` re-derived from the PARSED `<loc>` (not the fixture
    * parameter) and a per-host recency rank over the parsed `<lastmod>`
    * (the north rule's "recency boost" as a window over parse output).
    * Pure string plan: regexp_extract_all on the entry blocks, posexplode,
    * per-field regexp — codegen'd; the only shuffle is the per-host rank
    * window, partitioned on the parse-derived host key. The fixture
    * synthesizes a deterministic sitemap per host (hnum+3 entries, lastmod
    * a fixed function of (hnum, i)); the DuckDB oracle recomputes every
    * output field ANALYTICALLY from those parameters, so a parse bug on
    * the Spark side cannot hash-match. The reference discovers URLs only
    * from listing pages; sitemaps are what its per-site scrapers would
    * need for full-site coverage.
    */
  def sitemapScan(spark: SparkSession, sfDir: String): DataFrame = {
    val hosts = spark.read.parquet(s"$sfDir/events.parquet")
      .select((col("event_id") % 7).as("hnum")).distinct()
    val entryOf = (i: org.apache.spark.sql.Column) => concat(
      lit("<url><loc>https://h"), col("hnum").cast("string"),
      lit(".example.com/p"), i.cast("string"),
      lit("</loc><lastmod>"),
      format_string("%04d-%02d-%02d", lit(2025),
        (col("hnum") + i) % 12 + 1, (col("hnum") * 7 + i * 3) % 28 + 1),
      lit("</lastmod></url>"))
    val xml = concat(
      lit("<?xml version=\"1.0\"?><urlset>"),
      array_join(transform(sequence(lit(1), col("hnum") + 3), entryOf),
        ""),
      lit("</urlset>"))
    val parsed = hosts.select(col("hnum"), xml.as("sitemap_xml"))
      .select(explode(
        regexp_extract_all(col("sitemap_xml"), lit("<url>(.*?)</url>"),
          lit(1)))
        .as("entry"))
      .select(
        regexp_extract(col("entry"), "<loc>(.*?)</loc>", 1).as("loc"),
        regexp_extract(col("entry"), "<lastmod>(.*?)</lastmod>", 1)
          .as("lastmod"))
      .withColumn("host", regexp_extract(col("loc"), "https://([^/]+)/", 1))
      .withColumn("lastmod_day",
        unix_date(to_date(col("lastmod"))).cast("long"))
    parsed.withColumn("recency_rank", row_number().over(
        Window.partitionBy("host")
          .orderBy(desc("lastmod"), asc("loc"))).cast("long"))
      .select("host", "loc", "lastmod", "lastmod_day", "recency_rank")
  }

  /** MAIN-CONTENT EXTRACTION by link density (oracled as
    * q_html_main_content) — the boilerpipe/trafilatura block heuristic
    * (Kohlschütter et al., WSDM 2010, public method): split the page
    * into blocks, score each by text length against link count, keep the
    * densest. [[htmlClean]] strips tags; THIS decides which block IS the
    * article — nav bars and footers are mostly anchors (low score), the
    * article body is long text with few links. Integer score =
    * text_len div (1 + n_links); earliest block wins ties.
    *
    * Entirely ROW-LOCAL (plan-gated zero exchanges): blocks come from
    * one regexp_extract_all, scoring is an indexed `transform` into
    * (score, −pos, …) structs and the argmax is `array_max`'s
    * lexicographic struct order — no explode, no window, no shuffle; a
    * 100 TB extraction pass runs at scan rate.
    *
    * Fixture: nav (3 + doc_id % 3 links), the article block wrapping the
    * doc text plus ONE related-link anchor, and a two-link footer — the
    * DuckDB oracle recomputes the winner ANALYTICALLY from the synthesis
    * (main text = doc text ⊕ " rel", 3 blocks, 1 link), so a block
    * split or scoring bug cannot hash-match.
    */
  def htmlMainContent(spark: SparkSession, sfDir: String): DataFrame = {
    val navLinks = expr(
      """concat_ws('', transform(sequence(1, 3 + CAST(doc_id % 3 AS INT)),
        |  i -> concat('<a href="/s', i, '">Sec', i, '</a>')))""".stripMargin)
    val html = concat(
      lit("""<html><body><div class="nav">"""), navLinks,
      lit("""</div><div class="main"><p>"""), col("text"),
      lit("""</p> <a href="/rel">rel</a></div><div class="footer">"""),
      lit("""<a href="/about">About</a> <a href="/terms">Terms</a>"""),
      lit("""</div></body></html>"""))
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), html.as("html"))
      .withColumn("blocks", regexp_extract_all(col("html"),
        lit("<div[^>]*>(.*?)</div>"), lit(1)))
      .withColumn("best", expr(DensestBlockExpr))
      .select(col("doc_id"),
        size(col("blocks")).cast("long").as("n_blocks"),
        col("best.txt").as("main_text"),
        length(col("best.txt")).cast("long").as("main_len"),
        col("best.links").as("main_links"))
  }

  /** The density argmax over a `blocks` array column: (score, −pos, txt,
    * links) structs through `array_max`'s lexicographic order — shared
    * by [[htmlMainContent]] and its spec's hand cases.
    */
  val DensestBlockExpr: String =
    """array_max(transform(blocks, (b, i) -> named_struct(
      |  'score', CAST(length(trim(regexp_replace(b, '<[^>]*>', '')))
      |             AS BIGINT)
      |           div (1 + CAST(regexp_count(b, '<a ') AS BIGINT)),
      |  'negpos', -i,
      |  'txt', trim(regexp_replace(b, '<[^>]*>', '')),
      |  'links', CAST(regexp_count(b, '<a ') AS BIGINT))))""".stripMargin

  /** WARC record scan (the archival format a web-scale fetcher writes and
    * every replay/reprocess job reads — ISO 28500): one fetched WARC slab
    * → one row per `response` record, headers parsed, payload length
    * checked against the declared `Content-Length`. The reference fetches
    * live HTML and keeps nothing (base_scraper.py loops re-fetch on every
    * run); at 100 TB the fetch output IS a WARC archive and downstream
    * passes re-read it, so record parsing is a first-class scan.
    *
    * Fixture: each event row synthesizes a slab of 2-3 records — a
    * `response` (payload deterministic in event_id, every 13th row
    * declaring Content-Length one byte long — a truncated-capture
    * corruption the parser must FLAG, not drop), a `request` record the
    * scan filters out, and for odd rows a second response. The DuckDB
    * oracle recomputes every output field ANALYTICALLY from the synthesis
    * parameters (never re-parses), so a parser bug cannot hash-match.
    *
    * Scale shape: pure row-local string plan — split on the record
    * delimiter, posexplode, per-field regexp, all codegen'd; ZERO
    * exchanges (plan-gated). A 100 TB WARC corpus parses embarrassingly
    * parallel at scan speed.
    */
  def warcParse(spark: SparkSession, sfDir: String): DataFrame = {
    val crlf = "\r\n"
    val id = col("event_id").cast("string")
    val payload1 = concat(lit("payload-"), id, lit("-"),
      repeat(lit("x"), (col("event_id") % 17).cast("int")))
    val decl1 = (length(payload1) +
      when(col("event_id") % 13 === 0, 1).otherwise(0)).cast("string")
    val uri1 = concat(lit("https://"), col("event_type"),
      lit(".example.com/articles/a"), id)
    val rec1 = concat(
      lit(s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Target-URI: "),
      uri1, lit(crlf + "Content-Length: "), decl1,
      lit(crlf + crlf), payload1, lit(crlf + crlf))
    val rec2 = concat(
      lit(s"WARC/1.0${crlf}WARC-Type: request${crlf}WARC-Target-URI: "),
      uri1, lit(s"${crlf}Content-Length: 0$crlf$crlf$crlf$crlf"))
    val payload3 = concat(lit("alt-"), id)
    val rec3 = when(col("event_id") % 2 === 1, concat(
      lit(s"WARC/1.0${crlf}WARC-Type: response${crlf}WARC-Target-URI: "),
      concat(lit("https://"), col("event_type"),
        lit(".example.com/articles/b"), id),
      lit(crlf + "Content-Length: "), length(payload3).cast("string"),
      lit(crlf + crlf), payload3, lit(crlf + crlf)))
      .otherwise(lit(""))
    val slab = concat(rec1, rec2, rec3)
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), slab.as("warc"))
      .select(col("event_id"),
        posexplode(split(col("warc"), "WARC/1\\.0\r\n"))
          .as(Seq("rec_idx", "rec")))
      .filter(col("rec") =!= "")
      .select(
        col("event_id"), col("rec_idx").cast("long").as("rec_idx"),
        regexp_extract(col("rec"), "WARC-Type: ([a-z]+)\r\n", 1)
          .as("warc_type"),
        regexp_extract(col("rec"), "WARC-Target-URI: (\\S+)\r\n", 1)
          .as("uri"),
        regexp_extract(col("rec"), "Content-Length: (\\d+)\r\n", 1)
          .cast("long").as("decl_len"),
        length(regexp_extract(col("rec"), "(?s)\r\n\r\n(.*)\r\n\r\n$", 1))
          .cast("long").as("payload_len"))
      .filter(col("warc_type") === "response")
      .withColumn("valid", col("decl_len") === col("payload_len"))
  }

  /** §2.7 — multi-listing union with ordinal re-index: the reference
    * concatenates two section listings and re-slices the head
    * (`(top + list_items)[:7]`, fiercepharma.py:64; scmp.py:103-110).
    * unionByName + per-source row_number over (section order, list order),
    * capped.
    */
  def multiSectionUnion(spark: SparkSession, sfDir: String, cap: Int = 7)
      : DataFrame = {
    val f = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type").as("source"), col("event_id"))
    val top = f.filter(col("event_id") % 5 === 0).withColumn("sec_order", lit(0))
    val rest = f.filter(col("event_id") % 5 === 1).withColumn("sec_order", lit(1))
    top.unionByName(rest)
      .withColumn("item_idx", row_number().over(
        Window.partitionBy("source")
          .orderBy(asc("sec_order"), asc("event_id"))).cast("long"))
      .filter(col("item_idx") <= cap)
      .select("source", "event_id", "sec_order", "item_idx")
  }
}
