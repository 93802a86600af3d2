package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CrawlOps

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each paired (where SQL-expressible) with a DuckDB oracle over the same
  * parquet tables. Column names are aliased identically on both sides (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the reference's dedup-cache bootstrap (SURVEY.md §7.2 / D1)
    * on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CrawlOps.dedupBootstrap(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- crawl/frontier query surface (SURVEY.md §2.3/§2.5/§2.6) ---
    "q_dedup_bootstrap" -> ((s, d) => CrawlOps.dedupBootstrap(s, d)),
    "q_latest_per_source" -> ((s, d) => CrawlOps.latestForSource(s, d)),
    "q_anti_join_seen" -> ((s, d) => CrawlOps.antiJoinSeen(s, d)),
    "q_stop_at_first_seen" -> ((s, d) => CrawlOps.stopAtFirstSeen(s, d)),
    "q_per_source_caps" -> ((s, d) => CrawlOps.perSourceCaps(s, d)),
    "q_first_occurrence_distinct" -> ((s, d) => CrawlOps.firstOccurrenceDistinct(s, d)),
    "q_stats_per_source" -> ((s, d) => CrawlOps.statsPerSource(s, d)),
    "q_canonicalize_urls" -> ((s, d) => CrawlOps.canonicalizeUrls(s, d)),
    "q_politeness_epochs" -> ((s, d) => CrawlOps.politenessEpochs(s, d)),
    "q_unseen_filter_bloom" -> ((s, d) => CrawlOps.unseenFilterBloom(s, d)),
    "q_salted_host_rank" -> ((s, d) => CrawlOps.saltedHostRank(s, d)),
    "q_robots_gate" -> ((s, d) => CrawlOps.robotsGate(s, d))
  )

  def oracleSql: Map[String, String] = {
    val frontierCte =
      """SELECT event_type AS source,
        |       'https://' || event_type || '.example.com/articles/a' || CAST(event_id AS VARCHAR) AS link,
        |       ts AS crawled_at, event_id, user_id, value
        |FROM events""".stripMargin
    val limitCase =
      """CASE source WHEN 'click' THEN 30 WHEN 'error' THEN 50
        | WHEN 'purchase' THEN 10 WHEN 'signup' THEN 999999 ELSE 25 END""".stripMargin

    Map(
      "q_dedup_bootstrap" ->
        s"""WITH f AS ($frontierCte),
           |ranked AS (
           |  SELECT source, link,
           |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY crawled_at DESC, event_id ASC) AS rn
           |  FROM f)
           |SELECT DISTINCT source, link FROM ranked
           |WHERE rn <= $limitCase""".stripMargin,
      "q_latest_per_source" ->
        s"""WITH f AS ($frontierCte)
           |SELECT link, crawled_at, event_id FROM f
           |WHERE source = 'click'
           |ORDER BY crawled_at DESC, event_id ASC LIMIT 30""".stripMargin,
      "q_anti_join_seen" ->
        s"""WITH f AS ($frontierCte)
           |SELECT source, link, event_id FROM f
           |WHERE link NOT IN (SELECT link FROM f WHERE event_id % 3 = 0)""".stripMargin,
      "q_stop_at_first_seen" ->
        s"""WITH f AS ($frontierCte),
           |m AS (SELECT source,
           |             MIN(CASE WHEN event_id % 7 = 0 THEN event_id END) AS first_seen
           |      FROM f GROUP BY source)
           |SELECT f.source, f.link, f.event_id
           |FROM f JOIN m ON f.source = m.source
           |WHERE m.first_seen IS NULL OR f.event_id < m.first_seen""".stripMargin,
      "q_per_source_caps" ->
        s"""WITH f AS ($frontierCte),
           |r AS (SELECT source, link, event_id,
           |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY event_id ASC) AS rn
           |      FROM f)
           |SELECT source, link, event_id, rn FROM r
           |WHERE rn <= $limitCase""".stripMargin,
      "q_first_occurrence_distinct" ->
        s"""WITH f AS (
           |  SELECT event_type AS source, event_id,
           |         'https://' || event_type || '.example.com/articles/a' || CAST(event_id % 97 AS VARCHAR) AS dup_link
           |  FROM events),
           |r AS (SELECT dup_link, source, event_id,
           |             ROW_NUMBER() OVER (PARTITION BY dup_link ORDER BY event_id ASC) AS rn
           |      FROM f)
           |SELECT dup_link AS link, source, event_id FROM r WHERE rn = 1""".stripMargin,
      "q_stats_per_source" ->
        s"""WITH f AS ($frontierCte)
           |SELECT source,
           |       COUNT(*) AS total,
           |       COUNT(DISTINCT CAST(crawled_at AS DATE)) AS active_days,
           |       CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
           |       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS errors
           |FROM f GROUP BY source
           |ORDER BY total DESC, source ASC""".stripMargin,
      "q_canonicalize_urls" ->
        """SELECT event_id,
          |       'https://' || lower(event_type) || '.example.com/articles/a' || CAST(event_id AS VARCHAR)
          |         || '?id=' || CAST(event_id AS VARCHAR) || '&lang=en' AS canonical_url,
          |       lower(event_type) || '.example.com' AS host
          |FROM events""".stripMargin,
      "q_politeness_epochs" ->
        s"""WITH f AS ($frontierCte),
           |r AS (SELECT source, link, event_id,
           |             ROW_NUMBER() OVER (PARTITION BY source ORDER BY crawled_at ASC, event_id ASC) AS rn
           |      FROM f)
           |SELECT source, link, event_id, rn,
           |       CAST(FLOOR((rn - 1) / 5.0) AS BIGINT) AS fetch_epoch
           |FROM r""".stripMargin,
      "q_unseen_filter_bloom" ->
        s"""WITH f AS ($frontierCte)
           |SELECT source, link, event_id FROM f
           |WHERE link NOT IN (SELECT link FROM f WHERE event_id % 3 = 0)""".stripMargin,
      "q_salted_host_rank" ->
        s"""WITH f AS ($frontierCte),
           |h AS (SELECT source || '.example.com' AS host, link, event_id FROM f)
           |SELECT host, link, event_id,
           |       ROW_NUMBER() OVER (PARTITION BY host ORDER BY event_id ASC) AS host_rank
           |FROM h""".stripMargin,
      "q_robots_gate" ->
        s"""WITH f AS ($frontierCte),
           |h AS (
           |  SELECT source || '.example.com' AS host, event_id,
           |         CASE WHEN event_id % 10 = 0 THEN '/private/a' || CAST(event_id AS VARCHAR)
           |              WHEN event_id % 10 = 5 THEN '/private/open/a' || CAST(event_id AS VARCHAR)
           |              ELSE '/articles/a' || CAST(event_id AS VARCHAR) END AS path
           |  FROM f)
           |SELECT host, path, event_id,
           |  CASE
           |    WHEN host = 'click.example.com' AND path LIKE '/private/open%' THEN TRUE
           |    WHEN host = 'click.example.com' AND path LIKE '/private%' THEN FALSE
           |    WHEN host = 'click.example.com' THEN TRUE
           |    WHEN host = 'purchase.example.com' AND path LIKE '/private%' THEN FALSE
           |    ELSE TRUE END AS allowed,
           |  CASE
           |    WHEN host = 'click.example.com' AND path LIKE '/private/open%' THEN 500
           |    WHEN host = 'click.example.com' AND path LIKE '/private%' THEN 0
           |    WHEN host = 'click.example.com' THEN 1000
           |    WHEN host = 'error.example.com' THEN 250
           |    ELSE 0 END AS robots_delay_ms
           |FROM h""".stripMargin
    )
  }
}
