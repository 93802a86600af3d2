package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-committed frontier/article store — Iceberg *semantics* over
  * partitioned Parquet (SURVEY.md §7.0: no Iceberg runtime jar in
  * /opt/spark/jars, so the table format is implemented here and kept behind
  * this class's narrow API so a real Iceberg catalog slots in unchanged).
  *
  * Replaces the reference's append-only BigQuery table + its in-memory seen
  * set (/root/reference/utils/bigquery_client.py:64-120) with:
  *
  *  - snapshot manifests `snapshots/snap-%05d.json`: snapshot id, parent id,
  *    fetch epoch, per-table data paths, per-partition lineage
  *    (frontier-segment id → row count) and the tick's dedup counters
  *    (north rule: "resumable from checkpoint with per-partition lineage +
  *    metrics");
  *  - data laid out per snapshot: `data/articles/snap-N/` (partitioned by
  *    `dt`, sorted within partitions by (source, language) — the analog of
  *    the reference's PARTITION BY DATE(pub_date) CLUSTER BY source,
  *    language, deploy/create_bigquery_table.sql:26-32);
  *  - `data/seen/snap-N/` — the canonical-URL delta this tick added,
  *    hash-partitioned by frontier segment so the URL-seen state reads back
  *    co-partitioned with the Bloom probe (graft.seen.UrlSeen);
  *  - commits are atomic: manifest written to a temp file and
  *    ATOMIC_MOVE'd into place — readers either see the whole snapshot or
  *    none of it. The manifest is the commit point; data files written
  *    before it are invisible until it lands.
  *
  * Time-travel: any read takes an optional snapshot id; the manifest chain
  * (parent pointers) gives the file set as of that snapshot.
  */
final class FrontierStore(rootDir: String, nSegments: Int = 16) {

  private val root: Path = Paths.get(rootDir)
  private val snapsDir = root.resolve("snapshots")
  private val dataDir = root.resolve("data")

  def init(): this.type = {
    Files.createDirectories(snapsDir)
    Files.createDirectories(dataDir)
    this
  }

  // ------------------------------------------------------------- manifests

  import FrontierStore.Manifest

  private def manifestPath(id: Int): Path =
    snapsDir.resolve(f"snap-$id%05d.json")

  private def render(m: Manifest): String = {
    val segs = m.segmentCounts.toSeq.sortBy(_._1)
      .map { case (s, c) => s""""$s": $c""" }.mkString("{", ", ", "}")
    s"""{
       |  "snapshot_id": ${m.snapshotId},
       |  "parent_id": ${m.parentId},
       |  "fetch_epoch": ${m.fetchEpoch},
       |  "articles_path": ${m.articlesPath.map(p => "\"" + p + "\"").getOrElse("null")},
       |  "seen_delta_path": "${m.seenDeltaPath}",
       |  "segment_counts": $segs,
       |  "metrics": {"new_articles": ${m.newArticles}, "skipped": ${m.skipped}, "errors": ${m.errors}}
       |}""".stripMargin
  }

  private def parse(json: String): Manifest = {
    // minimal, dependency-free parser for the fixed manifest shape
    def num(key: String): Long = {
      val m = s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(json)
      m.map(_.group(1).toLong).getOrElse(
        throw new IllegalStateException(s"manifest missing $key"))
    }
    def str(key: String): Option[String] =
      s""""$key"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))
    val segBlock = """"segment_counts"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val segs = """"(\d+)"\s*:\s*(\d+)""".r.findAllMatchIn(segBlock)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    Manifest(
      snapshotId = num("snapshot_id").toInt,
      parentId = num("parent_id").toInt,
      fetchEpoch = num("fetch_epoch"),
      articlesPath = str("articles_path"),
      seenDeltaPath = str("seen_delta_path").get,
      segmentCounts = segs,
      newArticles = num("new_articles"),
      skipped = num("skipped"),
      errors = num("errors"))
  }

  def snapshotIds(): Seq[Int] =
    if (!Files.isDirectory(snapsDir)) Nil
    else Files.list(snapsDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("snap-") && s.endsWith(".json") =>
        s.stripPrefix("snap-").stripSuffix(".json").toInt }
      .toSeq.sorted

  def manifest(id: Int): Manifest =
    parse(Files.readString(manifestPath(id)))

  def latest(): Option[Manifest] = snapshotIds().lastOption.map(manifest)

  /** Manifest chain from `id` back to the root (oldest first). */
  def chain(id: Int): Seq[Manifest] = {
    val acc = List.newBuilder[Manifest]
    var cur = id
    var out = List.empty[Manifest]
    while (cur >= 0) {
      val m = manifest(cur)
      out = m :: out
      cur = m.parentId
    }
    out
  }

  // ---------------------------------------------------------------- commit

  /** Commit one tick's results as the next snapshot.
    *
    * @param emitted  CrawlResult-shaped rows (must carry canonical_url,
    *                 source, language; a `dt` partition column is derived
    *                 from fetchEpoch — deterministic, no wall clock)
    * @param stats    per-source (new_articles, skipped, errors)
    */
  def commit(spark: SparkSession, emitted: DataFrame, stats: DataFrame,
      fetchEpoch: Long): Manifest = {
    init()
    val id = snapshotIds().lastOption.map(_ + 1).getOrElse(0)
    val parent = id - 1

    // article data: partitioned by dt (epoch-derived), clustered within
    // partitions by (source, language) for min/max row-group skipping (O2)
    val articlesRel = s"data/articles/snap-$id"
    val dt = date_format(
      to_utc_timestamp(timestamp_seconds(lit(1735689600L) + lit(fetchEpoch) * 300),
        "UTC"), "yyyy-MM-dd")
    emitted
      .withColumn("dt", dt)
      .repartition(col("dt"))
      .sortWithinPartitions("source", "language")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(root.resolve(articlesRel).toString)

    // seen delta: canonical urls hash-partitioned by frontier segment —
    // co-partitioned with the Bloom probe's pmod(xxhash64(url), nSegments)
    val seenRel = s"data/seen/snap-$id"
    val delta = emitted.select(col("canonical_url"))
      .withColumn("seg",
        pmod(xxhash64(col("canonical_url")), lit(nSegments.toLong)).cast("int"))
    delta
      .repartition(col("seg"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("seg")
      .parquet(root.resolve(seenRel).toString)

    val segCounts = delta.groupBy("seg").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val totals = stats.agg(
      sum("new_articles"), sum("skipped"), sum("errors")).collect()(0)
    def tl(i: Int): Long = if (totals.isNullAt(i)) 0L else totals.getLong(i)

    val m = Manifest(id, parent, fetchEpoch, Some(articlesRel), seenRel,
      segCounts, tl(0), tl(1), tl(2))

    // atomic commit point: temp manifest → ATOMIC_MOVE into place
    val tmp = Files.createTempFile(snapsDir, s".snap-$id", ".tmp")
    Files.writeString(tmp, render(m))
    Files.move(tmp, manifestPath(id), StandardCopyOption.ATOMIC_MOVE)
    m
  }

  /** Seed the store with a pre-existing seen set as snapshot 0 (the analog
    * of the reference's dedup bootstrap from BigQuery, D1).
    */
  def initSeen(spark: SparkSession, seen: DataFrame): Manifest = {
    init()
    require(snapshotIds().isEmpty, "initSeen on a non-empty store")
    val seenRel = "data/seen/snap-0"
    val delta = seen.select(col("canonical_url"))
      .withColumn("seg",
        pmod(xxhash64(col("canonical_url")), lit(nSegments.toLong)).cast("int"))
    delta.repartition(col("seg"))
      .write.mode(SaveMode.Overwrite).partitionBy("seg")
      .parquet(root.resolve(seenRel).toString)
    val segCounts = delta.groupBy("seg").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = Manifest(0, -1, -1L, None, seenRel, segCounts, 0L, 0L, 0L)
    val tmp = Files.createTempFile(snapsDir, ".snap-0", ".tmp")
    Files.writeString(tmp, render(m))
    Files.move(tmp, manifestPath(0), StandardCopyOption.ATOMIC_MOVE)
    m
  }

  // ----------------------------------------------------------------- reads

  /** URL-seen state as of snapshot `asOf` (default: latest): union of all
    * seen deltas in the manifest chain. One column `canonical_url` (+ seg).
    */
  def seen(spark: SparkSession, asOf: Option[Int] = None): DataFrame = {
    val id = asOf.orElse(snapshotIds().lastOption)
      .getOrElse(throw new IllegalStateException("empty store"))
    val paths = chain(id).map(m => root.resolve(m.seenDeltaPath).toString)
    // one read per snapshot dir, unioned: each dir is its own partitioned
    // root (seg=N subdirs), so a single multi-path read would mis-infer
    paths.map(p => spark.read.parquet(p).select("canonical_url"))
      .reduce(_ unionByName _)
  }

  /** Articles as of snapshot `asOf` (default: latest) — time-travel read. */
  def articles(spark: SparkSession, asOf: Option[Int] = None): DataFrame = {
    val id = asOf.orElse(snapshotIds().lastOption)
      .getOrElse(throw new IllegalStateException("empty store"))
    val paths = chain(id).flatMap(_.articlesPath)
      .map(p => root.resolve(p).toString)
    require(paths.nonEmpty, "no article snapshots")
    paths.map(p => spark.read.parquet(p)).reduce(_ unionByName _)
  }

  def delete(): Unit =
    if (Files.exists(root))
      Files.walk(root).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
}

object FrontierStore {
  final case class Manifest(
      snapshotId: Int,
      parentId: Int, // -1 for first
      fetchEpoch: Long,
      articlesPath: Option[String],
      seenDeltaPath: String,
      // lineage: frontier segment id -> rows added to seen in this snapshot
      segmentCounts: Map[Int, Long],
      // the tick's A1/A2 metrics
      newArticles: Long, skipped: Long, errors: Long)
}
