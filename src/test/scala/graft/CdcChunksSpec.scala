package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Content-defined chunking laws: the hand-replayed cut rule, the
  * insertion-robustness property that motivates CDC over fixed-size
  * chunks, per-doc token accounting, keeper uniqueness, and the
  * row-local plan shape.
  */
class CdcChunksSpec extends SparkTestBase {
  import spark.implicits._

  /** The operator's hash60, replayed on the JVM for ground truth. */
  private def h60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
  private def isBoundary(tok: String): Boolean =
    h60(tok) % TrainingOps.CdcMask == 0

  // deterministic token pool with known boundary structure
  private val pool = (0 until 200).map(i => s"tok$i")
  private val boundaries = pool.filter(isBoundary)

  test("hand case: chunks cut AFTER each boundary token, trailing " +
      "partial chunk kept, single-chunk doc when no boundary fires") {
    assert(boundaries.size >= 2, s"pool needs boundaries, has $boundaries")
    val b1 = boundaries(0); val b2 = boundaries(1)
    val plain = pool.filterNot(isBoundary)
    // doc 1: p0 p1 B1 p2 B2 p3 p4  → chunks [p0 p1 B1] [p2 B2] [p3 p4]
    val d1 = Seq(plain(0), plain(1), b1, plain(2), b2, plain(3), plain(4))
    // doc 2: no boundary → one chunk
    val d2 = Seq(plain(5), plain(6), plain(7))
    val corpus = Seq(
      (1L, d1.mkString(" ")), (2L, d2.mkString(" "))).toDF("doc_id", "text")
    val out = TrainingOps.cdcChunksOf(corpus)
      .select("doc_id", "chunk_idx", "chunk_hash", "n_toks")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (1L, 0L, h60(s"${plain(0)} ${plain(1)} $b1"), 3L),
      (1L, 1L, h60(s"${plain(2)} $b2"), 2L),
      (1L, 2L, h60(s"${plain(3)} ${plain(4)}"), 2L),
      (2L, 0L, h60(s"${plain(5)} ${plain(6)} ${plain(7)}"), 3L))
    assert(out == expected)
  }

  test("insertion robustness — the law fixed-size chunking lacks: " +
      "prepending a token leaves every post-first-boundary chunk " +
      "dedupable against the original") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 8).orderBy("doc_id")
      .select("text").as[String].collect().mkString(" ")
    val corpus = Seq((1L, d), (2L, s"inserted $d")).toDF("doc_id", "text")
    val chunks = TrainingOps.cdcChunksOf(corpus).cache()
    val a = chunks.filter(col("doc_id") === 1)
    val b = chunks.filter(col("doc_id") === 2)
    // chunks of A past its first one must ALL reappear in B: boundary
    // decisions are per-token, so the cut positions resynchronize at
    // A's first boundary regardless of the prepended token
    val missing = a.filter(col("chunk_idx") >= 1)
      .join(b.select(col("chunk_hash")), Seq("chunk_hash"), "left_anti")
    assert(missing.isEmpty,
      s"shifted chunks failed to resync: ${missing.take(3).mkString(";")}")
    assert(a.count() >= 3, "fixture doc too short to exercise the law")
  }

  test("accounting: per-doc chunk token counts sum to the doc's token " +
      "count; exactly one is_first per distinct chunk hash") {
    val out = TrainingOps.cdcChunks(spark, sf()).cache()
    val perDoc = out.groupBy("doc_id").agg(sum("n_toks").as("s"))
    val truth = TrainingOps.docs(spark, sf()).select(col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => t =!= ""))
        .cast("long").as("n"))
      .filter(col("n") >= 1)
    val bad = perDoc.join(truth, Seq("doc_id"))
      .filter(col("s") =!= col("n"))
    assert(bad.isEmpty, s"token mass lost: ${bad.take(3).mkString(";")}")
    val keepers = out.groupBy("chunk_hash")
      .agg(sum(when(col("is_first"), 1L).otherwise(0L)).as("nf"))
      .filter(col("nf") =!= 1L)
    assert(keepers.isEmpty, "each chunk hash needs exactly one keeper")
  }

  test("plan gate: the chunker is row-local — no window operator, no " +
      "cartesian; shuffles only at the keeper aggregate and its join") {
    val plan = castToImpl(TrainingOps.cdcChunks(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"chunking must not use a window:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
