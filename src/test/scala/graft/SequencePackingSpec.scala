package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Laws of contiguous sequence packing (TrainingOps.sequencePackingOf):
  * exclusive-prefix-sum starts, stream coverage, the span arithmetic at a
  * sequence boundary, zero-token docs, and repartition invariance (the
  * layout is a pure function of the corpus).
  */
class SequencePackingSpec extends SparkTestBase {
  import spark.implicits._

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  /** Docs all in one (lang, shard) stream: ids ≡ 0 (mod PackShards). */
  private def streamDocs(tokens: Seq[Int]) =
    tokens.zipWithIndex.map { case (n, i) =>
      (i.toLong * TrainingOps.PackShards, "en", words(n))
    }.toDF("doc_id", "lang", "text")

  test("hand case: starts are the exclusive prefix sum; spans cross the " +
      "512 boundary exactly when the arithmetic says") {
    // stream: 100 | 400 | 600 | 12 tokens → starts 0, 100, 500, 1100
    val out = TrainingOps.sequencePackingOf(streamDocs(Seq(100, 400, 600, 12)))
      .orderBy("doc_id")
      .select("n_tokens", "tok_start", "first_seq", "last_seq", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (100L, 0L, 0L, 0L, 1L),     // tokens 0..99 → seq 0 only
      (400L, 100L, 0L, 0L, 1L),   // 100..499 → still seq 0
      (600L, 500L, 0L, 2L, 3L),   // 500..1099 → seqs 0,1,2 (boundary x2)
      (12L, 1100L, 2L, 2L, 1L)))  // 1100..1111 → seq 2
  }

  test("zero-token doc: occupies no sequence, shifts no neighbor") {
    val out = TrainingOps.sequencePackingOf(streamDocs(Seq(10, 0, 5)))
      .orderBy("doc_id")
      .select("n_tokens", "tok_start", "n_seqs")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 0L, 1L), (0L, 10L, 0L), (5L, 10L, 1L)))
  }

  test("stream coverage on the fixture corpus: per (lang, shard) the last " +
      "doc ends exactly at the stream's total token count, and spans obey " +
      "n_seqs == last - first + 1") {
    val packed = TrainingOps.sequencePacking(spark, sf()).cache()
    try {
      val bad = packed.filter(
        col("n_tokens") > 0 &&
          col("n_seqs") =!= col("last_seq") - col("first_seq") + 1).count()
      assert(bad == 0L)
      val cover = packed.groupBy("lang", "shard")
        .agg(max(col("tok_start") + col("n_tokens")).as("stream_end"),
          sum("n_tokens").as("total"))
        .filter(col("stream_end") =!= col("total")).count()
      assert(cover == 0L)
      // starts never overlap: within a stream, sorted starts are exactly
      // the exclusive prefix sums (strictly monotone over nonzero docs)
      val overlaps = packed.as("a").join(packed.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.shard") === col("b.shard") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.tok_start") + col("a.n_tokens") > col("b.tok_start")).count()
      assert(overlaps == 0L)
    } finally { packed.unpersist(); () }
  }

  test("repartition invariance: the packing is a pure function of the " +
      "corpus, not of its physical layout") {
    val corpus = streamDocs(Seq(100, 400, 600, 12, 7, 513))
    val a = TrainingOps.sequencePackingOf(corpus.repartition(1))
    val b = TrainingOps.sequencePackingOf(corpus.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
