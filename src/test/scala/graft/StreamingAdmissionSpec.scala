package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAdmission
import graft.streaming.StreamingAdmission.DocRow

/** Streaming corpus admission: micro-batches of crawled docs admitted
  * against the persisted near-dup index, with admitted docs extending
  * the index for later batches. Per-doc tokens are unique (w<id>_<i>),
  * so cross-doc similarity exists exactly where planted — twins share a
  * prefix, everything else is Jaccard-0.
  */
class StreamingAdmissionSpec extends SparkTestBase {

  private def text(id: Long, n: Int): String =
    (0 until n).map(i => s"w${id}_$i").mkString(" ")
  /** twin of `of`: the first n tokens (tail-chop, Jaccard ≈ n/40). */
  private def twin(id: Long, of: Long, n: Int): DocRow =
    DocRow(id, text(of, 40).split(" ").take(n).mkString(" "))

  private def baselineDocs = (1L to 8L).map(id => DocRow(id, text(id, 40)))

  private def writeBaseline(dir: String): (String, String) = {
    import spark.implicits._
    val docs = baselineDocs.toDF("doc_id", "text")
    val sh = graft.operators.TrainingOps.shinglesOf(docs)
    val sigs = graft.operators.TrainingOps.bandSignaturesOf(
      graft.operators.TrainingOps.minhashSignaturesOf(sh))
    sigs.write.mode("overwrite").parquet(s"$dir/base_sigs")
    sh.write.mode("overwrite").parquet(s"$dir/base_sh")
    (s"$dir/base_sigs", s"$dir/base_sh")
  }

  // B1: twin-of-index (reject), fresh (admit), fresh + its intra twin
  private def batch1 = Seq(
    twin(101L, of = 3L, n = 35),
    DocRow(102L, text(102L, 40)),
    DocRow(103L, text(103L, 40)),
    twin(104L, of = 103L, n = 35))
  // B2: twin of B1-admitted doc (reject via the DELTA index), twin of the
  // intra-dropped 104 (rejects against its KEEPER 103 — the admitted doc
  // is the index entry, the dropped one never is), fresh (admit)
  private def batch2 = Seq(
    twin(201L, of = 102L, n = 35),
    twin(202L, of = 103L, n = 30),
    DocRow(203L, text(203L, 40)))

  private def verdictMap(df: DataFrame): Map[Long, (Long, Long, Long, Boolean)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_dup_matches"), r.getAs[Long]("corpus_match"),
        r.getAs[Long]("intra_dropped_by"), r.getAs[Boolean]("admit")))).toMap

  test("streamed admission chain: index rejects, fresh admits, intra " +
      "keep-first, admitted docs extend the index for later batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = "target/test-admission"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (sigsDir, shDir) = writeBaseline(root)
    val workDir = s"$root/work"
    val ckpt = s"$root/ckpt"

    val input = MemoryStream[DocRow]
    val q = StreamingAdmission.admissionStream(
      input.toDS(), sigsDir, shDir, workDir, ckpt)
    input.addData(batch1); q.processAllAvailable()
    input.addData(batch2); q.processAllAvailable()
    q.stop()

    assert(StreamingAdmission.committedBatches(workDir) == Seq(0L, 1L))
    val v = verdictMap(StreamingAdmission.readVerdicts(spark, workDir))
    assert(v(101L)._2 == 3L && !v(101L)._4, s"101 must reject vs index: $v")
    assert(v(102L)._4 && v(102L)._2 == -1L, s"102 must admit: $v")
    assert(v(103L)._4, s"103 must admit: $v")
    assert(v(104L)._3 == 103L && !v(104L)._4,
      s"104 must drop intra-batch behind 103: $v")
    // cross-batch: 201 rejects against 102, which entered the index as a
    // BATCH-1 DELTA — the law that makes this a pipeline, not a filter
    assert(v(201L)._2 == 102L && !v(201L)._4,
      s"201 must reject vs the batch-1 delta: $v")
    // the intra-dropped 104 never reached the index; its twin rejects
    // against the KEEPER 103 instead
    assert(v(202L)._2 == 103L && !v(202L)._4,
      s"202 must reject vs keeper 103: $v")
    assert(v(203L)._4, s"203 must admit: $v")
    // the index deltas carry exactly the admitted docs
    val delta0 = spark.read.parquet(s"$workDir/sigs_0")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(delta0 == Set(102L, 103L), s"batch-0 delta: $delta0")
  }

  test("stream ≡ sequential admitBatch replay (the kernel is the " +
      "contract; streaming adds only plumbing)") {
    import spark.implicits._
    val root = "target/test-admission-replay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (sigsDir, shDir) = writeBaseline(root)

    val sigs0 = spark.read.parquet(sigsDir)
    val sh0 = spark.read.parquet(shDir)
    val a1 = StreamingAdmission.admitBatch(
      batch1.toDF("doc_id", "text"), sigs0, sh0)
    val sigs1 = sigs0.unionByName(a1.deltaSigs)
    val sh1 = sh0.unionByName(a1.deltaSh)
    val a2 = StreamingAdmission.admitBatch(
      batch2.toDF("doc_id", "text"), sigs1, sh1)
    val sequential = a1.verdicts.unionByName(a2.verdicts)
      .collect().map(_.toSeq).toSet

    // reuse the first test's streamed output if present, else stream here
    implicit val sql = spark.sqlContext
    val streamedDir = "target/test-admission/work"
    if (StreamingAdmission.committedBatches(streamedDir).isEmpty) {
      val input = MemoryStream[DocRow]
      val q = StreamingAdmission.admissionStream(
        input.toDS(), sigsDir, shDir, streamedDir, s"$root/ckpt-seq")
      input.addData(batch1); q.processAllAvailable()
      input.addData(batch2); q.processAllAvailable()
      q.stop()
    }
    val streamed = StreamingAdmission.readVerdicts(spark, streamedDir)
      .drop("batch_id").collect().map(_.toSeq).toSet
    assert(streamed == sequential,
      s"stream diverges from the sequential chain: " +
        s"only-stream=${(streamed -- sequential).take(3)} " +
        s"only-seq=${(sequential -- streamed).take(3)}")
    a1.release(); a2.release()
  }

  test("replay idempotence: a re-delivered batch id hits the commit " +
      "marker and changes nothing") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = "target/test-admission-idem"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (sigsDir, shDir) = writeBaseline(root)
    val workDir = s"$root/work"

    val input1 = MemoryStream[DocRow]
    val q1 = StreamingAdmission.admissionStream(
      input1.toDS(), sigsDir, shDir, workDir, s"$root/ckpt1")
    input1.addData(batch1); q1.processAllAvailable(); q1.stop()
    val before = StreamingAdmission.readVerdicts(spark, workDir)
      .collect().map(_.toSeq).toSet
    val sigBytesBefore = new java.io.File(s"$workDir/sigs_0")
      .listFiles().map(_.length()).sum

    // a FRESH checkpoint re-delivers the same rows as batch id 0 — the
    // kill-before-checkpoint replay path, simulated deterministically
    val input2 = MemoryStream[DocRow]
    val q2 = StreamingAdmission.admissionStream(
      input2.toDS(), sigsDir, shDir, workDir, s"$root/ckpt2")
    input2.addData(batch1); q2.processAllAvailable(); q2.stop()

    assert(StreamingAdmission.committedBatches(workDir) == Seq(0L))
    val after = StreamingAdmission.readVerdicts(spark, workDir)
      .collect().map(_.toSeq).toSet
    assert(after == before, "replay changed the verdicts")
    val sigBytesAfter = new java.io.File(s"$workDir/sigs_0")
      .listFiles().map(_.length()).sum
    assert(sigBytesAfter == sigBytesBefore, "replay rewrote the delta")
  }

  test("gated admission: quality/repetition gates run in front of the " +
      "probe — gated docs never admit, never extend the index, and " +
      "survivors' verdicts are identical to ungated admission of the " +
      "passing subset") {
    import spark.implicits._
    val root = "target/test-admission-gate"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val (sigsDir, shDir) = writeBaseline(root)
    val idxSigs = spark.read.parquet(sigsDir)
    val idxSh = spark.read.parquet(shDir)
    val batch = Seq(
      DocRow(301L, "!!x;; ??,, ::.."),           // fails length+punct
      DocRow(302L, ("the " * 60).trim),          // passes quality, repeats
      twin(303L, of = 3L, n = 35),               // passes gates, index dup
      DocRow(304L, text(304L, 40))               // passes gates, fresh
    ).toDF("doc_id", "text")

    val gated = StreamingAdmission.admitBatchGated(batch, idxSigs, idxSh)
    val v = gated.verdicts.collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(v(301L).getAs[String]("gate_reason") == "quality" &&
      !v(301L).getAs[Boolean]("admit"))
    assert(v(302L).getAs[String]("gate_reason") == "repetition" &&
      !v(302L).getAs[Boolean]("admit"))
    assert(v(303L).getAs[String]("gate_reason") == "none" &&
      !v(303L).getAs[Boolean]("admit") &&
      v(303L).getAs[Long]("corpus_match") == 3L)
    assert(v(304L).getAs[String]("gate_reason") == "none" &&
      v(304L).getAs[Boolean]("admit"))
    val deltaIds = gated.deltaSigs.select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(deltaIds == Set(304L), s"only the admitted doc extends: $deltaIds")

    val plain = StreamingAdmission.admitBatch(
      batch.filter(col("doc_id") >= 303L), idxSigs, idxSh)
    val survivors = gated.verdicts.filter(col("gate_reason") === "none")
      .drop("gate_reason").collect().map(_.toSeq).toSet
    val expect = plain.verdicts.collect().map(_.toSeq).toSet
    assert(survivors == expect,
      "gating must not change the surviving docs' verdicts")
    gated.release(); plain.release()
  }
}
