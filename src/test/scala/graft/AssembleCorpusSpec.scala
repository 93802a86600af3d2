package graft

import graft.operators.TrainingOps

/** Integration laws for the composed training-corpus assembly
  * (TrainingOps.assembleCorpus): the kept flag is exactly the stage
  * conjunction, drop_reason attributes the FIRST failing stage in
  * pipeline order, and the accounting covers every doc exactly once.
  */
class AssembleCorpusSpec extends SparkTestBase {

  private lazy val rows =
    TrainingOps.assembleCorpus(spark, sf("sf0.001")).collect()

  private def b(r: org.apache.spark.sql.Row, name: String): Boolean =
    r.getAs[Boolean](name)

  test("kept is exactly the conjunction of the five stages + non-benchmark") {
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      b(r, "kept") == (!b(r, "is_benchmark") && b(r, "pass_quality") &&
        b(r, "pass_repetition") && b(r, "pass_decontaminate") &&
        b(r, "pass_dedup") && b(r, "pass_sample"))
    })
  }

  test("drop_reason is the first failing stage in pipeline order") {
    assert(rows.forall { r =>
      val expected =
        if (b(r, "is_benchmark")) "benchmark"
        else if (!b(r, "pass_quality")) "quality"
        else if (!b(r, "pass_repetition")) "repetition"
        else if (!b(r, "pass_decontaminate")) "contaminated"
        else if (!b(r, "pass_dedup")) "duplicate"
        else if (!b(r, "pass_sample")) "sampled_out"
        else "kept"
      r.getAs[String]("drop_reason") == expected
    })
  }

  test("accounting: one row per doc, survivors exist, benchmark slice exact") {
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "one verdict per doc")
    assert(rows.exists(_.getAs[String]("drop_reason") == "kept"))
    assert(rows.filter(b(_, "is_benchmark")).map(_.getAs[Long]("doc_id"))
      .forall(_ % 97 == 0))
  }

  test("source feedback: per-source rollup matches a direct recompute of " +
      "the verdicts, counts conserve, smoothing stays in (0, 1000]") {
    import org.apache.spark.sql.functions._
    val fb = TrainingOps.sourceQualityFeedback(spark, sf())
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val truth = TrainingOps.assembleCorpus(spark, sf())
      .join(TrainingOps.docs(spark, sf()).select("doc_id", "source"),
        Seq("doc_id"))
      .collect()
      .groupBy(_.getAs[String]("source"))
    assert(fb.keySet == truth.keySet)
    truth.foreach { case (src, docs) =>
      val r = fb(src)
      val kept = docs.count(_.getAs[Boolean]("kept")).toLong
      val n = docs.length.toLong
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_kept") == kept)
      assert(r.getAs[Long]("n_drop_quality") ==
        docs.count(_.getAs[String]("drop_reason") == "quality"))
      assert(r.getAs[Long]("n_drop_duplicate") ==
        docs.count(_.getAs[String]("drop_reason") == "duplicate"))
      val sm = r.getAs[Long]("keep_permille_smoothed")
      assert(sm == (kept + 1) * 1000 / (n + 2))
      assert(sm > 0 && sm <= 1000)
      // drops never exceed what wasn't kept
      val drops = Seq("n_drop_quality", "n_drop_repetition",
        "n_drop_contaminated", "n_drop_duplicate")
        .map(r.getAs[Long](_)).sum
      assert(kept + drops <= n)
    }
  }
}
