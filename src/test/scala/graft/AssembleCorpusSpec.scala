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
}
