package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.TrainingOps

/** Laws of the vocabulary top-k (TrainingOps.vocabTopKFrom) and the token
  * frequency spectrum: hand counts, the two-stage-rank ≡ global-window
  * equivalence (the same law every ANN ranking carries), tie determinism,
  * and the spectrum's mass-conservation identity.
  */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  test("hand case: counts, rank order and the (tf desc, token asc) " +
      "tie-break") {
    val corpus = Seq(
      ("en", "b a b c b a"),
      ("en", "a c"),
      ("zh", "x")
    ).toDF("lang", "text")
    val out = TrainingOps.vocabTopKFrom(corpus, k = 2)
      .orderBy("lang", "vocab_rank")
      .as[(String, String, Long, Long)].collect().toSeq
    // en: a=3, b=3 (tie → token asc), c=2 cut by k=2; zh: x=1
    assert(out == Seq(
      ("en", "a", 3L, 1L),
      ("en", "b", 3L, 2L),
      ("zh", "x", 1L, 1L)))
  }

  test("two-stage rank ≡ one global window per language on the fixture " +
      "corpus") {
    val twoStage = TrainingOps.vocabTopK(spark, sf())
    val tf = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("lang"),
        explode(filter(split(col("text"), "\\s+"), t => t =!= ""))
          .as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("tf"))
    val global = tf.withColumn("vocab_rank", row_number().over(
        Window.partitionBy("lang").orderBy(desc("tf"), asc("token")))
        .cast("long"))
      .filter(col("vocab_rank") <= TrainingOps.VocabTopK)
      .select("lang", "token", "tf", "vocab_rank")
    assert(twoStage.exceptAll(global).isEmpty &&
      global.exceptAll(twoStage).isEmpty)
  }

  test("spectrum conserves token mass: per language, sum(tf × n_types) " +
      "equals the raw token count, and sum(n_types) the distinct count") {
    val spec = TrainingOps.tokenFrequencySpectrum(spark, sf()).cache()
    try {
      val fromSpectrum = spec.groupBy("lang")
        .agg(sum(col("tf") * col("n_types")).as("mass"),
          sum("n_types").as("types"))
        .as[(String, Long, Long)].collect()
        .map { case (l, m, t) => l -> ((m, t)) }.toMap
      val raw = spark.read.parquet(s"${sf()}/documents.parquet")
        .select(col("lang"),
          explode(filter(split(col("text"), "\\s+"), t => t =!= ""))
            .as("token"))
      val truth = raw.groupBy("lang")
        .agg(count(lit(1)).as("mass"), countDistinct("token").as("types"))
        .as[(String, Long, Long)].collect()
        .map { case (l, m, t) => l -> ((m, t)) }.toMap
      assert(fromSpectrum == truth)
    } finally { spec.unpersist(); () }
  }
}
