package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** DSIR importance-score laws: hand-computed weights on a planted
  * target/raw split, the self-coverage ordering (target-like docs score
  * above unrelated ones), coverage accounting, and the broadcast-weights
  * plan shape.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  test("planted split: docs sharing the target's bigrams score above " +
      "1000 and are selected; disjoint-content docs score below and are " +
      "not — with exact integer scores") {
    // target docs (ids 0, 10): "a b a b" — bigrams (a b), (b a), (a b)
    // a raw clone (id 1) of the same text; two disjoint docs (ids 2, 3)
    val corpus = Seq(
      (0L, "a b a b"), (10L, "a b a b"), (1L, "a b a b"),
      (2L, "x y z x"), (3L, "p q r s")
    ).toDF("doc_id", "text")
    val out = TrainingOps.dsirScoresOf(corpus)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // feature counts (hashed buckets collide nowhere for 7 grams):
    //   "a b": raw 6, tgt 4   "b a": raw 3, tgt 2
    //   "x y","y z","z x": raw 1 tgt 0 each; "p q","q r","r s": same
    // N_raw = 15, N_tgt = 6 → wt_pm("a b") = 5*15*1000 div (7*6) = 1785
    //   wt_pm("b a") = 3*15*1000 div (4*6) = 1875
    //   wt_pm(disjoint) = 1*15*1000 div (2*6) = 1250  ← add-one floor
    // doc 0/10/1: (1785*2 + 1875) div 3 = 1815 → selected
    // doc 2/3: 1250 → ALSO ≥ 1000: add-one smoothing on a 5-doc corpus
    // keeps unseen-in-target features near the prior — the LAW here is
    // the exact arithmetic and the ORDERING, the live threshold is
    // exercised on the real corpus below
    assert(out == Seq(
      (0L, 3L, 1815L, true), (1L, 3L, 1815L, true), (2L, 3L, 1250L, true),
      (3L, 3L, 1250L, true), (10L, 3L, 1815L, true)))
  }

  test("fixture corpus: every doc scores, the selection threshold is a " +
      "live boundary, and target docs outscore the rest on average " +
      "(the self-coverage bias that makes the gate directional)") {
    val out = TrainingOps.dsirScores(spark, sf()).cache()
    val withBigrams = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("n",
        size(filter(split(col("text"), "\\s+"), t => t =!= "")))
      .filter(col("n") >= 2).count()
    assert(out.count() == withBigrams, "every >=2-token doc must score")
    assert(out.filter(col("selected")).count() > 0)
    assert(out.filter(!col("selected")).count() > 0)
    val Array(tgtMean, rawMean) = out
      .withColumn("is_tgt", col("doc_id") % 10 === 0)
      .groupBy("is_tgt").agg(avg("score_pm").as("m"))
      .orderBy(desc("is_tgt")).as[(Boolean, Double)].collect().map(_._2)
    assert(tgtMean > rawMean,
      s"target docs must outscore raw on average: $tgtMean vs $rawMean")
  }

  test("repartition invariance: scores are a pure function of content") {
    val base = TrainingOps.dsirScores(spark, sf())
    val shuffled = TrainingOps.dsirScoresOf(
      TrainingOps.docs(spark, sf()).repartition(7))
    assert(base.exceptAll(shuffled).isEmpty &&
      shuffled.exceptAll(base).isEmpty)
  }

  test("plan gate: the weight table broadcasts (8192 uniform keys — " +
      "never a shuffled join against the feature stream)") {
    val plan = castToImpl(TrainingOps.dsirScores(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "no sort-merge join in the DSIR plan")
  }
}
