package graft

import graft.operators.TrainingOps
import org.apache.spark.sql.functions._

/** Laws for deterministic mixture sampling (TrainingOps.mixtureSample):
  * the rate table, the membership rule, determinism across partitionings,
  * and the observed rate tracking the dial.
  */
class MixtureSampleSpec extends SparkTestBase {

  test("membership is bucket < rate and rates follow the lang table") {
    val out = TrainingOps.mixtureSample(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val rate = r.getAs[String]("lang") match {
        case "en" => 300L; case "zh" => 1000L; case _ => 600L
      }
      r.getAs[Long]("rate_permille") == rate &&
        r.getAs[Boolean]("sampled") ==
          (r.getAs[Long]("bucket") < rate)
    })
    assert(out.forall(r => (0L until 1000L).contains(r.getAs[Long]("bucket"))))
  }

  test("identical subset under a different partitioning (determinism)") {
    val a = TrainingOps.mixtureSample(spark, sf("sf0.001"))
      .filter(col("sampled")).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TrainingOps.mixtureSample(spark, sf("sf0.001"))
      .repartition(7).filter(col("sampled"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("observed keep-rate tracks the dial (binomial tolerance)") {
    val byLang = TrainingOps.mixtureSample(spark, sf("sf0.01"))
      .groupBy("lang").agg(
        sum(when(col("sampled"), 1L).otherwise(0L)).as("kept"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((lang, kept, n) <- byLang) {
      val rate = lang match {
        case "en" => 0.3; case "zh" => 1.0; case _ => 0.6
      }
      val tol = 4 * math.sqrt(rate * (1 - rate) / n) + 1e-9
      assert(math.abs(kept.toDouble / n - rate) <= tol,
        s"$lang kept $kept/$n, expected ~$rate ± $tol")
    }
  }

  // --------------------------------------- temperature-flattened rates ---

  test("temperature rates: sum to exactly 1000, isqrt weights exact " +
      "(w^2 <= mass < (w+1)^2)") {
    val rows = TrainingOps.temperatureMixtureRates(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._4).sum == 1000L, rows.mkString(","))
    rows.foreach { case (lang, mass, w, _) =>
      assert(w * w <= mass && mass < (w + 1) * (w + 1),
        s"$lang: isqrt($mass) != $w")
    }
  }

  test("temperature rates: T=2 flattening — a 4x mass advantage becomes " +
      "a ~2x rate advantage (within Hamilton's ±1 rounding)") {
    import spark.implicits._
    val corpus = (
      (1 to 40).map(i => (i.toLong, "big", 10000L)) ++
      (1 to 10).map(i => (100L + i, "small", 10000L))).toDF(
        "doc_id", "lang", "n_chars")
    val got = TrainingOps.temperatureMixtureRatesFrom(corpus)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // masses 400k vs 100k → weights 632 vs 316 → rates ~667 vs ~333
    val ratio = got("big").toDouble / got("small")
    assert(math.abs(ratio - 2.0) < 0.02,
      s"flattened ratio $ratio should be ~2, rates $got")
    assert(got.values.sum == 1000L)
  }

  test("composed temperature sample: verdicts equal the fixed sampler's " +
      "law under the computed table, rates consistent per language") {
    val rows = TrainingOps.temperatureMixtureSample(spark, sf())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, b, rate, s) =>
      assert(s == (b < rate)) }
    // every doc of a language sees the same computed rate
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.map(_._4).distinct.size == 1, s"$lang rates differ") }
    // and the rates are exactly the rate-table's
    val table = TrainingOps.temperatureMixtureRates(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.head._4 == table(lang), s"$lang rate mismatch") }
  }

  test("stratified k-sample: exactly min(k, n) per language, ranks " +
      "contiguous, and the two-stage rank equals the global hash-order " +
      "truth") {
    val k = TrainingOps.StratumSampleK
    val got = TrainingOps.stratifiedKSample(spark, sf())
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    val byLangN = TrainingOps.docs(spark, sf())
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, byLangN(lang)))
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length))
    }
    // truth: global sort by (sample_key, doc_id) within each language
    val all = TrainingOps.docs(spark, sf())
      .select(col("doc_id"), col("lang"),
        TrainingOps.hash60(concat(lit("ksample:"), col("doc_id")))
          .as("h"))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(0)))
    val truth = all.groupBy(_._1).view.mapValues(
      _.sortBy(x => (x._2, x._3)).take(k).map(_._3).toSeq).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.sortBy(_._4).map(_._2).toSeq == truth(lang),
        s"$lang sample differs from global-order truth") }
  }
}
