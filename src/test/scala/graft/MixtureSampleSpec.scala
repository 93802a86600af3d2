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
}
