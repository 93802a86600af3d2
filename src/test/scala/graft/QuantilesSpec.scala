package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Laws of the histogram-cumulative exact quantiles
  * (TrainingOps.docLengthQuantiles): the quantile_disc definition by hand,
  * and equivalence with the sorted-array truth on the fixture corpus.
  */
class QuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("hand definition: q(p) is the smallest value whose cumulative " +
      "count reaches ceil(p·n/100)") {
    // lengths 1..10 (n=10): p50 → rank 5 → value 5; p90 → 9; p99 → ceil(9.9)=10
    val out = TrainingOps.docLengthQuantiles(spark, sf())
    // verify on synthetic rows through the same algebra DuckDB sees:
    val freq = Seq.tabulate(10)(i => ("xx", (i + 1).toLong))
      .toDF("lang", "n_chars")
      .groupBy("lang", "n_chars").agg(count(lit(1)).as("c"))
    val cum = freq.withColumn("cum", sum("c").over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("n_chars")))
    val q = cum.withColumn("p",
        explode(array(lit(50L), lit(90L), lit(99L))))
      .filter(col("cum") * 100 >= col("p") * 10)
      .groupBy("p").agg(min("n_chars").as("q"))
      .as[(Long, Long)].collect().toMap
    assert(q == Map(50L -> 5L, 90L -> 9L, 99L -> 10L))
    assert(out.columns.toSeq ==
      Seq("lang", "p", "q_len", "n_docs"))
  }

  test("fixture equivalence: every reported quantile matches the " +
      "sorted-array truth per language") {
    val got = TrainingOps.docLengthQuantiles(spark, sf())
      .as[(String, Long, Long, Long)].collect()
      .map { case (l, p, q, n) => (l, p) -> ((q, n)) }.toMap
    val byLang = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) => l -> rows.map(_._2).sorted }
    assert(got.nonEmpty && byLang.nonEmpty)
    for ((lang, sortedLens) <- byLang; p <- TrainingOps.QuantilePoints) {
      val n = sortedLens.length
      val rank = math.ceil(p * n / 100.0).toInt // 1-based
      val truth = sortedLens(rank - 1)
      assert(got((lang, p.toLong)) == ((truth, n.toLong)),
        s"lang=$lang p=$p: got ${got((lang, p.toLong))}, truth ($truth, $n)")
    }
  }
}
