package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Winnowing fingerprint selection (Schleimer et al. 2003): coverage and
  * density laws, the match-length guarantee, and pair recovery.
  */
class WinnowSpec extends SparkTestBase {

  private val W = TrainingOps.WinnowWindow

  private def fps(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    TrainingOps.winnowFingerprintsFrom(
      docs.toDF("doc_id", "text"), W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def uniqueText(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("coverage law: every window selects exactly one fingerprint — " +
      "sum(n_windows) per doc = max(shingles - W + 1, 1)") {
    val rows = TrainingOps.winnowFingerprints(spark, sf())
      .groupBy("doc_id").agg(sum("n_windows").as("tot"))
      .join(TrainingOps.docs(spark, sf()), Seq("doc_id"))
      .withColumn("m",
        greatest(size(filter(split(col("text"), "\\s+"),
          x => x =!= "")) - 2, lit(0)))
      .filter(col("m") >= 1)
      .select(col("doc_id"), col("tot"),
        greatest(col("m") - W + 1, lit(1)).as("want"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == r.getInt(2).toLong,
      s"doc ${r.getLong(0)}: ${r.getLong(1)} != ${r.get(2)}"))
  }

  test("density bound on all-distinct shingles: a value is the minimum " +
      "of at most W windows, so distinct fps >= ceil(windows / W)") {
    val n = 100 // tokens, all distinct → 98 distinct shingles, 95 windows
    val got = fps(Seq((1L, uniqueText("tok", n))))
    val windows = (n - 2) - W + 1
    assert(got.map(_._3).sum == windows)
    got.foreach { case (_, _, c) => assert(c <= W, s"fp spans $c > $W") }
    assert(got.size >= math.ceil(windows.toDouble / W).toInt)
  }

  test("match-length guarantee: docs sharing >= W+2 consecutive tokens " +
      "share at least one fingerprint") {
    val shared = uniqueText("sh", W + 2) // W+2 tokens → W shared shingles
    val a = uniqueText("aa", 30) + " " + shared + " " + uniqueText("ab", 30)
    val b = uniqueText("ba", 25) + " " + shared + " " + uniqueText("bb", 35)
    val got = fps(Seq((1L, a), (2L, b)))
    val fa = got.filter(_._1 == 1L).map(_._2).toSet
    val fb = got.filter(_._1 == 2L).map(_._2).toSet
    assert(fa.intersect(fb).nonEmpty,
      s"guarantee violated: no shared fingerprint")
  }

  test("degenerate docs: fewer shingles than the window emit the single " +
      "whole-doc minimum; under 3 tokens emit nothing") {
    val got = fps(Seq((1L, "x1 x2 x3 x4"), (2L, "y1 y2")))
    assert(got.filter(_._1 == 1L).map(_._3).sum == 1L)
    assert(!got.exists(_._1 == 2L))
  }

  test("pairs: planted overlap recovered (n_shared >= 2), disjoint docs " +
      "absent, a < b") {
    val rows = TrainingOps.winnowedPairs(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "sf corpus plants near-dups; pairs expected")
    rows.foreach { case (a, b, n) =>
      assert(a < b && n >= TrainingOps.WinnowMinShared) }
  }

  test("plan: one doc_id exchange feeds both the sliding-min windows and " +
      "the (doc, fp) count (subset-key reuse); no join; pairs never plan " +
      "a cartesian") {
    val qe = TrainingOps.winnowFingerprints(spark, sf()).queryExecution
    val p1 = qe.executedPlan.toString
    assert(!p1.contains("Join"), p1)
    assert(p1.contains("hashpartitioning(doc_id"),
      "sliding min must partition by doc:\n" + p1)
    val exchanges = p1.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1,
      s"the (doc_id, fp) aggregate must reuse the doc_id exchange, " +
        s"found $exchanges:\n" + p1)
    val p2 = TrainingOps.winnowedPairs(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Cartesian") && !p2.contains("NestedLoop"), p2)
  }
}
