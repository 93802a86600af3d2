package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Hashed-bag linear quality classifier: sign threshold on a separable
  * planted corpus, score-ordering law on the homogeneous sf fixture, and
  * the broadcast-model plan shape.
  */
class QualityClassifierSpec extends SparkTestBase {

  // positives: long, stopword-rich, lightly punctuated (heuristic = 3);
  // negatives: short punctuation salad with DISJOINT vocabulary
  // (heuristic = 0-1) — vocabulary separability is what makes the sign
  // threshold meaningful
  private def posText(i: Int): String =
    s"the quick brown fox and the lazy dog of station $i walk to " +
      "the market in the morning and the evening, noting the " +
      "weather is mild and the road is long and the journey is calm."
  private def negText(i: Int): String =
    s"zzq$i!!! @@## %% ^^&& **(( ))!! ??;; ::.. ,,,, xx$i yy$i"

  private lazy val planted = {
    import spark.implicits._
    // ids cover both held-in (multiples of 10) and held-out docs of
    // each class
    val rows =
      (0 until 100 by 10).map(i => (i.toLong, posText(i))) ++
      (5 until 100 by 10).map(i => (i.toLong, posText(i))) ++
      (100 until 200 by 10).map(i => (i.toLong, negText(i))) ++
      (105 until 200 by 10).map(i => (i.toLong, negText(i)))
    rows.toDF("doc_id", "text")
  }

  test("separable planted corpus: held-OUT positives predict true, " +
      "held-out negatives predict false — the model generalizes off the " +
      "training slice") {
    val got = TrainingOps.qualityClassifierFrom(planted)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3))).toSeq
    val heldOut = got.filter(!_._4)
    assert(heldOut.nonEmpty)
    heldOut.foreach { case (id, score, pred, _) =>
      if (id < 100) assert(pred && score > 0, s"pos doc $id: $score")
      else assert(!pred && score < 0, s"neg doc $id: $score")
    }
  }

  test("sf corpus: the score ORDERS the classes even where the sign " +
      "threshold degenerates (vocabulary-homogeneous fixture — " +
      "disclosed in the scaladoc)") {
    val truth = TrainingOps.qualityScores(spark, sf())
      .select(col("doc_id"), (col("quality_score") >= 2).as("t"))
    val byClass = TrainingOps.docQualityClassifier(spark, sf())
      .join(truth, Seq("doc_id"))
      .groupBy("t").agg(avg(col("score")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byClass(true) > 2 * byClass(false),
      s"score must separate classes: $byClass")
  }

  test("empty docs keep a zero-score row; output covers every doc " +
      "exactly once") {
    import spark.implicits._
    val corpus = planted.unionByName(
      Seq((900L, ""), (901L, "   ")).toDF("doc_id", "text"))
    val got = TrainingOps.qualityClassifierFrom(corpus).collect()
    assert(got.length == corpus.count())
    val empty = got.filter(r => r.getLong(0) >= 900L)
    assert(empty.length == 2 &&
      empty.forall(r => r.getLong(1) == 0L && !r.getBoolean(2)))
  }

  test("plan: the 4096-bucket weight table broadcasts into scoring; " +
      "no cartesian beyond the 1-row class-size aggregate; tf combines " +
      "map-side") {
    val p = TrainingOps.docQualityClassifier(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "weights must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), "tf must combine map-side:\n" + p)
  }
}
