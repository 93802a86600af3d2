package graft

import graft.operators.TrainingOps

/** Convergence and correctness of the connected-components step
  * (TrainingOps.dupClustersFromPairs): min-label propagation with pointer
  * doubling must label in O(log diameter) passes — the r2 fix for the
  * 53.8 s driver row and the ADVICE diameter-25 silent-wrong-result risk.
  */
class DupClustersSpec extends SparkTestBase {

  test("64-node path converges in O(log diameter) passes, labels = component min") {
    import spark.implicits._
    // path 0-1-2-…-63: diameter 63. Plain one-hop min propagation needs
    // ~63 passes (over the old 25-pass cap → silently wrong before r3);
    // the doubling form must land well under log2-ish bounds.
    val pairs = (0 until 63).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_a", "doc_b")
    val (labels, passes) = TrainingOps.dupClustersFromPairs(pairs)
    val rows = labels.collect()
    assert(rows.length === 64)
    assert(rows.forall(_.getLong(1) === 0L),
      "some node missed the component minimum")
    assert(rows.count(_.getBoolean(2)) === 1, "exactly one keeper expected")
    assert(passes <= 10,
      s"doubling should converge in ≤10 passes on diameter 63, took $passes")
  }

  test("two components keep distinct minima and keepers") {
    import spark.implicits._
    val pairs = Seq((1L, 5L), (5L, 3L), (10L, 12L), (12L, 11L), (11L, 10L))
      .toDF("doc_a", "doc_b")
    val (labels, _) = TrainingOps.dupClustersFromPairs(pairs)
    val byId = labels.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(Seq(1L, 3L, 5L).forall(byId(_)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(byId(_)._1 == 10L))
    assert(byId(1L)._2 && byId(10L)._2)
    assert(labels.filter("is_keeper").count() === 2L)
  }

  test("non-convergence is loud, not silently wrong (ADVICE r2)") {
    import spark.implicits._
    val pairs = (0 until 40).map(i => (i.toLong, i.toLong + 1))
      .toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException] {
      TrainingOps.dupClustersFromPairs(pairs, maxPasses = 2)
    }
  }
}
