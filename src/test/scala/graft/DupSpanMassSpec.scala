package graft

import graft.operators.TrainingOps

/** Laws for the inter-document duplicate-span-mass signal
  * (TrainingOps.dupSpanMassFrom): doc-frequency semantics, the coverage
  * arithmetic, and the fixture-level guarantee that synthetic twins earn
  * nonzero duplicate mass.
  */
class DupSpanMassSpec extends SparkTestBase {

  private def run(rows: (Long, Long)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TrainingOps.dupSpanMassFrom(rows.toDF("doc_id", "shh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("a shingle is duplicate iff it occurs in more than one doc") {
    val m = run(
      1L -> 10L, 1L -> 11L, 1L -> 12L, // shares {11,12} with doc 2
      2L -> 11L, 2L -> 12L,            // fully covered by doc 1
      3L -> 99L)                       // unique everywhere
    assert(m(1L) == ((3L, 2L, 666L)))
    assert(m(2L) == ((2L, 2L, 1000L)))
    assert(m(3L) == ((1L, 0L, 0L)))
  }

  test("single-doc corpus: zero duplicate mass by definition") {
    val m = run(1L -> 10L, 1L -> 11L)
    assert(m(1L) == ((2L, 0L, 0L)))
  }

  test("sf fixture: twins earn duplicate mass, invariants hold per doc") {
    val out = TrainingOps.dupSpanMass(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, nd, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nd <= n, s"doc ${r.getLong(0)}: dup count exceeds total")
      assert(pm == nd * 1000 / n, "per-mille arithmetic")
    }
    // every corpus doc has a synthetic near-dup twin (doc_id + 100000,
    // a prefix mutation), so heavy duplicate coverage must exist — the
    // signal the operator exists to surface
    assert(out.count(_.getLong(3) >= 500) > out.length / 2,
      "twin-dominated corpus: most docs are mostly duplicated elsewhere")
  }
}
