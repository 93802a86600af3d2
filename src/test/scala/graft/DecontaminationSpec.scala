package graft

import graft.operators.TrainingOps

/** Laws for the n-gram decontamination filter
  * (TrainingOps.decontaminateFrom): benchmark membership, hit counting,
  * and the output contract (training docs only, hit-count = DISTINCT
  * shared shingles).
  */
class DecontaminationSpec extends SparkTestBase {

  private def run(rows: (Long, Long)*): Map[Long, (Long, Long, Boolean)] = {
    import spark.implicits._
    TrainingOps.decontaminateFrom(rows.toDF("doc_id", "shh"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
  }

  test("overlap with a benchmark doc flags; disjoint docs stay clean") {
    // doc 0 and doc 97 are benchmark (id % 97 == 0); 1, 2, 3 are training
    val m = run(
      0L -> 10L, 0L -> 11L,          // benchmark shingles {10, 11}
      97L -> 12L,                    // benchmark shingles {12}
      1L -> 11L, 1L -> 20L,          // hits {11} -> contaminated
      2L -> 30L, 2L -> 31L,          // no hits
      3L -> 10L, 3L -> 12L, 3L -> 40L) // hits from BOTH benchmark docs
    assert(m.keySet == Set(1L, 2L, 3L), "benchmark docs excluded from output")
    assert(m(1L) == ((2L, 1L, true)))
    assert(m(2L) == ((2L, 0L, false)))
    assert(m(3L) == ((3L, 2L, true)))
  }

  test("empty benchmark slice: nothing is contaminated") {
    val m = run(1L -> 10L, 2L -> 10L, 3L -> 11L)
    assert(m.values.forall(!_._3))
    assert(m(1L)._1 == 1L)
  }

  test("sf fixture: contaminated set is nonempty, benchmark docs absent, " +
    "hit counts bounded by shingle counts") {
    val out = TrainingOps.decontaminate(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) % 97 != 0), "no benchmark doc leaks")
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)),
      "hits cannot exceed the doc's shingle count")
    assert(out.forall(r => (r.getLong(2) > 0) == r.getBoolean(3)))
  }
}
