package graft

import graft.operators.TrainingOps

/** The pair-table assembly (q_pair_assemble): decode → dims → joint-dedup
  * composed over the image+caption corpus, with real decode earning the
  * decode verdict and the joint-dup policy earning the dedup one.
  */
class PairAssembleSpec extends SparkTestBase {

  private lazy val rows = TrainingOps.assemblePairs(spark, 300L).collect()
  private def f(r: org.apache.spark.sql.Row, name: String) =
    r.getBoolean(r.fieldIndex(name))

  test("one verdict per corpus row (base + re-encoded twin each)") {
    assert(rows.length === 600)
    assert(rows.map(_.getString(0)).distinct.length === 600)
  }

  test("decode passes everywhere via REAL decode matching declared dims") {
    // every fixture image decodes to its declared (w, h); the Spark side
    // earns this through ImageOps.decode, the oracle states it analytically
    assert(rows.forall(f(_, "pass_decode")))
  }

  test("joint-dedup stage: every re-encoded twin is dropped as a " +
      "duplicate of its base; every base survives dedup") {
    val (twins, bases) = rows.partition(_.getString(0).endsWith("_d"))
    assert(twins.length === 300 && bases.length === 300)
    assert(twins.forall(r => !f(r, "pass_dedup")),
      "a twin escaped the joint-dup policy (Hamming 1 + equal caption " +
        "must always pair with its base)")
    assert(bases.forall(r => f(r, "pass_dedup")),
      "a base image was dropped as duplicate — captions are unique, so " +
        "no base pair can be a JOINT dup")
  }

  test("dims gate is exercised both ways and kept/drop_reason follow " +
      "first-failure attribution") {
    val dimPass = rows.count(f(_, "pass_dims"))
    assert(dimPass > 0 && dimPass < rows.length,
      s"dims gate not exercised: $dimPass/${rows.length} pass")
    rows.foreach { r =>
      val kept = f(r, "kept")
      val expect = f(r, "pass_decode") && f(r, "pass_dims") && f(r, "pass_dedup")
      assert(kept === expect, s"kept conjunction law broken: $r")
      val reason = r.getString(r.fieldIndex("drop_reason"))
      val expected =
        if (!f(r, "pass_decode")) "decode"
        else if (!f(r, "pass_dims")) "dims"
        else if (!f(r, "pass_dedup")) "duplicate"
        else "kept"
      assert(reason === expected, s"drop_reason first-failure law: $r")
    }
  }
}
