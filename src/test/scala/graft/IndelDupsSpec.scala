package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.CleanOps

/** PassJoin shifted-segment laws: every planted indel twin is recovered
  * with its exact distance, the aligned (substitution-only) blocking
  * provably misses some of them on the same corpus — the reach the
  * extension exists to add — and the probe lattice never cross-joins.
  */
class IndelDupsSpec extends SparkTestBase {

  private lazy val out = CleanOps.editNearDupsIndel(spark, sf()).cache()
  private lazy val nBase =
    spark.read.parquet(s"${sf()}/documents.parquet").count()

  test("every delete+insert twin (shifted middle, the aligned blind " +
      "spot) is recovered at lev <= 2 and flagged") {
    val twinsA = out.filter(
      col("id_b") === col("id_a") + CleanOps.IndelTwinOffsetA &&
        col("id_a") < CleanOps.EditTwinOffset)
    assert(twinsA.count() == nBase,
      s"expected $nBase A-twin pairs, got ${twinsA.count()}")
    assert(twinsA.filter(!col("is_dup") || col("lev") > 2).isEmpty)
  }

  test("every single-insert twin (length +1) is recovered at exactly " +
      "lev = 1") {
    val twinsB = out.filter(
      col("id_b") === col("id_a") + CleanOps.IndelTwinOffsetB &&
        col("id_a") < CleanOps.EditTwinOffset)
    assert(twinsB.count() == nBase)
    assert(twinsB.filter(col("lev") =!= 1).isEmpty)
  }

  test("added reach is real: the aligned substitution-only blocking " +
      "misses planted indel twins the shifted probes recover") {
    val aligned = CleanOps.editNearDupsFrom(
      CleanOps.indelTwinCorpus(spark, sf()))
      .select("id_a", "id_b")
    val planted = out.filter(col("is_dup") &&
      col("id_a") < CleanOps.EditTwinOffset &&
      (col("id_b") === col("id_a") + CleanOps.IndelTwinOffsetA ||
        col("id_b") === col("id_a") + CleanOps.IndelTwinOffsetB))
      .select("id_a", "id_b")
    val missed = planted.join(aligned, Seq("id_a", "id_b"), "left_anti")
    assert(missed.count() > 0,
      "aligned blocking recovered every indel twin — the extension " +
        "demonstrates nothing on this fixture")
  }

  test("verification is exact and symmetric-free: is_dup derives from " +
      "lev; no self pairs; ids ordered") {
    val bad = out.filter(
      (col("is_dup") =!= (col("lev") <= CleanOps.EditMaxK)) ||
        col("id_a") >= col("id_b"))
    assert(bad.isEmpty)
  }

  test("plan gate: probe-segment join is a hash join on the three-part " +
      "key — no cartesian product") {
    val plan = castToImpl(CleanOps.editNearDupsIndel(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
