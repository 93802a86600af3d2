package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Asymmetric containment near-dup: the quote/excerpt case. The fixture
  * plants a 120-char prefix excerpt of every base doc at doc_id+200000,
  * so ground truth is known by construction — every planted excerpt is
  * contained in its base (up to the one shingle the character cut can
  * corrupt), while its Jaccard against the base is tiny (the law that
  * justifies the operator existing next to the Jaccard family).
  */
class ContainmentSpec extends SparkTestBase {

  private lazy val pairs =
    TrainingOps.containmentPairs(spark, sf()).cache()

  test("internal consistency: flag derives from cont_pm; cont_pm is a " +
      "per-mille of the smaller side; inter bounded by both sizes") {
    val bad = pairs.filter(
      (col("contained") =!= (col("cont_pm") >= TrainingOps.ContainedPerMille)) ||
        col("cont_pm") < 1 || col("cont_pm") > 1000 ||
        col("inter") > least(col("size_a"), col("size_b")) ||
        col("inter") < 1)
    assert(bad.isEmpty, s"inconsistent rows: ${bad.take(3).mkString(";")}")
  }

  test("planted excerpts are recovered: ≥95% of (base, base+200000) " +
      "pairs flagged contained, and every recovered one passes the bar") {
    val planted = pairs
      .filter(col("doc_b") === col("doc_a") + 200000 && col("doc_a") < 100000)
      .cache()
    val nBase = TrainingOps.docs(spark, sf()).count()
    val found = planted.count()
    // the only legitimate misses: an excerpt whose ~20 shingles are ALL
    // corpus-hot (df > ContainmentDfCap) never seeds a candidate — the
    // disclosed prefix-filter trade. On the fixture that is rare.
    assert(found >= (nBase * 95) / 100,
      s"only $found of $nBase planted excerpts recovered")
    val weak = planted.filter(!col("contained"))
    assert(weak.isEmpty,
      s"planted excerpt below the containment bar: ${weak.take(3).mkString(";")}")
    // the character cut corrupts at most the final shingle: inter must
    // miss the excerpt's distinct-shingle count by at most 1
    val gap = planted.filter(col("inter") < col("size_b") - 1)
    assert(gap.isEmpty,
      s"excerpt intersection lost more than the cut shingle: ${gap.take(3).mkString(";")}")
  }

  test("asymmetry law: containment catches pairs Jaccard misses — a " +
      "contained excerpt pair with Jaccard below half") {
    val jacPm = col("inter") * 1000 /
      (col("size_a") + col("size_b") - col("inter"))
    val quoteCase = pairs.filter(col("contained") && jacPm < 500)
    assert(!quoteCase.isEmpty,
      "no contained pair with small Jaccard — the operator adds nothing " +
        "over jaccardVerifiedPairs on this fixture")
  }

  test("plan gates: no cartesian product; the rare-shingle prefilter " +
      "join is present before any pair join") {
    val plan = castToImpl(pairs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "containment pair seeding must never cross-join")
  }

  test("plan gate: the intersection stage probes a SEMI-JOIN-PRUNED " +
      "shingle frame (r4 verdict #5) — broadcast left-semi against the " +
      "pair-participant ids, scan-side (no shuffle of sh for the prune)") {
    val plan = castToImpl(pairs).queryExecution.executedPlan.toString
    val semiLines = plan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty,
      "participant prune (left-semi) missing from the containment plan:\n" +
        plan.take(4000))
    // the prune must be broadcast (a shuffled semi-join would cost the
    // very exchange it exists to avoid)
    assert(semiLines.exists(_.contains("BroadcastHashJoin")),
      "participant semi-join is not broadcast:\n" + semiLines.mkString("\n"))
  }
}
