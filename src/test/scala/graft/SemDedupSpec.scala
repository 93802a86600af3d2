package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** SemDeDup: cluster-scoped semantic dedup. Ground truth is planted — a
  * dim-0-nudged twin of every base vector at vec_id+100000 — so the laws
  * are earned, not asserted: twins that land in their base's cluster must
  * be dropped, verdicts must be internally consistent, and the plan must
  * confine the quadratic (no window, no cartesian).
  */
class SemDedupSpec extends SparkTestBase {

  private lazy val verdicts = TrainingOps.semDedup(spark, sf()).cache()

  test("verdict consistency: kept ⇔ dropped_by = -1; a dropper has a " +
      "smaller id and sits in the same cluster") {
    val bad = verdicts.filter(
      (col("kept") =!= (col("dropped_by") === -1L)) ||
        (col("dropped_by") =!= -1L && col("dropped_by") >= col("vec_id")))
    assert(bad.isEmpty, s"inconsistent: ${bad.take(3).mkString(";")}")
    val cl = verdicts.select(col("vec_id").as("dropped_by"),
      col("centroid_id").as("dropper_cluster"))
    val cross = verdicts.filter(col("dropped_by") =!= -1L)
      .join(cl, Seq("dropped_by"))
      .filter(col("dropper_cluster") =!= col("centroid_id"))
    assert(cross.isEmpty,
      s"dropper outside the cluster: ${cross.take(3).mkString(";")}")
  }

  test("accounting: one verdict per corpus vector; cluster_size sums " +
      "back to the corpus count") {
    val n = verdicts.count()
    val nBase = TrainingOps.embeddings(spark, sf())
      .filter(col("vec_id") >= TrainingOps.NQueryVecs).count()
    assert(n == 2 * nBase, s"verdict rows $n != corpus ${2 * nBase}")
    assert(verdicts.select("vec_id").distinct().count() == n)
    val sizeSum = verdicts.select(col("centroid_id"), col("cluster_size"))
      .distinct().agg(sum("cluster_size")).head().getLong(0)
    assert(sizeSum == n, s"cluster sizes sum $sizeSum != $n")
  }

  test("planted-twin law: every twin assigned to its base's cluster is " +
      "dropped (by the base or an even earlier dup), and most twins " +
      "do land there") {
    val bases = verdicts.filter(col("vec_id") < 100000)
      .select(col("vec_id").as("base_id"),
        col("centroid_id").as("base_cluster"))
    val twins = verdicts.filter(col("vec_id") >= 100000)
      .withColumn("base_id", col("vec_id") - 100000)
      .join(bases, Seq("base_id"))
    val sameCluster = twins.filter(col("centroid_id") === col("base_cluster"))
      .cache()
    val nTwins = twins.count()
    val nSame = sameCluster.count()
    // the nudge is 100 quant units on one dim — tiny next to inter-
    // centroid distances, so assignment should almost always agree
    assert(nSame * 10 >= nTwins * 9,
      s"only $nSame of $nTwins twins share their base's cluster")
    val surviving = sameCluster.filter(col("kept") ||
      col("dropped_by") > col("base_id"))
    assert(surviving.isEmpty,
      s"same-cluster twin not dropped by base or earlier: " +
        s"${surviving.take(3).mkString(";")}")
  }

  test("repartition invariance: the verdict set is a pure function of " +
      "the corpus") {
    val again = TrainingOps.semDedup(spark, sf())
      .repartition(7)
      .collect().map(_.toSeq).toSet
    assert(again == verdicts.collect().map(_.toSeq).toSet)
  }

  test("plan gates: no window anywhere (assignment is the argmin " +
      "aggregate), no cartesian, no sort-merge join on the pair join") {
    val plan = castToImpl(TrainingOps.semDedup(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "SemDeDup must not rank with windows — the argmin is an aggregate")
    assert(!plan.contains("CartesianProduct"),
      "the pairwise compare must stay confined to clusters")
    assert(!plan.contains("SortMergeJoin"),
      "cluster-key joins should be hash joins (cluster rows are the " +
        "unit of work)")
  }
}
