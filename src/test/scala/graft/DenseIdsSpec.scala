package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Dense ID / shard assignment: the histogram-cumulative rank must equal
  * the global-window truth without ever planning the global sort.
  */
class DenseIdsSpec extends SparkTestBase {

  private def truth(ids: Seq[Long]): Map[Long, Long] =
    ids.sorted.zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap

  test("equivalence: dense_id matches row_number()-1 by doc_id order on " +
      "the sf corpus, and ids are contiguous 0..n-1") {
    val got = TrainingOps.denseIds(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = truth(got.map(_._1))
    got.foreach { case (id, d) =>
      assert(d == expect(id), s"doc $id: got $d want ${expect(id)}") }
    assert(got.map(_._2).sorted == (0L until got.size).toSeq)
  }

  test("shard arithmetic: shard = dense_id div S, pos = dense_id mod S, " +
      "every shard except the last exactly full") {
    val s = TrainingOps.DenseShardSize
    val rows = TrainingOps.denseIds(spark, sf())
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (d, sh, pos) =>
      assert(sh == d / s && pos == d % s, s"($d,$sh,$pos)") }
    val bySh = rows.groupBy(_._2).map { case (k, v) => k -> v.size }
    val maxSh = bySh.keys.max
    bySh.foreach { case (sh, n) =>
      if (sh < maxSh) assert(n == s, s"shard $sh has $n rows") }
  }

  test("repartition invariance + sparse/negative ids: bucket shift is an " +
      "ARITHMETIC shift, so ordering holds across negative ids and " +
      "bucket gaps") {
    import spark.implicits._
    val ids = Seq(-1000L, -129L, -128L, -1L, 0L, 1L, 63L, 64L, 65L,
      5000L, 1000000L)
    val df = ids.toDF("doc_id")
    val a = TrainingOps.denseIdsFrom(df, 6, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = TrainingOps.denseIdsFrom(df.repartition(7), 6, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    assert(a == truth(ids))
  }

  test("plan: histogram-cumulative shape — map-side-combined bucket " +
      "counts, offsets broadcast back, NEVER a global sort of the " +
      "corpus (no rangepartitioning)") {
    val df = TrainingOps.denseIds(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), "no map-side combine:\n" + p)
    assert(!p.toLowerCase.contains("rangepartitioning"),
      "global sort would defeat the histogram shape:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "offsets must broadcast back onto the corpus:\n" + p)
    // the only SinglePartition exchange feeds the bucket aggregate,
    // not the corpus scan: it must sit above a partial_count aggregate
    val single = p.linesIterator.zipWithIndex
      .filter(_._1.contains("SinglePartition")).map(_._2).toSeq
    assert(single.nonEmpty, "expected the bucket-table window:\n" + p)
  }
}
