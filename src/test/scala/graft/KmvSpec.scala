package graft

import org.apache.spark.sql.functions._

import graft.functions.{KmvAggregator, KmvSketch}
import graft.operators.CrawlOps

/** Laws of the KMV bottom-k distinct-count sketch: exactness below k,
  * duplicate-insensitivity, merge ≡ single-pass, and estimator accuracy
  * within the theoretical band on a real hash stream.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  private def mix(i: Long): Long = {
    // splitmix64 finalizer, masked to the positive 60-bit hash space
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & ((1L << 60) - 1)
  }

  test("below k the sketch IS the distinct set and the estimate is exact") {
    val s = new KmvSketch(64)
    val vals = (1 to 40).map(i => mix(i.toLong))
    (vals ++ vals).foreach(s.add) // every value twice
    assert(s.values.toSeq == vals.sorted)
    assert(s.estimate == 40L)
  }

  test("merge of split streams equals the single-pass sketch") {
    val whole = new KmvSketch(32)
    val a = new KmvSketch(32)
    val b = new KmvSketch(32)
    val vals = (1 to 5000).map(i => mix(i.toLong))
    vals.foreach(whole.add)
    vals.zipWithIndex.foreach { case (v, i) =>
      (if (i % 2 == 0) a else b).add(v)
    }
    // overlap too: idempotence under re-merge of shared mass
    vals.take(100).foreach(b.add)
    assert(a.mergeInPlace(b).values.toSeq == whole.values.toSeq)
  }

  test("aggregator over partitions equals the sequential sketch") {
    val vals = (1 to 20000).map(i => mix(i.toLong))
    val seqSketch = new KmvSketch(256)
    vals.foreach(seqSketch.add)
    val agg = udaf(new KmvAggregator(256))
    val got = vals.toDF("h").repartition(16)
      .agg(agg(col("h"))).as[Seq[Long]].head()
    assert(got == seqSketch.values.toSeq)
  }

  test("estimator lands within the 4-sigma band on 20k distinct values") {
    val s = new KmvSketch(256)
    (1 to 20000).foreach(i => s.add(mix(i.toLong)))
    val est = s.estimate.toDouble
    val sigma = 1.0 / math.sqrt(254.0)
    assert(math.abs(est - 20000.0) / 20000.0 < 4 * sigma,
      s"estimate $est vs truth 20000")
  }

  test("frontier query: duplicate links don't move the estimate") {
    val dir = sf("sf0.001")
    val once = CrawlOps.distinctUrlsKmv(spark, dir).head()
    // exact distinct for reference
    val truth = CrawlOps.frontier(spark, dir).select("link").distinct().count()
    val est = once.getLong(2)
    assert(once.getLong(0) <= 256L)
    if (truth < 256) assert(est == truth)
    else assert(math.abs(est - truth).toDouble / truth < 0.3,
      s"estimate $est vs truth $truth")
  }
}
