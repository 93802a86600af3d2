package graft

import graft.operators.TrainingOps
import org.apache.spark.sql.DataFrame

/** Laws of the shared banding kernel (`TrainingOps.bandedNearDups`) on
  * hand-placed bit patterns — distances and band memberships chosen so
  * every boundary of the pigeonhole argument is exercised exactly once.
  * The three modality operators (simhash/phash/ZCR) route through this
  * kernel; their own suites test it on real prints, this one tests the
  * kernel's geometry in isolation.
  */
class BandedNearDupsSpec extends SparkTestBase {

  // 4 bands × 15 bits over 60-bit prints (the production dials)
  private val B = 4
  private val W = 15

  private def bit(i: Int): Long = 1L << i

  /** ids 0–5 with controlled pairwise distances:
    *   p0 = 0
    *   p1 = d(·,p0)=1, dirty band {0}
    *   p2 = d(·,p0)=3, dirty bands {0,1,2}           — pigeonhole edge
    *   p3 = d(·,p0)=4, one bit in EVERY band         — the guaranteed miss
    *   p4 = p0 (exact dup at distance 0)
    *   p5 = d(·,p0)=5 within bands {0,1,2}, band 3 clean — candidate
    *        beyond the simhash radius
    */
  private val prints = Map[Long, Long](
    0L -> 0L,
    1L -> bit(0),
    2L -> (bit(0) | bit(15) | bit(30)),
    3L -> (bit(0) | bit(15) | bit(30) | bit(45)),
    4L -> 0L,
    5L -> (bit(0) | bit(1) | bit(15) | bit(16) | bit(30)))

  private def run(radius: Int): Map[(Long, Long), (Long, Boolean)] = {
    import spark.implicits._
    val df: DataFrame = prints.toSeq.toDF("id", "fp")
    TrainingOps.bandedNearDups(df, "id", "fp", "id_a", "id_b", B, W, radius)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
  }

  private lazy val atPigeonhole = run(B - 1) // radius 3 — the lossless point

  test("pigeonhole losslessness: every pair within Hamming B-1 is emitted " +
      "with its exact distance and is_dup=true") {
    val ids = prints.keys.toSeq.sorted
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val d = java.lang.Long.bitCount(prints(a) ^ prints(b)).toLong
      if (d <= B - 1) {
        assert(atPigeonhole.contains((a, b)), s"missed guaranteed pair ($a,$b) d=$d")
        assert(atPigeonhole((a, b)) === ((d, true)), s"pair ($a,$b)")
      }
    }
  }

  test("the all-bands-dirty pair is the miss the pigeonhole bound allows") {
    // p0↔p3 and p3↔p4: distance 4 with one differing bit in every band —
    // no band key collides, so banding CANNOT surface it
    assert(!atPigeonhole.contains((0L, 3L)))
    assert(!atPigeonhole.contains((3L, 4L)))
  }

  test("candidates beyond the radius are reported unflagged; a wider " +
      "radius flags them without changing the candidate set") {
    // p0↔p5: distance 5 but band 3 is clean on both → candidate
    assert(atPigeonhole((0L, 5L)) === ((5L, false)))
    val wide = run(6) // the image-path radius (HammingDupMax)
    assert(wide((0L, 5L)) === ((5L, true)))
    assert(wide.keySet === atPigeonhole.keySet,
      "radius must only move the is_dup flag, never candidate generation")
  }

  test("exact dups and multi-band collisions emit exactly one distinct " +
      "row each, ordered id_a < id_b") {
    assert(atPigeonhole((0L, 4L)) === ((0L, true))) // p4 = p0, 4 colliding bands
    atPigeonhole.keys.foreach { case (a, b) => assert(a < b) }
    // no duplicate keys is implied by the Map build succeeding over ALL
    // emitted rows only if sizes agree — assert via a recount
    import spark.implicits._
    val df = prints.toSeq.toDF("id", "fp")
    val n = TrainingOps.bandedNearDups(df, "id", "fp", "id_a", "id_b", B, W, 3)
      .count()
    assert(n === atPigeonhole.size.toLong)
  }

  test("image Hamming top-k (the retrieval dial): exact ranking over the " +
      "banded candidate set, high recall vs brute force") {
    val n = 500L
    val rows = TrainingOps.imageHammingTopK(spark, n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // structure: per query, ranks 1..10 with non-decreasing hamming,
    // (hamming, neighbor_id) strictly the declared order; no self rows
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to 10L), s"query $q ranks")
      assert(sorted.sliding(2).forall { case Array(a, b) =>
        a._3 < b._3 || (a._3 == b._3 && a._2 < b._2) }, s"query $q order")
      assert(rs.forall(_._2 >= 8L), s"query $q ranked a query as neighbor")
    }
    // recall@10 vs exact brute force on the same split — the banded set
    // can only miss a true neighbor whose 12 bands are ALL dirty
    // (p ≈ 0.8^12 per pair at the observed distances); the fixture is
    // deterministic so this is a fixed number, gated just below measured
    val ph = graft.model.Fixtures.imagePhashes(spark, n).collect()
      .map(r => (r.getString(0).substring(4, 12).toLong,
        r.getLong(1) & ((1L << 60) - 1))).toMap
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = (0L until 8L).map { q =>
      val truth = ph.filter(_._1 >= 8L).toSeq
        .map { case (id, p) =>
          (java.lang.Long.bitCount(ph(q) ^ p).toLong, id) }
        .sorted.take(10).map(_._2).toSet
      (truth intersect got(q)).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean below gate (per-query $recalls)")
  }

  test("image multi-probe: candidates(p) is EXACTLY the pairs whose " +
      "closest band is within Hamming p-ish reach; supersets and recall " +
      "are monotone in probes") {
    val n = 500L
    // full characterization straight from the dial's geometry: at 1 probe
    // a pair is a candidate iff SOME band matches exactly (min band
    // distance 0); at 6 probes iff some band differs by ≤ 1 bit. Compute
    // both truths on the driver from the fixture prints and compare sets.
    val ph = graft.model.Fixtures.imagePhashes(spark, n).collect()
      .map(r => (r.getString(0).substring(4, 12).toLong,
        r.getLong(1) & ((1L << 60) - 1))).toMap
    def minBandDist(a: Long, b: Long): Int =
      (0 until TrainingOps.ImgTopKBands).map { bd =>
        java.lang.Long.bitCount(((a ^ b) >>> (bd * TrainingOps.ImgTopKBandBits))
          & ((1L << TrainingOps.ImgTopKBandBits) - 1))
      }.min
    def expected(maxBandDist: Int): Set[(Long, Long)] =
      (for {
        q <- 0L until 8L
        c <- ph.keys if c >= 8L
        if minBandDist(ph(q), ph(c)) <= maxBandDist
      } yield (q, c)).toSet
    def got(probes: Int): Set[(Long, Long)] =
      TrainingOps.imageHammingCandidates(spark, n, probes).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
    val g1 = got(1)
    val g6 = got(6)
    assert(g1 === expected(0), "probes=1 must be exactly the shared-band pairs")
    assert(g6 === expected(1), "probes=6 must be exactly the min-band-dist<=1 pairs")
    assert(g1.subsetOf(g6), "probe sets must be monotone")
    // pigeonhole at the wide dial: EVERY pair within Hamming 23 must be
    // reachable (12 bands all >= 2 dirty bits forces distance >= 24)
    for { q <- 0L until 8L; c <- ph.keys if c >= 8L } {
      val d = java.lang.Long.bitCount(ph(q) ^ ph(c))
      if (d <= 23) assert(g6.contains((q, c)),
        s"pair ($q,$c) at Hamming $d escaped the 6-probe dial")
    }
    // the recall curve is monotone in probes (superset candidates + the
    // deterministic order mean a found true neighbor is never lost)
    val curve = TrainingOps.imageHammingRecallCurve(spark, n)
    assert(curve.map(_._1) === Seq(1, 3, 6))
    assert(curve.sliding(2).forall { case Seq(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 }, s"curve not monotone: $curve")
  }
}
