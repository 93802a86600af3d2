package graft

import graft.operators.TrainingOps

/** SimHash near-dup pairs: banding recall guarantee (pigeonhole), exact
  * Hamming verification, and twin detection on the synthetic near-dup
  * corpus. Full-result parity is the DuckDB oracle (q_doc_simhash_dups);
  * these tests pin the operator-level laws the oracle can't express.
  */
class SimhashDupsSpec extends SparkTestBase {

  private lazy val sigs: Map[Long, Long] =
    TrainingOps.simhashOf(TrainingOps.nearDupCorpus(spark, sf()))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val pairs =
    TrainingOps.simhashNearDups(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

  test("every emitted hamming is the exact bit distance of the signatures") {
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, ham, dup) =>
      val expect = java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      assert(ham === expect, s"pair ($a,$b)")
      assert(dup === (ham <= TrainingOps.SimhashDupMax))
    }
  }

  test("pigeonhole: every pair within Hamming 3 of 60 bits is a candidate") {
    // 4 bands × 15 bits: ≤ 3 differing bits can dirty at most 3 bands,
    // so one band must match exactly — banding cannot miss such a pair.
    val found = pairs.map(p => (p._1, p._2)).toSet
    val ids = sigs.keys.toArray.sorted
    var close = 0
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      if (java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3) {
        close += 1
        assert(found.contains((a, b)), s"missed guaranteed pair ($a,$b)")
      }
    }
    assert(close > 0, "corpus has no close pairs — fixture broken")
  }

  test("twins inside the designed radius are ALL flagged; most twins surface") {
    val docIds = sigs.keys.filter(_ < 100000L).toSeq
    val found = pairs.map(p => (p._1, p._2)).toSet
    val flagged = pairs.filter(_._4).map(p => (p._1, p._2)).toSet
    // the operator's contract: within Hamming ≤ 3 recall is exactly 1.0
    val inRadius = docIds.filter(d =>
      java.lang.Long.bitCount(sigs(d) ^ sigs(d + 100000)) <=
        TrainingOps.SimhashDupMax)
    assert(inRadius.nonEmpty, "no twins within the designed radius")
    inRadius.foreach(d => assert(flagged.contains((d, d + 100000)),
      s"twin $d within radius but not flagged"))
    // beyond the guarantee: banding still surfaces the majority of all
    // tail-chopped twins as candidates (measured 0.686 at sf0.001 —
    // median twin distance ≈ 5 of 60 bits)
    val candRate = docIds.count(d => found.contains((d, d + 100000)))
      .toDouble / docIds.size
    assert(candRate >= 0.6, s"twin candidate rate $candRate")
  }
}
