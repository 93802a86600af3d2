package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** Laws of the bigram-LM familiarity filter (TrainingOps.lmFamiliarityOf):
  * hand-computed counts, the held-in self-coverage law (a doc the LM was
  * built from is fully matched by construction), the in/out-of-
  * distribution ordering signal, and zero-bigram docs.
  */
class LmFamiliaritySpec extends SparkTestBase {
  import spark.implicits._

  test("hand case: counts, matches and familiarity mass are exact") {
    // doc 0 is held-in (0 % 10 == 0): "a b a b" → bigrams (a b)x2, (b a)
    // LM = { "a b" → 2, "b a" → 1 }
    val corpus = Seq(
      (0L, "a b a b"),   // held-in: n=3, matched=3, fam = 2+1+2 = 5
      (1L, "a b c"),     // n=2, matched=1 ("a b"), fam=2 → in-dist (2>=2)
      (3L, "x y z"),     // n=2, matched=0, fam=0 → out
      (5L, "q")          // 0 bigrams → all zero, vacuously in-dist
    ).toDF("doc_id", "text")
    val out = TrainingOps.lmFamiliarityOf(corpus).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 3L, 5L, true),
      (1L, 2L, 1L, 2L, true),
      (3L, 2L, 0L, 0L, false),
      (5L, 0L, 0L, 0L, true)))
  }

  test("held-in self-coverage on the fixture corpus: every doc_id % 10 == 0 " +
      "doc is fully matched (its own bigrams are in the LM by construction) " +
      "with familiarity >= its bigram count") {
    val out = TrainingOps.lmFamiliarity(spark, sf())
    val heldIn = out.filter(col("doc_id") % 10 === 0)
    assert(heldIn.count() > 0)
    assert(heldIn.filter(col("matched_bigrams") =!= col("n_bigrams"))
      .count() == 0L)
    assert(heldIn.filter(col("familiarity") < col("n_bigrams")).count() == 0L)
  }

  test("ordering signal: gibberish scores zero while corpus-like text " +
      "scores positive") {
    val corpus = Seq(
      (10L, "the table scan is fast and the table scan is slow"),
      (11L, "the table scan is fast"),                 // corpus-like
      (12L, "zq xv qqq vvv zzz nnn mmm")               // gibberish
    ).toDF("doc_id", "text")
    val m = TrainingOps.lmFamiliarityOf(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(m(11L)._1 > 0L && m(11L)._2)
    assert(m(12L)._1 == 0L && !m(12L)._2)
  }
}
