package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingOps

/** BPE merge training over the word-frequency table: hand-replayed merge
  * chains, the greedy non-overlap contract of the string-replace apply,
  * and the non-increasing best-count law.
  */
class BpeSpec extends SparkTestBase {

  private def merges(corpusText: String, steps: Int)
      : Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    TrainingOps.bpeMergesFrom(spark, Seq(corpusText).toDF("text"), steps)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  test("hand case: aaab x3 + ab x2 — (a,a,6) then (a,b,5)") {
    // step 1 pairs: aaab+$ = (a,a)x2, (a,b), (b,$) each x3; ab+$ = (a,b),
    // (b,$) each x2 → best (a,a) 6. step 2 on [aa,a,b,$]x3 + [a,b,$]x2:
    // (aa,a)=3, (a,b)=5, (b,$)=5 → count tie (a,b)/(b,$) breaks lex asc
    val got = merges("aaab aaab aaab ab ab", steps = 2)
    assert(got == Seq((1L, "a", "a", 6L), (2L, "a", "b", 5L)), s"$got")
  }

  test("greedy left-to-right non-overlap: aaaa merges to [aa,aa], not " +
      "[aa,a,a] — visible in the step-2 pair counts") {
    // if the apply overlapped or missed the second pair, step 2's table
    // would differ: correct = [aa,aa,$] → (aa,aa)=1, (aa,$)=1, tie breaks
    // to rhs '$' < 'aa'
    val got = merges("aaaa", steps = 2)
    assert(got == Seq((1L, "a", "a", 3L), (2L, "aa", "$", 1L)), s"$got")
  }

  test("end-of-word sentinel: word-final merges stay distinct from " +
      "word-internal ones") {
    // 'ab' x2 and 'cab' x1: (a,b) occurs in both words (count 3) but the
    // b is word-final every time — after merging (a,b), the next-best
    // involves the sentinel pair (ab,$) 3, proving word ends participate
    val got = merges("ab ab cab", steps = 2)
    assert(got.head == (1L, "a", "b", 3L), s"$got")
    assert(got(1) == (2L, "ab", "$", 3L), s"$got")
  }

  test("sf corpus: exactly BpeSteps rows, steps contiguous, best count " +
      "non-increasing (a post-merge pair occurs at most as often as the " +
      "pair it contains)") {
    val rows = TrainingOps.bpeMerges(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to TrainingOps.BpeSteps.toLong),
      s"steps: ${rows.map(_._1).mkString(",")}")
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2),
      s"best count increased: ${rows.mkString(",")}")
  }

  test("repartition invariance: the merge table is a pure function of " +
      "the corpus") {
    import spark.implicits._
    val corpus = Seq("aaab aaab", "aaab ab", "ab cab").toDF("text")
    val a = TrainingOps.bpeMergesFrom(spark, corpus, 3)
      .collect().map(_.toSeq).toSet
    val b = TrainingOps.bpeMergesFrom(spark, corpus.repartition(5), 3)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
