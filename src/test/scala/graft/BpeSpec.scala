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

  // ------------------------------------------------- encode (apply) ---

  private def encode(train: Seq[String], docs: Seq[(Long, String)],
      steps: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TrainingOps.bpeEncodeFrom(spark, docs.toDF("doc_id", "text"),
        train.toDF("text"), steps)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("encode hand case: merges (a,a) then (a,b) tokenize aaab as " +
      "[aa,ab,$] — hand-replayed counts") {
    // train on 'aaab' x3: step1 (a,a,6)... on one word 'aaab':
    // (a,a)=2, (a,b)=1, (b,$)=1 → merge1 (a,a); [aa,a,b,$]:
    // (aa,a)=1,(a,b)=1,(b,$)=1 → tie lex asc → merge2 (a,b).
    // encoding 'aaab' applies both: [aa,ab,$] → 3 tokens;
    // 'ab' → [ab,$] → 2; 'ba' (no merge hits except none) → [b,a,$] → 3
    val got = encode(Seq("aaab"), Seq((1L, "aaab"), (2L, "ab"),
      (3L, "ba")), steps = 2)
    assert(got(1L) == ((1L, 4L, 3L)), s"${got(1L)}")
    assert(got(2L) == ((1L, 2L, 2L)), s"${got(2L)}")
    assert(got(3L) == ((1L, 2L, 3L)), s"${got(3L)}")
  }

  test("encode: zero merges hit → one symbol per char plus the " +
      "end-of-word sentinel; empty doc → all-zero row, never dropped") {
    val got = encode(Seq("aaab"), Seq((1L, "xyz zz"), (2L, "  ")), 1)
    // 'xyz' -> 4 symbols, 'zz' -> 3 (merge (a,a) never hits)
    assert(got(1L) == ((2L, 5L, 7L)), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L)), s"${got(2L)}")
  }

  test("encode: more merges never increase the total token count " +
      "(each merge hit drops it by one — monotone on the sf corpus)") {
    val k0 = TrainingOps.bpeEncode(spark, sf(), steps = 1)
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    val k6 = TrainingOps.bpeEncode(spark, sf())
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(k6 <= k0, s"steps=6 total $k6 > steps=1 total $k0")
  }

  test("encode plan is scan → project: no exchange, no join, no window " +
      "(the merge table rides in as literals)") {
    import spark.implicits._
    val enc = TrainingOps.bpeEncodeFrom(spark,
      Seq((1L, "aaab ab")).toDF("doc_id", "text"),
      Seq("aaab").toDF("text"), 2)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
