package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SearchOps

/** Laws of the retrieval family (SearchOps): the two-stage partial top-k
  * ≡ the global window on the generalized (string-id) kernel, the
  * cross-modal law (a caption query's rank-1 hit is its joint-duplicate
  * twin at the maximal self score), postings repartition-invariance, and
  * the plan gates (query side broadcast — never an SMJ or a cartesian).
  */
class SearchOpsSpec extends SparkTestBase {

  test("postings are repartition-invariant and carry exact tf") {
    val corpus = graft.operators.TrainingOps.docs(spark, sf())
    val a = SearchOps.postingsOf(corpus, "doc_id").collect().toSet
    val b = SearchOps.postingsOf(corpus.repartition(7), "doc_id")
      .collect().toSet
    assert(a == b && a.nonEmpty)
    // spot law: Σ tf per doc == that doc's whitespace token count
    val perDoc = SearchOps.postingsOf(corpus, "doc_id")
      .groupBy("doc_id").agg(sum("tf").as("s"))
    val direct = corpus.select(col("doc_id"),
      size(filter(split(col("text"), " "), t => t =!= "")).cast("long").as("s"))
    assert(perDoc.exceptAll(direct).isEmpty)
  }

  test("two-stage rankTopK is exactly the global top-k window, string ids " +
      "included") {
    val post = SearchOps.postingsOf(
      graft.operators.TrainingOps.docs(spark, sf()), "doc_id")
    val lex = SearchOps.lexiconOf(post,
      graft.operators.TrainingOps.docs(spark, sf())
        .agg(count(lit(1)).as("n_docs")))
    val qt = lex.orderBy(desc("df"), asc("token")).limit(6)
      .withColumn("query_id", lit(0L))
      .select(col("query_id"), col("token"), col("idf").as("w"))
    val scored = post.join(broadcast(qt), "token")
      .groupBy("query_id", "doc_id").agg(sum(col("tf") * col("w")).as("score"))
    val twoStage = SearchOps.rankTopK(scored, "doc_id", 10)
    val global = scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(desc("score"), asc("doc_id"))).cast("long"))
      .filter(col("rank") <= 10)
      .select("query_id", "doc_id", "score", "rank")
    assert(twoStage.exceptAll(global).isEmpty &&
      global.exceptAll(twoStage).isEmpty)
    assert(twoStage.count() == 10)
  }

  test("cross-modal law: every caption query's rank-1 hit is its own " +
      "re-encode twin, at the maximal (self) score") {
    val got = SearchOps.captionTfidfTopK(spark, nImages = 200L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.foreach { case (q, rows) =>
      val top = rows.find(_._4 == 1L).get
      assert(top._2 == f"img-$q%08d_d",
        s"query $q rank-1 should be the twin, got ${top._2}")
      // the twin's score is the strict maximum: no other image shares the
      // unique img-token, so every other score is strictly smaller
      val rest = rows.filter(_._4 > 1L).map(_._3)
      assert(rest.forall(_ < top._3))
    }
  }

  test("BM25 hand case: one term, two docs — exact integer formula") {
    import spark.implicits._
    // doc 1: term "a" twice among 4 tokens (dl=4); doc 2: "a" once among
    // 8 tokens (dl=8). Third doc without "a" fixes n_docs=3, avgdl.
    val corpus = Seq(
      (1L, "a a b c"), (2L, "a d e f g h i j"), (3L, "k l m n")
    ).toDF("doc_id", "text")
    val post = SearchOps.postingsOf(corpus, "doc_id")
    val got = SearchOps.bm25TopKFrom(post,
        corpus.agg(count(lit(1)).as("n_docs")), "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay the integer arithmetic by hand for query 0 = {a, b, c} (df
    // order: a has df=2, every other token df=1, ties token-asc).
    // avgdl1000 = 16000 div 3 = 5333; idf(a) = 3000 div 2 = 1500,
    // idf(b) = idf(c) = 3000.
    def contrib(idf: Long, tf: Long, dl: Long): Long = {
      val norm = 1000L - 750L + (750L * dl * 1000L) / 5333L
      (idf * tf * 2200L) / (tf * 1000L + (1200L * norm) / 1000L)
    }
    val expect = Map(
      1L -> (contrib(1500, 2, 4) + 2 * contrib(3000, 1, 4)), // a×2, b, c
      2L -> contrib(1500, 1, 8))                             // a only
    val q0 = got.filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
    assert(q0 == expect, s"query 0 got $q0 want $expect")
    // saturation + length norm on the shared term: tf=2 in the 4-token
    // doc outranks tf=1 in the 8-token doc, but by LESS than the linear
    // tf-idf ratio 2:1 (k1 saturates the second occurrence)
    val (cA1, cA2) = (contrib(1500, 2, 4), contrib(1500, 1, 8))
    assert(cA1 > cA2 && cA1 < 2L * cA2)
  }

  test("BM25 length-normalization law: equal tf, shorter doc scores " +
      "higher; equal dl, higher tf scores higher") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "x y"), (2L, "x y p q r s t u"),          // same tf(x)=1, dl 2 vs 8
      (3L, "x x z w"), (4L, "x z w v")               // same dl=4, tf 2 vs 1
    ).toDF("doc_id", "text")
    val post = SearchOps.postingsOf(corpus, "doc_id")
    val scores = SearchOps.bm25TopKFrom(post,
        corpus.agg(count(lit(1)).as("n_docs")), "doc_id", 10)
      .collect().groupBy(r => r.getLong(0))
      .map { case (_, rows) =>
        rows.map(r => r.getLong(1) -> r.getLong(2)).toMap }
      .find(m => m.keySet == Set(1L, 2L, 3L, 4L)) // the query set with "x"
    assert(scores.isDefined, "a query over token x must rank all 4 docs")
    val m = scores.get
    assert(m(1L) > m(2L), s"shorter doc must outrank at equal tf: $m")
    assert(m(3L) > m(4L), s"higher tf must outrank at equal dl: $m")
  }

  test("plan gates: query-term side broadcasts (no SortMergeJoin), no " +
      "cartesian product, and both rank stages are present") {
    Seq(SearchOps.docTfidfTopK(spark, sf()),
        SearchOps.docBm25TopK(spark, sf()),
        SearchOps.captionTfidfTopK(spark, nImages = 200L)).foreach { df =>
      val plan = castToImpl(df).queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        "query side must broadcast:\n" + plan)
      assert(!plan.contains("CartesianProduct"),
        "the n_docs scalar must broadcast, not cartesian:\n" + plan)
      assert(plan.contains("__subrank"),
        "two-stage partial top-k must be in the plan:\n" + plan)
    }
  }

  // ------------------------------------------------------ phrase search ---

  private def phraseHits(docs: Seq[(Long, String)],
      phrases: Seq[(Long, String, String)]): Map[(Long, Long), Long] = {
    import spark.implicits._
    SearchOps.phraseTopKFrom(docs.toDF("doc_id", "text"),
        phrases.toDF("query_id", "t1", "t2"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("phrase search hand case: adjacency and order are enforced, " +
      "occurrences counted exactly") {
    val docs = Seq(
      (1L, "new york new york"),   // 2 adjacent occurrences
      (2L, "york new"),            // reversed — no match
      (3L, "new x york"),          // gap — no match
      (4L, "a new york b"),        // 1 occurrence
      (5L, "new new york"))        // 1 occurrence (first 'new' not adj)
    val got = phraseHits(docs, Seq((0L, "new", "york")))
    assert(got == Map((0L, 1L) -> 2L, (0L, 4L) -> 1L, (0L, 5L) -> 1L),
      got.toString)
  }

  test("phrase search: repeated-token phrase (t1 == t2) counts " +
      "self-adjacency correctly") {
    val got = phraseHits(Seq((1L, "go go go"), (2L, "go stop go")),
      Seq((0L, "go", "go")))
    assert(got == Map((0L, 1L) -> 2L), got.toString)
  }

  test("phrase search plan: phrase table broadcasts twice, candidate " +
      "join on uniform keys, no cartesian, two-stage rank present") {
    val df = SearchOps.docPhraseTopK(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("NestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      "phrase sides must broadcast:\n" + plan)
    assert(plan.contains("__subrank"),
      "two-stage partial top-k must be in the plan:\n" + plan)
  }
}
