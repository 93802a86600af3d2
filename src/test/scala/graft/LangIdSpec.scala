package graft

import graft.operators.TrainingOps

/** Language-ID heuristic: the CJK positive path on real CJK text (the
  * driver fixture contains none — q_doc_langid_eval makes that visible),
  * the ratio threshold, and eval-matrix accounting.
  */
class LangIdSpec extends SparkTestBase {

  test("CJK detection fires on real CJK text and respects the 30% ratio " +
      "threshold") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "新闻快讯：市场今日大涨，科技股领先。"),          // pure CJK → zh
      (2L, "plain english text with no cjk at all"),          // → en
      (3L, "mixed 新闻 text where cjk is a small 比例 part of it"), // <30% → en
      (4L, "新闻中文内容 mix 更多中文字")                     // >30% → zh
    ).toDF("doc_id", "text")
    val got = TrainingOps.langIdOf(corpus)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L)._3 == "zh" && got(1L)._1 > 0)
    assert(got(2L)._3 == "en" && got(2L)._1 == 0)
    assert(got(3L)._3 == "en" && got(3L)._1 > 0,
      s"below-threshold CJK must stay en: ${got(3L)}")
    assert(got(4L)._3 == "zh", s"majority CJK must read zh: ${got(4L)}")
    // threshold law: pred zh ⇔ cjk*10 > total*3
    got.values.foreach { case (cjk, total, pred) =>
      assert((pred == "zh") == (cjk * 10 > total * 3)) }
  }

  test("eval matrix accounting: counts sum to the corpus size; on the " +
      "driver fixture every label row lands on pred en (the corpus has " +
      "zero CJK codepoints — disclosed in the scaladoc)") {
    val rows = TrainingOps.langIdEval(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = TrainingOps.docs(spark, sf()).count()
    assert(rows.map(_._3).sum == total)
    assert(rows.forall(_._2 == "en"),
      s"fixture has no CJK text; matrix: ${rows.mkString(",")}")
  }
}
