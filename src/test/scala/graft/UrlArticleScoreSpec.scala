package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.CrawlOps

/** URL-shape prior laws: class verdicts, clamp behavior at both ends,
  * signal attribution, and the scan-rate plan.
  */
class UrlArticleScoreSpec extends SparkTestBase {

  private lazy val out = CrawlOps.urlArticleScore(spark, sf()).cache()

  test("class verdicts: dated-slug URLs are articles, section/query/" +
      "deep-tag URLs are not — with the parsed signals attributing why") {
    assert(out.filter(col("event_id") % 4 === 0 && !col("is_article"))
      .isEmpty, "dated slug must score as article")
    assert(out.filter(col("event_id") % 4 =!= 0 && col("is_article"))
      .isEmpty, "only the dated-slug class passes the bar")
    // attribution: the signals are parsed, not guessed
    assert(out.filter(col("has_date") =!= (col("event_id") % 4 === 0))
      .isEmpty)
    assert(out.filter(col("has_query") =!= (col("event_id") % 4 === 2))
      .isEmpty)
    assert(out.filter(col("event_id") % 4 === 3 && col("depth") =!= 6)
      .isEmpty)
  }

  test("clamps are live on the fixture: the query class bottoms at 0 " +
      "(raw −150) and no score exceeds 1000") {
    assert(out.filter(col("event_id") % 4 === 2 &&
      col("article_score_pm") =!= 0).isEmpty)
    assert(out.filter(
      col("article_score_pm") < 0 || col("article_score_pm") > 1000)
      .isEmpty)
  }

  test("plan gate: pure row-local regexp arithmetic — zero exchanges") {
    val plan = castToImpl(CrawlOps.urlArticleScore(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"URL prior must not shuffle:\n$plan")
  }
}
