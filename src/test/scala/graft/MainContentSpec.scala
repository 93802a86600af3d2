package graft

import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

import graft.operators.ScanOps

/** Main-content extraction laws: the density heuristic picks the
  * article against link-heavy boilerplate, ties go to the earliest
  * block, and the whole job is one row-local projection.
  */
class MainContentSpec extends SparkTestBase {

  test("fixture corpus: the article block wins on every doc — text " +
      "rides through with exactly its one related link") {
    val out = ScanOps.htmlMainContent(spark, sf()).cache()
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bad = out.join(docs, Seq("doc_id")).filter(
      col("n_blocks") =!= 3 || col("main_links") =!= 1 ||
        col("main_text") =!= concat(col("text"), lit(" rel")))
    assert(bad.isEmpty, s"wrong block won: ${bad.take(2).mkString(";")}")
  }

  test("the heuristic, not position, picks the winner: a link-farm " +
      "first block loses to a later dense block, even when the farm " +
      "has MORE raw text") {
    import spark.implicits._
    // farm: 60 chars of anchor text across 6 links → 60 div 7 = 8
    // article: 40 chars, 0 links → 40 div 1 = 40 → article wins
    val farm = (1 to 6).map(i => s"""<a href="/$i">linktext$i</a>""")
      .mkString
    val art = "x" * 40
    val html = s"""<div>$farm</div><div>$art</div>"""
    // build via the operator's internals: feed a one-row corpus through
    // the same extraction by writing it as a documents-shaped frame
    val row = Seq((1L, html)).toDF("doc_id", "html")
      .withColumn("blocks", regexp_extract_all(col("html"),
        lit("<div[^>]*>(.*?)</div>"), lit(1)))
      .withColumn("best", expr(ScanOps.DensestBlockExpr))
      .select(col("best.txt"), col("best.links"))
      .as[(String, Long)].head()
    assert(row == ((art, 0L)),
      s"density must beat position and raw length: got $row")
  }

  test("plan gate: extraction is one row-local projection — zero " +
      "exchanges, no explode-generated shuffle, no window") {
    val plan = castToImpl(ScanOps.htmlMainContent(spark, sf()))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"main-content extraction must not shuffle:\n$plan")
  }
}
