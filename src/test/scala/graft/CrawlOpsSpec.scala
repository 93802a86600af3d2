package graft

import org.apache.spark.sql.functions._

import graft.operators.CrawlOps

class CrawlOpsSpec extends SparkTestBase {

  test("dedup bootstrap: per-source counts obey the limits and links are distinct") {
    val df = CrawlOps.dedupBootstrap(spark, sf()).cache()
    val counts = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("click") <= 30)
    assert(counts("purchase") <= 10)
    assert(counts("error") <= 50)
    // signup has limit "all" → every distinct signup link survives
    val allSignup = CrawlOps.frontier(spark, sf())
      .filter(col("source") === "signup").select("link").distinct().count()
    assert(counts("signup") === allSignup)
    assert(df.count() === df.dropDuplicates("source", "link").count())
    df.unpersist()
  }

  test("stop-at-first-seen emits exactly the longest unseen prefix (loop-law)") {
    // sequential loop semantics (the reference's `break`) per source:
    val f = CrawlOps.frontier(spark, sf())
      .select("source", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = f.map { case (src, ids) =>
      src -> ids.takeWhile(id => id % 7 != 0)
    }
    val got = CrawlOps.stopAtFirstSeen(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    expected.foreach { case (src, ids) =>
      assert(got.getOrElse(src, Seq.empty) === ids.toSeq, s"source $src")
    }
  }

  test("per-source caps preserve list order and never exceed the cap") {
    val rows = CrawlOps.perSourceCaps(spark, sf()).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val cap = src match {
        case "click" => 30; case "error" => 50; case "purchase" => 10
        case "signup" => 999999; case _ => 25
      }
      assert(rs.length <= cap, s"source $src")
      // rn is dense 1..n following event_id order
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(3)).toSeq === (1L to rs.length).toSeq)
    }
  }

  test("politeness epochs: no source exceeds its per-epoch budget") {
    val rows = CrawlOps.politenessEpochs(spark, sf(), budgetPerEpoch = 5)
      .groupBy("source", "fetch_epoch").count()
      .agg(max("count")).collect()
    assert(rows(0).getLong(0) <= 5)
  }

  test("canonicalize expression stays inside whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val exec = castToImpl(CrawlOps.canonicalizeUrls(spark, sf()))
      .queryExecution.executedPlan
    val wscg = exec.collect { case w: WholeStageCodegenExec => w }
    assert(wscg.nonEmpty, exec.toString)
    // the Project carrying canonicalizeurl must be INSIDE a codegen span
    assert(wscg.exists(_.toString.contains("canonicalizeurl")), exec.toString)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
