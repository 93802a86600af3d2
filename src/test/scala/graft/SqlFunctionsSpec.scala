package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, UrlCanonicalizer, VectorFunctions}

/** SQL registration of the native expressions (GraftFunctions /
  * GraftExtensions): once registered, `spark.sql` resolves each function
  * to the SAME codegen'd Catalyst expression the Column API builds — no
  * UDF wrapper, identical results, arity-checked.
  */
class SqlFunctionsSpec extends SparkTestBase {

  private def registered(): Unit = GraftFunctions.registerAll(spark)

  test("canonicalize_url / url_host / url_path from SQL ≡ library semantics") {
    registered()
    import spark.implicits._
    val raw = "HTTPS://News.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"
    Seq(raw).toDF("u").createOrReplaceTempView("sql_fn_urls")
    // url_host/url_path take an ALREADY-canonical URL — compose in SQL
    val row = spark.sql(
      """SELECT canonicalize_url(u) AS c,
        |       url_host(canonicalize_url(u)) AS h,
        |       url_path(canonicalize_url(u)) AS p
        |FROM sql_fn_urls""".stripMargin).collect()(0)
    assert(row.getString(0) == UrlCanonicalizer.canonicalize(raw))
    assert(row.getString(1) == "news.example.com")
    assert(row.getString(2) == "/a/b/")
  }

  test("long_dot / long_l2sq from SQL ≡ the Column-API expressions") {
    registered()
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    df.createOrReplaceTempView("sql_fn_vecs")
    val viaSql = spark.sql(
      "SELECT long_dot(a, b) AS d, long_l2sq(a, b) AS l FROM sql_fn_vecs")
      .collect()(0)
    val viaCol = df.select(
      VectorFunctions.long_dot(col("a"), col("b")),
      VectorFunctions.long_l2sq(col("a"), col("b"))).collect()(0)
    assert(viaSql.getLong(0) == 32L && viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == 27L && viaSql.getLong(1) == viaCol.getLong(1))
  }

  test("extract_embedded_json from SQL parses a brace-balanced payload") {
    registered()
    import spark.implicits._
    Seq("""var s = {"a": {"b": 2}, "c": [1, 2]}; rest""").toDF("body")
      .createOrReplaceTempView("sql_fn_json")
    val out = spark.sql(
      """SELECT extract_embedded_json(body, 'var s = ') AS j
        |FROM sql_fn_json""".stripMargin).collect()(0).getString(0)
    assert(out == """{"a": {"b": 2}, "c": [1, 2]}""")
  }

  test("wrong arity fails analysis, not execution") {
    registered()
    val e = intercept[Exception](
      spark.sql("SELECT long_dot(array(1L)) AS d").collect())
    assert(e.getMessage.contains("2 arguments") ||
      e.getMessage.toLowerCase.contains("requires"))
  }
}
