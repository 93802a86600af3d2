package graft

import org.apache.spark.sql.functions._

import graft.functions.EmbeddedJson
import graft.functions.EmbeddedJsonFunctions.extract_embedded_json

class EmbeddedJsonSpec extends SparkTestBase {

  test("balanced-brace extraction honors strings and escapes") {
    val html =
      """<html><script id="__NEXT_DATA__" type="application/json">
        |{"props": {"title": "a } in a string", "esc": "quote \" brace {",
        | "nested": {"deep": [1, 2, {"x": 3}]}}, "page": "/a"}
        |</script></html>""".stripMargin
    val got = EmbeddedJson.extract(html, "__NEXT_DATA__")
    assert(got != null)
    assert(got.startsWith("{\"props\""))
    assert(got.endsWith("\"/a\"}"))
    assert(!got.contains("</script>"), "ran past the object end")
  }

  test("null on missing marker, missing brace, unbalanced input") {
    assert(EmbeddedJson.extract("<html>no marker</html>", "__STATE__") == null)
    assert(EmbeddedJson.extract("__STATE__ = nothing here", "__STATE__") == null)
    assert(EmbeddedJson.extract("__STATE__ = {\"open\": ", "__STATE__") == null)
    assert(EmbeddedJson.extract(null, "__STATE__") == null)
  }

  test("expression works in a plan chained with get_json_object") {
    import spark.implicits._
    val df = Seq(
      (1L, """<script>window.__INITIAL_STATE__ = {"detail": {"id": 42, "t": "x"}};</script>"""),
      (2L, """<div>plain page without state</div>"""))
      .toDF("id", "html")
      .withColumn("state",
        extract_embedded_json(col("html"), lit("__INITIAL_STATE__")))
      .withColumn("detail_id",
        get_json_object(col("state"), "$.detail.id").cast("long"))
    val rows = df.select("id", "detail_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(rows(1L) === 42L)
    assert(rows(2L) === -1L)
  }
}
