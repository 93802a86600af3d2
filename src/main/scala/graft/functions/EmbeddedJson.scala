package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** S7 — embedded-state extraction: pull the JSON object that follows a
  * marker (`__NEXT_DATA__`, `window.__INITIAL_STATE__` …) out of an HTML
  * page with a balanced-brace scan that honors strings and escapes.
  *
  * Re-expresses the SEMANTICS of the reference's find+brace-match state
  * machine (/root/reference/scrapers/browser/iyiou.py:42-93; string-split
  * variant bloomberg.py:21-23; regex variant scmp.py:66-79) as a single
  * total function: null when the marker or a balanced object is absent.
  * Chain with `get_json_object`/`from_json` for field access.
  */
object EmbeddedJson {

  def extract(html: String, marker: String): String = {
    if (html == null || marker == null) return null
    val idx = html.indexOf(marker)
    if (idx < 0) return null
    var i = html.indexOf('{', idx + marker.length)
    if (i < 0) return null
    val start = i
    var depth = 0
    var inStr = false
    var esc = false
    while (i < html.length) {
      val c = html.charAt(i)
      if (esc) esc = false
      else if (inStr) {
        if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0) return html.substring(start, i + 1)
        case _ =>
      }
      i += 1
    }
    null // unbalanced
  }
}

/** extract_embedded_json(html, marker) — codegen'd static call (cold path
  * in the reference — 4 browser sources — but kept native for uniformity).
  */
case class ExtractEmbeddedJson(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(html: Any, marker: Any): Any = {
    val r = EmbeddedJson.extract(html.toString, marker.toString)
    if (r == null) null else UTF8String.fromString(r)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local per occurrence: a fixed name would collide (and silently
    // kill whole-stage codegen) when the expression appears twice in scope
    val tmp = ctx.freshName("graftEj")
    nullSafeCodeGen(ctx, ev, (h, m) => {
      s"""
         |String $tmp = graft.functions.EmbeddedJson.extract(
         |  $h.toString(), $m.toString());
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = UTF8String.fromString($tmp); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtractEmbeddedJson =
    copy(left = newLeft, right = newRight)
}

object EmbeddedJsonFunctions {
  def extract_embedded_json(html: Column, marker: Column): Column =
    Bridge.column(ExtractEmbeddedJson(
      Bridge.expression(html), Bridge.expression(marker)))
}
