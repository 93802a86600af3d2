package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for URL handling. These participate in
  * whole-stage codegen (a static Java call inlined into the generated
  * code), unlike a Scala UDF which would break the codegen span and add
  * serialization overhead on the 10^10-row frontier path (SURVEY.md §2.11).
  */
abstract class UrlStringExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  /** Fully-qualified static method to invoke. */
  protected def staticMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($staticMethod($c.toString()))")
}

/** canonicalize_url(url) — see [[UrlCanonicalizer.canonicalize]]. */
case class CanonicalizeUrl(child: Expression) extends UrlStringExpr {
  override protected def staticMethod: String =
    "graft.functions.UrlCanonicalizer.canonicalize"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlCanonicalizer.canonicalize(v.toString))
  override protected def withNewChildInternal(c: Expression): CanonicalizeUrl =
    copy(child = c)
}

/** url_host(url) — host of an (already canonical) URL. */
case class UrlHost(child: Expression) extends UrlStringExpr {
  override protected def staticMethod: String =
    "graft.functions.UrlCanonicalizer.hostOf"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlCanonicalizer.hostOf(v.toString))
  override protected def withNewChildInternal(c: Expression): UrlHost =
    copy(child = c)
}

/** url_path(url) — path of an (already canonical) URL. */
case class UrlPath(child: Expression) extends UrlStringExpr {
  override protected def staticMethod: String =
    "graft.functions.UrlCanonicalizer.pathOf"
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlCanonicalizer.pathOf(v.toString))
  override protected def withNewChildInternal(c: Expression): UrlPath =
    copy(child = c)
}

object UrlFunctions {
  def canonicalize_url(c: Column): Column =
    Bridge.column(CanonicalizeUrl(Bridge.expression(c)))
  def url_host(c: Column): Column = Bridge.column(UrlHost(Bridge.expression(c)))
  def url_path(c: Column): Column = Bridge.column(UrlPath(Bridge.expression(c)))
}
