package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL registration for the library's native Catalyst expressions: the
  * same list serves `GraftExtensions` (the `spark.sql.extensions`
  * startup hook, for spark-submit jobs) and [[registerAll]] (for live
  * sessions — tests, notebooks, `spark.sql(...)` callers). Once
  * registered, every custom expression is a first-class SQL function:
  * `SELECT canonicalize_url(url), long_dot(a, b) FROM t` plans the
  * codegen'd expression directly — no Column-API detour, no UDF.
  */
object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def f1(name: String, clazz: Class[_])(
      make: Expression => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name),
      args => {
        require(args.length == 1, s"$name takes exactly 1 argument")
        make(args.head)
      })

  private def f2(name: String, clazz: Class[_])(
      make: (Expression, Expression) => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, null, name),
      args => {
        require(args.length == 2, s"$name takes exactly 2 arguments")
        make(args.head, args(1))
      })

  /** Every native expression the library ships, by SQL name. */
  val all: Seq[FunctionDescription] = Seq(
    f1("canonicalize_url", classOf[CanonicalizeUrl])(CanonicalizeUrl),
    f1("url_host", classOf[UrlHost])(UrlHost),
    f1("url_path", classOf[UrlPath])(UrlPath),
    f2("extract_embedded_json", classOf[ExtractEmbeddedJson])(
      ExtractEmbeddedJson),
    f2("long_dot", classOf[LongDot])(LongDot),
    f2("long_l2sq", classOf[LongL2Sq])(LongL2Sq))

  /** Register every function on a live session (idempotent: re-register
    * replaces the identical builder).
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = Bridge.functionRegistry(spark)
    all.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
