package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass loops over two long arrays, callable both from the
  * interpreted expression path and (as static Java calls) from generated
  * code. Null ELEMENTS are treated as 0 — the engine's embedding model
  * never produces them ([[graft.operators.TrainingOps.quantized]] maps
  * every float), so this is a deterministic never-taken branch, not a
  * semantic knob; the HOF formulation these expressions replace returned
  * NULL for the whole fold instead, which no caller relied on.
  */
object VectorOps {
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def l2sqLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0L
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }
}

/** Native Catalyst expressions for the ANN hot path (SURVEY.md §2.11
  * preference order: native expression > UDF). The previous formulation —
  * `aggregate(zip_with(a, b, ...))` — materializes an intermediate
  * products ARRAY per row and evaluates both higher-order functions via
  * interpreted lambda invocations outside whole-stage codegen. These
  * expressions compute the same fold in one allocation-free loop inlined
  * into the generated code, which matters when the scored-candidate-pair
  * count is (corpus × queries)-shaped.
  */
abstract class LongVecFold extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ($l, $r)")
    }

  /** Fully-qualified static helper (ArrayData, ArrayData) → long. */
  protected def staticMethod: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$staticMethod($a, $b)")
}

/** long_dot(a, b) = Σ a(i)·b(i) over long arrays (64-bit wrap, same as the
  * HOF fold it replaces; quantized embeddings keep |dot| ≤ 64·10⁶ᐧ²).
  */
case class LongDot(left: Expression, right: Expression) extends LongVecFold {
  override protected def staticMethod: String =
    "graft.functions.VectorOps.dotLong"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LongDot = copy(left = l, right = r)
}

/** long_l2sq(a, b) = Σ (a(i)−b(i))² over long arrays. */
case class LongL2Sq(left: Expression, right: Expression) extends LongVecFold {
  override protected def staticMethod: String =
    "graft.functions.VectorOps.l2sqLong"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sqLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): LongL2Sq = copy(left = l, right = r)
}

object VectorFunctions {
  def long_dot(a: Column, b: Column): Column =
    Bridge.column(LongDot(Bridge.expression(a), Bridge.expression(b)))
  def long_l2sq(a: Column, b: Column): Column =
    Bridge.column(LongL2Sq(Bridge.expression(a), Bridge.expression(b)))
}
