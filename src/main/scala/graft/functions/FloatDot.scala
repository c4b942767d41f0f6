package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: sequential dot product of two
  * `array<float>` columns as double — `Σ (a_i.toDouble * b_i.toDouble)`
  * accumulated LEFT TO RIGHT, which makes it bit-identical to the HOF form
  * the oracle states (`aggregate(zip_with(a, b, (x,y) -> CAST(x AS DOUBLE) *
  * CAST(y AS DOUBLE)), 0.0D, (acc,p) -> acc + p)`) and to DuckDB's
  * `list_reduce` with a prepended zero.
  *
  * Why native (§2.9's justified-custom-Expression test): the HOF allocates a
  * zipped intermediate array and evaluates two lambdas per element per pair;
  * in the ANN hot path that is Q×N×D lambda invocations. This is one fused
  * loop over the two float arrays inside whole-stage codegen. Norms are
  * `float_dot(v, v)`.
  *
  * Null-safe (null array in → null out). Arrays must have equal length —
  * embedding dimensionality is a schema-level invariant, so a mismatch is
  * corrupt data and fails loudly rather than zero-padding silently.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires ARRAY<FLOAT> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object FloatDot {
  /** Sequential left fold — the accumulation ORDER is part of the contract
    * (cross-engine bit-equality), do not reorder/vectorize into pairwise
    * sums. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"float_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FloatDot].getName, "float_dot")
}
