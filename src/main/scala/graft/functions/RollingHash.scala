package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash over a string's code
  * points, `fold(acc, cp) = (acc * 31 + cp) mod 2^31-1`.
  *
  * Semantically identical to the HOF form used by the oracle-verified queries
  * (`aggregate(transform(sequence(...), i -> ascii(substring(s,i,1))), ...)`),
  * but: single pass over the UTF8 bytes, no per-row lambda/array allocation,
  * and it participates in whole-stage codegen — the justified custom-Expression
  * case from the survey (§2.9): a per-row scalar in the 100 TB text path.
  *
  * Null-safe (null in → null out), foldable under constant inputs.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires STRING, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Mod = 2147483647L

  /** Iterates unicode code points (matching `ascii(substring(s,i,1))` per
    * char in both Spark and DuckDB — both index by code point). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingHash].getName, "rolling_hash")
}
