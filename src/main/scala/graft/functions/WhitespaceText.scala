package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `whitespace_tokens(text)` — the maximal
  * non-space byte runs of `text` as `array<string>`, byte-for-byte equal to
  * `filter(split(text, ' '), x -> x != '')` (single-space split, empties
  * dropped; the 0x20 byte never occurs inside a multi-byte UTF-8 sequence,
  * so byte scanning is character-safe).
  *
  * This is the compiled path for the corpus-scale tokenize-then-X queries:
  * the HOF form runs an interpreted regex split plus a boxed lambda per
  * token per document — measured at sf1 it is the dominant cpu of
  * `t_bigram_lm`'s two explode passes. One fused byte scan per document,
  * codegen-friendly, no regex, no lambda dispatch.
  */
case class WhitespaceTokens(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "whitespace_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"whitespace_tokens requires STRING, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    WhitespaceText.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.WhitespaceText.tokens($s)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** Native Catalyst expression: `token_bigrams(tokens)` — every consecutive
  * token pair of an `array<string>` as `array<struct<a:string, b:string>>`
  * (empty when fewer than two tokens). Compiled replacement for the
  * interpreted `transform(sequence(1, size(tk) - 1), i ->
  * struct(tk[i-1], tk[i]))` chain; exact same rows after `explode`.
  */
case class TokenBigrams(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType), StructField("b", StringType))),
    containsNull = false)
  override def prettyName: String = "token_bigrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_bigrams requires ARRAY<STRING>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    WhitespaceText.bigrams(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.WhitespaceText.bigrams($a)")

  override protected def withNewChildInternal(newChild: Expression): TokenBigrams =
    copy(child = newChild)
}

object WhitespaceText {

  /** Maximal non-space byte runs — see [[WhitespaceTokens]]. */
  def tokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val start = i
      while (i < n && b(i) != ' ') i += 1
      if (i > start) out += UTF8String.fromBytes(b, start, i - start)
    }
    new GenericArrayData(out.toArray)
  }

  /** Consecutive pairs — see [[TokenBigrams]]. */
  def bigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = arr.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val next = arr.getUTF8String(i + 1)
      out(i) = new GenericInternalRow(Array[Any](prev, next))
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  val tokensInfo: ExpressionInfo = new ExpressionInfo(
    classOf[WhitespaceTokens].getName, "whitespace_tokens")
  val bigramsInfo: ExpressionInfo = new ExpressionInfo(
    classOf[TokenBigrams].getName, "token_bigrams")
}
