package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit hashes of every consecutive n-token
  * window of a token array — `token_gram_hash(tokens, n)` returns
  * `array<long>` of length `size(tokens) - n + 1` (empty when the doc is
  * shorter than one gram).
  *
  * This is the scale path for token-shingle joins (benchmark
  * decontamination, n-gram overlap): the naive form materializes every
  * n-gram as a STRING (`transform(sequence(...), i ->
  * array_join(slice(toks, i, n), ' '))`), which at 100 TB means building
  * and shuffling ~n× the corpus bytes through an interpreted
  * higher-order-function lambda. Here each token is FNV-1a-hashed once and
  * the window hash rolls in O(1) per gram — one compiled pass per
  * document, longs out, codegen-friendly join keys.
  *
  * Collision discipline: equal token windows ⇒ equal hashes, so a
  * hash-equi-join never misses a true match; callers needing EXACT string
  * semantics verify the (rare) hash matches by rebuilding the gram string
  * for candidate positions only (see d_contamination). The hash is
  * self-consistent between the two join sides — it never needs to match an
  * external system.
  *
  * Null-safe (null array or null n → null); null tokens hash as empty.
  */
case class TokenGramHash(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_gram_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_gram_hash requires (ARRAY<STRING>, INT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(arr: Any, n: Any): Any =
    TokenGramHash.gramHashes(arr.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, n) => s"graft.functions.TokenGramHash.gramHashes($a, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGramHash =
    copy(left = newLeft, right = newRight)
}

object TokenGramHash {
  // FNV-1a 64-bit constants (public domain hash; wrapping Long arithmetic)
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def fnv1a(s: UTF8String): Long = {
    if (s == null) return FnvOffset
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * FnvPrime
      i += 1
    }
    h
  }

  /** Rolling polynomial over per-token FNV hashes:
    * gram_i = Σ_{j<n} th(i+j)·P^(n-1-j) (wrapping), advanced in O(1) via
    * gram_{i+1} = (gram_i − th(i)·P^(n-1))·P + th(i+n). */
  def gramHashes(arr: ArrayData, n: Int): ArrayData = {
    require(n > 0, s"token_gram_hash: n must be positive, got $n")
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](sz)
    var i = 0
    while (i < sz) { th(i) = fnv1a(arr.getUTF8String(i)); i += 1 }
    var pTop = 1L // P^(n-1)
    i = 0
    while (i < n - 1) { pTop *= FnvPrime; i += 1 }
    val out = new Array[Long](sz - n + 1)
    var gh = 0L
    i = 0
    while (i < n) { gh = gh * FnvPrime + th(i); i += 1 }
    out(0) = gh
    i = 0
    while (i + n < sz) {
      gh = (gh - th(i) * pTop) * FnvPrime + th(i + n)
      out(i + 1) = gh
      i += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TokenGramHash].getName, "token_gram_hash")
}
