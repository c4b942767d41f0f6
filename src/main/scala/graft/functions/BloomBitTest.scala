package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native bitset membership probe for [[graft.operators.BloomJoin]]: test
  * bit `pos` (the child, a long in `[0, 64·words.length)`) of a packed
  * little-endian `long[]` bitset that rides the expression as a REFERENCED
  * OBJECT, not a literal.
  *
  * Why native (§2.9's justified-custom-Expression test): the previous form
  * (`element_at(lit(words), idx)`) embedded the whole bitset as an array
  * literal once per hash probe — k copies of an up-to-2M-element
  * `GenericArrayData` that every Catalyst pass re-traverses
  * (canonicalization, constant folding, semantic hashing). At a 14M-bit
  * filter (1.5M keys) that made the DRIVER's optimizer the join's dominant
  * cost: the r13 `routed_fixtures` pricing measured ~17 s end-to-end for a
  * bloom-routed join whose executor work was ~2 s. A referenced object is
  * O(1) plan size and one array-index + two shifts in codegen.
  *
  * The bitset array is compared by REFERENCE in the case-class equality
  * (Scala arrays have identity equals), which is exactly right here: two
  * probes are interchangeable only when they share the same built filter
  * instance, and probes of the same filter still canonicalize equal through
  * the shared reference.
  */
case class BloomBitTest(words: Array[Long], child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_bit_test"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_bit_test expects a BIGINT bit position, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(p: Any): Any = {
    val pos = p.asInstanceOf[Long]
    ((words((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      p => s"((($ref[(int)($p >>> 6)]) >>> ((int)($p & 63L))) & 1L) == 1L")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBitTest =
    copy(child = newChild)
}
