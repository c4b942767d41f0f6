package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ↔ Expression converters (which are
  * `private[sql]` in Spark 4): graft's custom Catalyst expressions that
  * carry non-SQL constructor state — [[graft.functions.BloomBitTest]]'s
  * bitset rides as a referenced object, so it cannot be registered through
  * the SQL FunctionRegistry the way `float_dot`/`rolling_hash` are — need a
  * door from Expression to Column. Lives in an `org.apache.spark.sql`
  * subpackage solely to satisfy that access qualifier; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
