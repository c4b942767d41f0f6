package graft.bdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coordinate/direction normalization so every play reads left-to-right
  * (SURVEY §7 step 2).
  *
  * Two variants exist in the reference; both are exposed:
  *  - [[notebookStyle]] (default): flips x, y, and both angles
  *    (reference: notebooks/BDB_2026.ipynb cell 19).
  *  - [[packageStyle]]: flips x only (reference: bdb2026/preprocess.py:60-85 —
  *    note its dead code after the early return at :87-99).
  *
  * Pure `Column` expressions — map-side, codegen'd, no shuffle.
  */
object Normalize {

  private val FieldLength = 120.0
  private val FieldWidth = 53.3

  private def isLeft: Column = lower(col("play_direction")) === "left"

  private def flipX(c: Column): Column = when(isLeft, lit(FieldLength) - c).otherwise(c)
  private def flipY(c: Column): Column = when(isLeft, lit(FieldWidth) - c).otherwise(c)
  private def flipAngle(c: Column): Column =
    when(isLeft, pmod(c + 180.0, lit(360.0))).otherwise(c)

  /** Notebook semantics: flip x/y/dir/o and ball-landing point. Adds *_norm
    * columns, never mutates the raw ones. */
  def notebookStyle(df: DataFrame): DataFrame = {
    val hasBall = df.columns.contains("ball_land_x")
    val base = df
      .withColumn("x_norm", flipX(col("x")))
      .withColumn("y_norm", flipY(col("y")))
      .withColumn("dir_norm", flipAngle(col("dir")))
      .withColumn("o_norm", flipAngle(col("o")))
    if (hasBall)
      base
        .withColumn("ball_land_x_norm", flipX(col("ball_land_x")))
        .withColumn("ball_land_y_norm", flipY(col("ball_land_y")))
    else base
  }

  /** Package semantics: x-only flip (kept for parity experiments). */
  def packageStyle(df: DataFrame): DataFrame =
    df.withColumn("x_norm", flipX(col("x")))
      .withColumn("y_norm", col("y"))

  /** Min-max scale a column to [0, 100] over the whole frame, degenerate → 50
    * (reference: bdb2026/preprocess.py:30-36, metrics.py:129-137). Uses an
    * unpartitioned window — single-stage, no extra shuffle beyond the one
    * global min/max exchange.
    */
  def scaleTo100(df: DataFrame, c: String, out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val mn = min(col(c)).over(w)
    val mx = max(col(c)).over(w)
    // clamp: 100*(v-mn)/(mx-mn) can land one ulp above 100 (the multiply
    // rounds before the divide); the contract is a hard [0,100]
    df.withColumn(out,
      when(mx === mn, lit(50.0)).otherwise(
        greatest(least(lit(100.0) * (col(c) - mn) / (mx - mn), lit(100.0)),
          lit(0.0))))
  }
}
