package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler: for every column, null count, exact distinct
  * count, and min/max (stringified for a uniform output schema) — the
  * "what is actually in this table" first query of any ingest.
  *
  * Scale shape: ALL columns' statistics ride ONE aggregation (a single scan,
  * one partial→final exchange; the distinct counts expand internally but
  * stay inside the same job) and the per-column pivot happens on the 1-row
  * result — never a per-column scan loop. Profile 100 columns of a 100 TB
  * table and the table is still read once.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    require(df.columns.nonEmpty, "profile of a zero-column frame")
    val aggs = df.columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs.toSeq: _*)
    val perCol = df.columns.map(c =>
      s"""struct('$c' AS col_name, __n AS n_rows,
         |  __n - `__nn_$c` AS n_nulls,
         |  `__nd_$c` AS n_distinct,
         |  `__mn_$c` AS min_s, `__mx_$c` AS max_s)""".stripMargin)
    row.select(explode(expr(s"array(${perCol.mkString(",")})")).as("p"))
      .select("p.*")
  }
}
