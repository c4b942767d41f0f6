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
    // positional rename first: every later reference uses safe generated
    // names, so column names containing quotes/backticks/dots never reach
    // an attribute parser (col("a`b") would throw)
    val names = df.columns.toSeq
    val safe = df.toDF(names.indices.map(i => s"__c$i"): _*)
    val aggs = names.indices.flatMap { i =>
      Seq(count(col(s"__c$i")).as(s"__nn_$i"),
        countDistinct(col(s"__c$i")).as(s"__nd_$i"),
        min(col(s"__c$i")).cast("string").as(s"__mn_$i"),
        max(col(s"__c$i")).cast("string").as(s"__mx_$i"))
    }
    val row = safe.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = names.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_s"), col(s"__mx_$i").as("max_s"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
