package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical table layout for 100 TB operation (SURVEY §4): partitioned +
  * bucketed Parquet tables.
  *
  * - **Partition columns** (e.g. season/week, or ship month) give partition
  *   pruning: a predicate on the column skips whole directories — the
  *   distributed mirror of the reference's weekly CSV files
  *   (reference: bdb2026/data_io.py:19-28).
  * - **Bucketing** on the join/agg key pre-shuffles data at write time: two
  *   tables bucketed the same way join with ZERO exchange on either side
  *   (asserted in LakeSpec), and groupBy on the bucket key skips the
  *   partial→final shuffle. At 100 TB this converts every trajectory-key
  *   join/agg from a network shuffle into a local merge.
  */
object Lake {

  /** Write a managed bucketed (and optionally partitioned) table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, partitionCols: Seq[String] = Nil,
      sortCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
