package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion + Parquet cache layer (SURVEY §2.1 S1-S5).
  *
  * The reference globs weekly CSVs, pd.concats them, and hand-caches the
  * combined frame as CSV (reference: bdb2026/data_io.py:19-79). Spark's reader
  * unions glob partitions natively, so the concat disappears; the cache
  * becomes a one-time Parquet materialization (`mode("ignore")` = reuse if
  * present, exactly the reference's `exists` check) that also upgrades every
  * later scan to columnar + predicate pushdown.
  */
object Csv {

  /** S1/S2 — schema-declared CSV scan over a path or glob (no inference pass;
    * at 100 TB inference would read everything twice). */
  def read(spark: SparkSession, pathOrGlob: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(pathOrGlob)

  /** S3/S5 — materialized Parquet cache: write once, reuse if present. The
    * returned frame always reads from the cache location. */
  def cachedParquet(spark: SparkSession, source: => DataFrame, cachePath: String,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val writer = source.write.mode("ignore")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(cachePath)
    spark.read.parquet(cachePath)
  }

  /** S4 — small-result CSV sink (single file, like the reference's scorecard
    * CSVs); large outputs should use plain partitioned parquet instead. */
  def writeSmallCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
