package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the harness's synthetic parquet tables (see /root/repo/TESTDATA.md).
  *
  * Parquet carries its own schema (columnar, typed), so unlike the reference's
  * schema-on-read CSV ingestion (reference: bdb2026/data_io.py:122-124), no inference
  * pass is needed. At 100 TB these reads are partition-parallel scans with column
  * pruning + predicate pushdown handled by the vectorized parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "events")

  /** events with `tus` — event time as epoch-microsecond BIGINT — derived by
    * PHYSICAL-TYPE DISPATCH, not by assuming one parquet encoding.
    *
    * A 100 TB lake has mixed writers: the same logical instant arrives as
    * parquet `timestamp[us]`/`[ms]` (Spark reads TimestampType),
    * `timestamp[ns]` (Spark's reader surfaces it as raw LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`), or NTZ. All of them must
    * normalize at the reader so every downstream expression sees one type.
    * Truncation semantics (floor to µs) match DuckDB's `epoch_us(ts)` for
    * every encoding, keeping the oracle bit-identical.
    */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    val df = events(spark, dir)
    df.withColumn("tus", microsCol(df.schema, "ts"))
  }

  /** Epoch-µs BIGINT from a time column, whatever its physical arrival type. */
  def microsCol(schema: StructType, name: String): Column =
    schema(name).dataType match {
      case TimestampType    => unix_micros(col(name))
      // UTC session (GraftSession) makes the NTZ→instant reinterpretation exact.
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      // nanosAsLong: raw TIMESTAMP(NANOS) as BIGINT nanos; integer div floors.
      case LongType         => expr(s"$name div 1000")
      case other => throw new IllegalArgumentException(
        s"column '$name': cannot derive epoch-µs from ${other.simpleString}; " +
          "expected timestamp, timestamp_ntz, or bigint (nanos-as-long)")
    }

  /** A true TimestampType column (µs precision) from any physical arrival type —
    * the streaming-edge twin of [[microsCol]] (watermarks need TimestampType).
    */
  def tsCol(schema: StructType, name: String): Column =
    schema(name).dataType match {
      case TimestampType    => col(name)
      case TimestampNTZType => col(name).cast(TimestampType)
      case LongType         => timestamp_micros(expr(s"$name div 1000"))
      case other => throw new IllegalArgumentException(
        s"column '$name': cannot derive timestamp from ${other.simpleString}")
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
