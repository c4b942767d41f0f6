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

  /** Analyzed-relation memo, per (session, path) — a catalog, not a data
    * cache. Every `spark.read.parquet(path)` call pays a driver-side file
    * listing plus a one-task footer-read JOB for schema inference; r18
    * stage profiles measured that job at ~30 ms span + ~40-80 ms of
    * scheduling gap PER TABLE PER EXECUTION (j_star_chain: 5 such stages ≈
    * 0.3 s of its 1.0 s wall — `plans/r18/` profiles). A real engine
    * resolves a table through a catalog exactly once; this memo is that
    * catalog for the harness's immutable testdata dirs. It stores only the
    * resolved relation (listing + schema — metadata), never rows or
    * results: every execution still scans parquet. Writers that overwrite
    * a table dir in-process must call [[invalidate]] (ScaleGen does).
    *
    * Sessions are weak keys: private sessions (e.g. PageRank's isolated
    * iteration sessions) must not be pinned forever by the memo. */
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def read(spark: SparkSession, dir: String, table: String): DataFrame =
    readDir(spark, s"$dir/$table.parquet")

  /** Memoized analyzed relation for an arbitrary parquet DIRECTORY — the
    * same catalog as [[read]], for write-once dirs that don't follow the
    * `<dir>/<table>.parquet` naming (e.g. MaterializedAgg's immutable
    * `state_<id>` snapshots, which are never rewritten in place — new ids
    * get new paths, vacuum only deletes superseded ones). */
  def readDir(spark: SparkSession, path: String): DataFrame = {
    val perSession = relCache.synchronized {
      var m = relCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relCache.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent(path, p => spark.read.parquet(p))
  }

  /** Drop every memoized relation under `dir`, for all sessions — call
    * after overwriting any `<dir>/<table>.parquet` in-process. Also drops
    * [[FileSkipping]]'s footer-stats memo for the same files (the two memos
    * cache the same catalog layer and must invalidate together). */
  def invalidate(dir: String): Unit = {
    FileSkipping.invalidateStats(dir)
    relCache.synchronized {
      relCache.values.forEach { m =>
        m.keySet.removeIf(_.startsWith(dir)); ()
      }
    }
  }

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
