package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by library mains and tests.
  *
  * Conventions (match Verify/Bench + the DuckDB oracle):
  *  - UTC session timezone, so naive parquet timestamps mean the same instant in
  *    Spark and DuckDB.
  *  - `inferTimestampNTZ=false`: read parquet timestamps as TimestampType so the
  *    full functions surface (unix_millis etc.) applies uniformly.
  *  - AQE on (runtime join-strategy switching + skew splitting at scale).
  *  - shuffle partitions sized to local cores, not the 200 default.
  */
object GraftSession {
  def local(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession =
    builder(cores).getOrCreate()

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cores]")
      .appName("graft")
      // Default: one shuffle partition per core — right for bench-scale data
      // on this box. SPARK_GRAFT_SHUFFLE_PARTITIONS overrides for scale
      // experiments: a cluster sizes shuffle partitions to DATA (AQE
      // coalesces from a high initial count), and holding 32 while data
      // grows 100× makes per-task aggregation state grow linearly — the
      // registry scale audit measured map-side partial aggs falling back to
      // pass-through emission exactly this way (d_dup_spans, NOTES_r15 §12).
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // If a writer produced TIMESTAMP(NANOS) (which the Spark reader otherwise
      // rejects), surface it as long nanos instead of failing the scan;
      // Tables.eventsUs/microsCol dispatch on the arrival type (timestamp[us]
      // vs nanos-as-long) so either encoding normalizes to the same epoch-µs.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Report write-time sortBy order from bucketed scans, dropping both
      // sides' sorts in co-bucketed sort-merge joins. Self-guarded: Spark
      // only reports the ordering when a bucket is a single file, which
      // Lake.writeBucketed guarantees by aligning write partitioning with
      // the bucket spec.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      // Long-lived sessions accumulate shuffle files until the driver GCs
      // the referencing objects — ContextCleaner is GC-driven, and the
      // default periodic-GC interval (30 min) let a 40-minute 185-query
      // sweep at 30x data pile ~70 GB of dead shuffle into local dirs and
      // ENOSPC the box (r14 incident, d_ngram_jaccard the innocent
      // casualty). Two-minute periodic GC keeps dead shuffle bounded at a
      // negligible driver cost; the same setting is what a 100 TB
      // long-running query service wants.
      .config("spark.cleaner.periodicGC.interval", "2min")
}
