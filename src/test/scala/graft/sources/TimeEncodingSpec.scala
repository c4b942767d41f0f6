package graft.sources

import graft.SparkSpec
import graft.queries.Registry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Locks the round-8 time-ingestion fix in BOTH directions: the same events
  * rows written as parquet `timestamp[us]` (TimestampType arrival) and as
  * INT64 nanos (the nanos-as-long arrival shape of TIMESTAMP(NANOS) under
  * `spark.sql.legacy.parquet.nanosAsLong`) must produce IDENTICAL results
  * through [[Tables.eventsUs]] — a future testdata regeneration in either
  * encoding is absorbed at the reader, not spread across 29 queries.
  */
class TimeEncodingSpec extends SparkSpec {
  private val srcDir = "/root/testdata/sf0.001"

  /** Scope a writer timestamp-type override to `body`, restoring whatever
    * value the shared session had before — suites share one SparkSession, so
    * a leaked writer conf would silently change OTHER suites' parquet
    * encodings. */
  private def withWriterTimestampType[A](t: String)(body: => A): A = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, t)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private lazy val (usDir, nanosDir): (String, String) = {
    val ev = Tables.eventsUs(spark, srcDir)
    val base = java.nio.file.Files.createTempDirectory("time_enc")
    val us = base.resolve("us").toString
    val nanos = base.resolve("nanos").toString
    // Encoding A: a true µs timestamp column (pin the writer to TIMESTAMP_MICROS
    // so the file carries timestamp[us] exactly, not INT96).
    withWriterTimestampType("TIMESTAMP_MICROS") {
      ev.withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
        .write.parquet(s"$us/events.parquet")
    }
    // Encoding B: raw INT64 nanos — the arrival type Spark's reader surfaces
    // for TIMESTAMP(NANOS) files under nanosAsLong.
    ev.withColumn("ts", (col("tus") * 1000L).cast(LongType)).drop("tus")
      .write.parquet(s"$nanos/events.parquet")
    (us, nanos)
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
  }

  test("eventsUs dispatches: TimestampType for timestamp[us], BIGINT nanos for nanos-as-long") {
    assert(Tables.events(spark, usDir).schema("ts").dataType === TimestampType)
    assert(Tables.events(spark, nanosDir).schema("ts").dataType === LongType)
    Seq(usDir, nanosDir).foreach { d =>
      assert(Tables.eventsUs(spark, d).schema("tus").dataType === LongType)
    }
  }

  test("w1_lag_diff and e_sessionize are identical across both time encodings") {
    Seq("w1_lag_diff", "e_sessionize").foreach { name =>
      val q = Registry.all.find(_.name == name).get
      val a = canon(q.run(spark, usDir))
      val b = canon(q.run(spark, nanosDir))
      assert(a.nonEmpty, s"$name returned no rows")
      assert(a === b, s"$name diverged between time encodings")
    }
  }

  test("both encodings match the source testdata's own result") {
    val q = Registry.all.find(_.name == "w1_lag_diff").get
    assert(canon(q.run(spark, usDir)) === canon(q.run(spark, srcDir)))
  }

  test("timestamp[ms] writer encoding also normalizes (third writer family)") {
    // TIMESTAMP_MILLIS files arrive as TimestampType like [us]; this pins
    // that the µs values round-trip when they are ms-aligned — the lossy
    // sub-ms case is a WRITER bug (truncation at write), not a reader one.
    val ev = Tables.eventsUs(spark, srcDir)
    val msDir = java.nio.file.Files.createTempDirectory("time_ms").toString
    withWriterTimestampType("TIMESTAMP_MILLIS") {
      ev.withColumn("ts", timestamp_micros((col("tus") / 1000L).cast("long") * 1000L))
        .drop("tus").write.parquet(s"$msDir/events.parquet")
    }
    assert(Tables.events(spark, msDir).schema("ts").dataType === TimestampType)
    val tus = Tables.eventsUs(spark, msDir)
      .select(col("tus")).limit(5).collect().map(_.getLong(0))
    assert(tus.nonEmpty && tus.forall(_ % 1000 == 0),
      "ms-encoded files must surface as ms-aligned epoch-µs")
    // a full query runs identically through the same reader path
    val q = Registry.all.find(_.name == "e_sessionize").get
    assert(q.run(spark, msDir).count() > 0)
  }
}
