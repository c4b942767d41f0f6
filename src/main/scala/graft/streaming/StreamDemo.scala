package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Runnable file-streaming demo: replays the events parquet through the SAME
  * transform used by the oracle-verified batch query — `readStream` with a
  * declared schema, watermarked tumbling agg, memory sink — proving the
  * batch/streaming unification claim end-to-end on real files.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    // File streams watch a DIRECTORY; stage the single file into one
    // (testdata is read-only). They also need an explicit schema; whatever
    // physical time encoding the writer used becomes a true timestamp at the
    // edge (same µs floor as the batch queries — Tables.tsCol dispatches).
    val stage = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Path.of(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val schema = spark.read.parquet(stage.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withColumn("ts", graft.sources.Tables.tsCol(schema, "ts"))

    val q = EventStreams.tumblingHourly(stream)
      .writeStream.format("memory").queryName("stream_hourly")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_hourly")
      .groupBy("hour_start", "event_type")
      .agg(max("cnt").as("cnt")) // last update per window
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", graft.sources.Tables.tsCol(schema, "ts"))
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val mismatches = streamed.join(batch, Seq("hour_start", "event_type"), "full")
      .filter(streamed("cnt") =!= batch("cnt")).count()
    println(s"windows streamed: ${streamed.count()}, batch/stream mismatches: $mismatches")
    assert(mismatches == 0, "stream and batch window counts diverged")
    spark.stop()
  }
}
