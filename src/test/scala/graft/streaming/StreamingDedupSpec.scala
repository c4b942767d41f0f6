package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {

  test("stream dedup drops repeats within and across micro-batches, persists the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sdedup").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"

    val input = MemoryStream[StreamingDedup.Doc]
    val q = StreamingDedup.start(input.toDF(), store, corpus)
    input.addData(
      StreamingDedup.Doc(1L, "alpha doc"),
      StreamingDedup.Doc(2L, "alpha doc"), // in-batch dup
      StreamingDedup.Doc(3L, "beta doc"))
    q.processAllAvailable()
    input.addData(
      StreamingDedup.Doc(4L, "beta doc"), // cross-batch dup
      StreamingDedup.Doc(5L, "gamma doc"))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(corpus)
    assert(out.count() === 3)
    assert(out.select("text").distinct().count() === 3)
    assert(spark.read.parquet(store).count() === 3)

    // a later BATCH backfill shares the same store and semantics
    StreamingDedup.ingestBatch(
      Seq(StreamingDedup.Doc(6L, "gamma doc"), StreamingDedup.Doc(7L, "delta doc"))
        .toDF(), store, corpus)
    assert(spark.read.parquet(corpus).count() === 4)
  }
}
