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
    val q = StreamingDedup.start(input.toDF(), store, corpus, s"$base/ckpt")
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

    // replaying a fully-committed batch is a no-op (hashes already stored)
    StreamingDedup.ingestBatch(
      Seq(StreamingDedup.Doc(6L, "gamma doc"), StreamingDedup.Doc(7L, "delta doc"))
        .toDF(), store, corpus)
    assert(spark.read.parquet(corpus).count() === 4)
  }

  test("crash between corpus and store writes loses nothing on replay") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sdedup2").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    val batch = Seq(StreamingDedup.Doc(1L, "solo doc")).toDF()

    // Simulate the crash window: corpus append committed, store append lost.
    // With corpus-first ordering this is the ONLY possible partial state.
    StreamingDedup.ingestBatch(batch, store, corpus)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store), true)

    // Replay: the doc must NOT be anti-joined away — it re-appends (dup,
    // recoverable by hash) rather than vanishing (unrecoverable).
    StreamingDedup.ingestBatch(batch, store, corpus)
    assert(spark.read.parquet(corpus).count() === 2)
    assert(spark.read.parquet(corpus).select("text").distinct().count() === 1)
    assert(spark.read.parquet(store).count() === 1)

    // compaction closes the loop: one copy kept (min doc_id), store consistent
    val dropped = StreamingDedup.compactCorpus(spark, store, corpus)
    assert(dropped === 1L)
    assert(spark.read.parquet(corpus).count() === 1)
    assert(spark.read.parquet(corpus).select("doc_id").head().getLong(0) === 1L)
    assert(spark.read.parquet(store).count() === 1)
  }
}
