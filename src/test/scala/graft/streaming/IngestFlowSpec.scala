package graft.streaming

import graft.SparkSpec
import graft.quality.Checks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** End-to-end ingest integration: the composed training-data pipeline —
  * Kafka-shaped bus → JSON decode → data-quality gate → content-hash dedup →
  * corpus + hash store. Each piece is unit-tested elsewhere; this proves the
  * CONTRACTS line up (wire schema into parseJson, decoded rows into rules,
  * gated rows into the dedup ingest) with nothing driver-side in the loop.
  */
class IngestFlowSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("bus → decode → quality gate → dedup → corpus, exactly-once shaped") {
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val bus = FileBus(s"$base/bus", "docs")
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

    val rules = Seq(
      Checks.Rule("has_id", col("doc_id").isNotNull),
      Checks.Rule("nonempty_text", length(col("text")) > 0))

    // file streams need the directory to exist before the query plans
    bus.append(spark, Seq(
      "p1" -> """{"doc_id":1,"text":"alpha doc"}""",
      "p2" -> """{"doc_id":2,"text":"alpha doc"}""", // in-batch content dup
      "p3" -> """{"doc_id":3,"text":"beta doc"}"""), 0L, t0)

    val q = Checks.enforceStream(
      EventBus.parseJson(bus.readStream(spark), docSchema)
        .select("doc_id", "text"),
      rules, s"$base/ckpt") { (batch, _) =>
      StreamingDedup.ingestBatch(batch, store, corpus)
    }
    try {
      q.processAllAvailable()
      bus.append(spark, Seq(
        "p4" -> """{"doc_id":4,"text":"beta doc"}""", // cross-batch dup
        "p5" -> """{"doc_id":5,"text":"gamma doc"}"""), 3L, t0)
      q.processAllAvailable()

      val out = spark.read.parquet(corpus)
      assert(out.count() === 3)
      assert(out.select("text").distinct().count() === 3)
      assert(spark.read.parquet(store).count() === 3)
    } finally if (q.isActive) q.stop()
  }
}
