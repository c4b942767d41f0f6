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

  test("late rows dead-letter to quarantine — conservation: nothing lost") {
    val base = java.nio.file.Files.createTempDirectory("ingest_dl").toString
    val bus = FileBus(s"$base/bus", "docs")
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    val quarantine = s"$base/quarantine"
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    def shifted(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)

    val rules = Seq(
      Checks.Rule("has_id", col("doc_id").isNotNull),
      Checks.Rule("nonempty_text", length(col("text")) > 0))

    bus.append(spark, Seq(
      "p1" -> """{"doc_id":1,"text":"alpha doc"}""",
      "p2" -> """{"doc_id":2,"text":"alpha doc"}""", // in-batch content dup
      "p3" -> """{"doc_id":3,"text":"beta doc"}"""), 0L, t0)

    val q = IngestFlow.start(spark, bus, docSchema, rules,
      lateDelay = "10 minutes", quarantinePath = quarantine,
      storePath = store, corpusPath = corpus, checkpoint = s"$base/ckpt")
    try {
      q.processAllAvailable() // watermark now t0 - 10 min
      // doc 4 arrives 60 min behind the frontier → 50 min past the watermark
      bus.append(spark, Seq(
        "p4" -> """{"doc_id":4,"text":"delta doc"}"""), 3L, shifted(-60))
      bus.append(spark, Seq(
        "p5" -> """{"doc_id":5,"text":"gamma doc"}"""), 4L, shifted(1))
      q.processAllAvailable()

      val out = spark.read.parquet(corpus)
      val dead = spark.read.parquet(quarantine)

      // the late row is quarantined WITH its payload and exact lateness
      assert(dead.count() === 1)
      val row = dead.head()
      assert(row.getAs[Long]("doc_id") === 4L)
      assert(row.getAs[String]("text") === "delta doc")
      assert(row.getAs[Long]("late_by_ms") === 50L * 60000L)
      assert(row.getAs[Long]("offset") === 3L) // wire metadata survives

      // fresh rows flowed through gate+dedup: alpha (once), beta, gamma
      assert(out.count() === 3)
      assert(out.select("text").distinct().count() === 3)

      // conservation: every input doc is in the corpus, represented there
      // by content (the dedup drop), or in quarantine — nothing vanished
      val corpusTexts = out.select("text").collect().map(_.getString(0)).toSet
      val deadIds = dead.select("doc_id").collect().map(_.getLong(0)).toSet
      val inputs = Seq(1L -> "alpha doc", 2L -> "alpha doc", 3L -> "beta doc",
        4L -> "delta doc", 5L -> "gamma doc")
      inputs.foreach { case (id, text) =>
        assert(deadIds.contains(id) || corpusTexts.contains(text),
          s"doc $id lost: not in corpus (by content) nor quarantine")
      }
    } finally if (q.isActive) q.stop()
  }

  test("payload fields colliding with flow-reserved columns are rejected") {
    val base = java.nio.file.Files.createTempDirectory("ingest_rc").toString
    val clashing = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("late", StringType))) // would be clobbered by the tagger
    val e = intercept[IllegalArgumentException] {
      IngestFlow.start(spark, FileBus(s"$base/bus", "docs"), clashing,
        rules = Nil, lateDelay = "10 minutes",
        quarantinePath = s"$base/q", storePath = s"$base/s",
        corpusPath = s"$base/c", checkpoint = s"$base/ck")
    }
    assert(e.getMessage.contains("late"), s"guard must name the clash: $e")
  }

  test("payload fields shadowing kept wire metadata (offset) are rejected") {
    // `offset` is a very common event field; without the guard the stream
    // starts cleanly and crashes on the first micro-batch with a
    // duplicate-column error after decode
    val base = java.nio.file.Files.createTempDirectory("ingest_wc").toString
    val clashing = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("offset", LongType)))
    val e = intercept[IllegalArgumentException] {
      IngestFlow.start(spark, FileBus(s"$base/bus", "docs"), clashing,
        rules = Nil, lateDelay = "10 minutes",
        quarantinePath = s"$base/q", storePath = s"$base/s",
        corpusPath = s"$base/c", checkpoint = s"$base/ck")
    }
    assert(e.getMessage.contains("offset"), s"guard must name the clash: $e")
    // and parseJson itself refuses, for callers composing pipelines by hand
    import spark.implicits._
    val wire = Seq((Array[Byte](1), Array[Byte](2), "t", 0, 0L,
        java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val e2 = intercept[IllegalArgumentException] {
      EventBus.parseJson(wire, clashing, "_bus_ts")
    }
    assert(e2.getMessage.contains("offset"))
  }

  test("quarantine backfill through ingestBatch recovers the all-on-time corpus") {
    // The conservation law extended through RECOVERY: a flow that
    // quarantined late rows, followed by a batch replay of the quarantine
    // through StreamingDedup.ingestBatch, must converge to the same corpus
    // as a flow where every row arrived on time — and the replay must be
    // exactly-once (a second replay adds nothing; the store drops it).
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    def shifted(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val rules = Seq(Checks.Rule("has_id", col("doc_id").isNotNull))
    val docs = Seq(
      1L -> "alpha doc", 2L -> "alpha doc", // content dup
      3L -> "beta doc", 4L -> "delta doc", 5L -> "gamma doc")
    def json(d: (Long, String)) = s"""{"doc_id":${d._1},"text":"${d._2}"}"""

    // flow A: docs 1-3 on time, doc 4 sixty minutes behind the frontier
    // (→ quarantined), doc 5 on time
    val a = java.nio.file.Files.createTempDirectory("ingest_bf_a").toString
    val busA = FileBus(s"$a/bus", "docs")
    busA.append(spark, docs.take(3).map(d => s"p${d._1}" -> json(d)), 0L, t0)
    val qA = IngestFlow.start(spark, busA, docSchema, rules,
      lateDelay = "10 minutes", quarantinePath = s"$a/quarantine",
      storePath = s"$a/store", corpusPath = s"$a/corpus",
      checkpoint = s"$a/ckpt")
    try {
      qA.processAllAvailable()
      busA.append(spark, Seq("p4" -> json(docs(3))), 3L, shifted(-60))
      busA.append(spark, Seq("p5" -> json(docs(4))), 4L, shifted(1))
      qA.processAllAvailable()
    } finally if (qA.isActive) qA.stop()

    // flow B: the all-on-time reference run (same docs, no late arrival)
    val b = java.nio.file.Files.createTempDirectory("ingest_bf_b").toString
    val busB = FileBus(s"$b/bus", "docs")
    busB.append(spark, docs.map(d => s"p${d._1}" -> json(d)), 0L, t0)
    val qB = IngestFlow.start(spark, busB, docSchema, rules,
      lateDelay = "10 minutes", quarantinePath = s"$b/quarantine",
      storePath = s"$b/store", corpusPath = s"$b/corpus",
      checkpoint = s"$b/ckpt")
    try qB.processAllAvailable() finally if (qB.isActive) qB.stop()

    def texts(path: String) =
      spark.read.parquet(path).select("text").collect()
        .map(_.getString(0)).sorted.toSeq

    // before backfill, A is missing the quarantined doc
    assert(texts(s"$a/corpus") !== texts(s"$b/corpus"))

    // backfill: the quarantine IS directly replayable through the batch twin
    val dead = spark.read.parquet(s"$a/quarantine")
    StreamingDedup.ingestBatch(
      dead.select("doc_id", "text"), s"$a/store", s"$a/corpus")
    assert(texts(s"$a/corpus") === texts(s"$b/corpus"),
      "corpus after backfill must equal the all-on-time run")

    // exactly-once across a replayed backfill: the store anti-join drops it
    StreamingDedup.ingestBatch(
      dead.select("doc_id", "text"), s"$a/store", s"$a/corpus")
    assert(texts(s"$a/corpus") === texts(s"$b/corpus"),
      "a second replay of the same quarantine must be a no-op")
  }

  test("corpus snapshots pinned between ingest sessions survive further " +
    "ingest and backfill") {
    // the composition that makes training runs reproducible: snapshot the
    // corpus after an ingest session; later sessions and quarantine
    // backfills APPEND (the corpus discipline), so the pinned read is
    // byte-stable forever — "which corpus did this model train on" has an
    // answer even while ingestion continues
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 12:00:00")
    val rules = Seq(Checks.Rule("has_id", col("doc_id").isNotNull))
    def json(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val base = java.nio.file.Files.createTempDirectory("ingest_snap").toString
    val bus = FileBus(s"$base/bus", "docs")
    val corpus = s"$base/corpus"
    bus.append(spark, Seq("p1" -> json(1, "alpha"), "p2" -> json(2, "beta")),
      0L, t0)
    val q = IngestFlow.start(spark, bus, docSchema, rules,
      lateDelay = "10 minutes", quarantinePath = s"$base/q",
      storePath = s"$base/store", corpusPath = corpus,
      checkpoint = s"$base/ckpt")
    try {
      q.processAllAvailable()
      val snap = graft.sources.Lake.snapshot(spark, corpus)
      val pinned = graft.sources.Lake.readSnapshot(spark, corpus, snap)
        .select("text").collect().map(_.getString(0)).toSet
      assert(pinned === Set("alpha", "beta"))

      // ingestion continues — a later session and a batch backfill append
      bus.append(spark, Seq("p3" -> json(3, "gamma")), 2L, t0)
      q.processAllAvailable()
      import spark.implicits._
      StreamingDedup.ingestBatch(Seq((4L, "delta")).toDF("doc_id", "text"),
        s"$base/store", corpus)

      // the live corpus moved; the pinned read did not
      assert(spark.read.parquet(corpus).count() === 4)
      assert(graft.sources.Lake.readSnapshot(spark, corpus, snap)
        .select("text").collect().map(_.getString(0)).toSet === pinned,
        "a pinned snapshot must be byte-stable under continued ingestion")
      // and the delta since the snapshot is exactly the later arrivals
      assert(graft.sources.Lake.readAppendedSince(spark, corpus, snap)
        .select("text").collect().map(_.getString(0)).toSet
        === Set("gamma", "delta"))
    } finally if (q.isActive) q.stop()
  }

  test("quarantine writes are idempotent across micro-batch replays") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("quar").toString + "/q"
    val lateRows = Seq((4L, "delta doc"), (6L, "zeta doc"))
      .toDF("doc_id", "text")
    IngestFlow.quarantine(lateRows, path, batchId = 7L)
    // a replay of the SAME batch (gate threw after the write, offsets
    // uncommitted, foreachBatch re-runs with the same id) must replace its
    // partition, not append duplicates
    IngestFlow.quarantine(lateRows, path, batchId = 7L)
    val out = spark.read.parquet(path)
    assert(out.count() === 2, "replay duplicated the dead letter")
    // a DIFFERENT batch appends alongside
    IngestFlow.quarantine(Seq((9L, "eta doc")).toDF("doc_id", "text"),
      path, batchId = 8L)
    assert(spark.read.parquet(path).count() === 3)
    assert(spark.read.parquet(path)
      .select("ingest_batch").distinct().count() === 2)
  }
}
