package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Locks the `e_late_arrivals` batch twin to REAL Structured Streaming
  * watermark semantics: replay an out-of-order sequence one row per
  * micro-batch through `withWatermark + dropDuplicates` (whose late filter
  * is row-level: drop iff eventTime < watermark), and assert the streaming
  * drop set equals the batch rule `tus < runningMaxExclusive(tus) − D`.
  * One row per micro-batch makes the stream's watermark advance row by
  * row — exactly the frontier the batch twin's window computes, because
  * Spark publishes `max(eventTime) − delay` only at batch boundaries. */
class LateArrivalsSpec extends SparkSpec {

  test("streaming dedup's late-drop set equals the batch running-max rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (event_id, event-time seconds) in ARRIVAL order; whole seconds so the
    // µs batch rule and Spark's ms watermark cannot disagree on boundaries
    val arrivals = Seq[(Long, Long)](
      (1L, 50L), (2L, 100L), (3L, 30L), (4L, 95L), (5L, 101L),
      (6L, 5L), (7L, 200L), (8L, 150L), (9L, 199L), (10L, 60L),
      (11L, 210L), (12L, 205L), (13L, 211L), (14L, 195L), (15L, 300L),
      (16L, 285L), (17L, 296L), (18L, 150L), (19L, 301L), (20L, 295L))
    val delaySec = 10L

    // batch rule (the e_late_arrivals definition, on this replay)
    var maxSoFar = Long.MinValue
    val expectDropped = arrivals.flatMap { case (id, sec) =>
      val late = maxSoFar != Long.MinValue && sec < maxSoFar - delaySec
      maxSoFar = math.max(maxSoFar, sec)
      if (late) Some(id) else None
    }.toSet
    assert(expectDropped.nonEmpty && expectDropped.size < arrivals.size,
      s"replay must mix kept and dropped rows, got $expectDropped")

    val input = MemoryStream[(Long, Long)]
    val kept = input.toDF().toDF("event_id", "sec")
      .withColumn("ts", col("sec").cast("timestamp"))
      .withWatermark("ts", s"$delaySec seconds")
      .dropDuplicates("event_id", "ts")
    val q = kept.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    try {
      // one row per micro-batch: the watermark advances after every row,
      // mirroring the batch twin's exclusive running max
      arrivals.foreach { r =>
        input.addData(r)
        q.processAllAvailable()
      }
    } finally q.stop()

    val keptIds = spark.table("late_sink")
      .select("event_id").as[Long].collect().toSet
    val streamDropped = arrivals.map(_._1).toSet -- keptIds
    assert(streamDropped === expectDropped,
      s"stream dropped $streamDropped, batch rule says $expectDropped")

    // The dead-letter tagger sees the SAME frontier: every row is emitted
    // (nothing silently dropped), and the tagged-late set equals both the
    // batch rule and the built-in dedup's drop set above
    val input2 = MemoryStream[(Long, Long, Long)]
    val tagged = EventStreams.tagLate(
      input2.toDF().toDF("event_id", "user_id", "sec")
        .withColumn("ts", col("sec").cast("timestamp"))
        .drop("sec"),
      s"$delaySec seconds")
    val q2 = tagged.writeStream.format("memory").queryName("late_tag_sink")
      .outputMode("append").start()
    try {
      arrivals.foreach { case (id, sec) =>
        input2.addData((id, id % 3, sec))
        q2.processAllAvailable()
      }
    } finally q2.stop()
    val out = spark.table("late_tag_sink")
    assert(out.count().toInt === arrivals.size,
      "tagLate must emit EVERY row, late ones included")
    val taggedLate = out.where(col("late"))
      .select("event_id").as[Long].collect().toSet
    assert(taggedLate === expectDropped,
      s"tagged-late $taggedLate, batch rule says $expectDropped")
    // lateness magnitude: late rows carry a positive late_by_ms, on-time
    // rows zero
    assert(out.where(col("late") && col("late_by_ms") <= 0).isEmpty)
    assert(out.where(!col("late") && col("late_by_ms") =!= 0).isEmpty)
  }

  test("tagLateRows handles binary and map payloads with a content-hash key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // binary payloads are the motivating case: Row.hashCode is IDENTITY
    // hashCode for Array[Byte], so the old synthetic key could re-key rows
    // across a stage retry; the hash()-column key is content-deterministic.
    // Map columns are the opposite edge: hash() REJECTS MapType, so they
    // must be excluded from the key without failing analysis.
    val input = MemoryStream[(Long, Array[Byte], Map[String, Long], Long)]
    val tagged = EventStreams.tagLateRows(
      input.toDF().toDF("event_id", "blob", "attrs", "sec")
        .withColumn("ts", col("sec").cast("timestamp"))
        .drop("sec"),
      "ts", "10 seconds")
    assert(!tagged.schema.fieldNames.contains("__graft_spread"),
      "synthetic spread key must not leak into the output schema")
    val q = tagged.writeStream.format("memory").queryName("bin_tag_sink")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, Array[Byte](1, 2, 3), Map("a" -> 1L), 100L),
        (2L, Array[Byte](4, 5), Map("b" -> 2L), 200L),
        (3L, Array[Byte](6), Map.empty[String, Long], 150L))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("bin_tag_sink")
    assert(out.count() === 3, "every row must be emitted")
    val blobs = out.select("event_id", "blob").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob").toSeq).toMap
    assert(blobs(1L) === Seq[Byte](1, 2, 3), "payload must survive untouched")
    assert(blobs(2L) === Seq[Byte](4, 5))
  }

  test("a null event time dead-letters with the -1 sentinel, not an NPE") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // java.lang.Long payload so a null sec survives the encoder
    val input = MemoryStream[(Long, Long, java.lang.Long)]
    val tagged = EventStreams.tagLateRows(
      input.toDF().toDF("event_id", "user_id", "sec")
        .withColumn("ts", col("sec").cast("timestamp"))
        .drop("sec"),
      "ts", "10 seconds")
    val q = tagged.writeStream.format("memory").queryName("null_ts_sink")
      .outputMode("append").start()
    try {
      input.addData((1L, 0L, java.lang.Long.valueOf(100L)),
        (2L, 1L, null: java.lang.Long))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("null_ts_sink")
    assert(out.count() === 2, "both rows must be emitted")
    val bad = out.where(col("event_id") === 2).head()
    assert(bad.getAs[Boolean]("late"), "unplaceable row must be tagged late")
    assert(bad.getAs[Long]("late_by_ms") === -1L, "-1 marks unknown lateness")
  }
}
