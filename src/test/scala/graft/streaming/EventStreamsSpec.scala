package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumblingHourly aggregates per window/type over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    input.addData(
      EventStreams.Event(ts(5), 1L, "click", 1.0),
      EventStreams.Event(ts(10), 1L, "click", 2.0),
      EventStreams.Event(ts(15), 2L, "view", 5.0))
    val q = EventStreams.tumblingHourly(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable()
    val rows = spark.table("hourly")
      .orderBy("event_type").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("event_type") === "click")
    assert(rows(0).getAs[Long]("cnt") === 2L)
    assert(rows(0).getAs[Double]("sum_value") === 3.0)
    assert(rows(0).getAs[Timestamp]("hour_start").toString.contains("10:00:00"))
  }

  test("slidingCounts: every event lands in size/slide windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    input.addData(EventStreams.Event(ts(10), 1L, "click", 2.0))
    val q = EventStreams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sliding").orderBy("win_start").collect()
      assert(rows.length === 2) // 1h window, 30m slide → 2 covering windows
      assert(rows.forall(_.getAs[Long]("cnt") === 1L))
      assert(rows(0).getAs[Timestamp]("win_start").toString.contains("09:30:00"))
      assert(rows(1).getAs[Timestamp]("win_start").toString.contains("10:00:00"))
    } finally q.stop()
  }

  test("tumblingHourly drops events later than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.tumblingHourly(input.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Update()).start()
    try {
      // advance event time to 14:00 → watermark moves to 13:30
      input.addData(EventStreams.Event(
        Timestamp.valueOf("2024-01-01 14:00:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      // an event at 10:05 is far behind the watermark → dropped, its
      // hour bucket never appears
      input.addData(EventStreams.Event(ts(5), 2L, "late", 9.0))
      q.processAllAvailable()
      val types = spark.table("late_test").select("event_type")
        .as[String].collect().toSet
      assert(types === Set("click"))
    } finally q.stop()
  }

  test("sessionCounts splits on the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    // two bursts 40 minutes apart → two sessions for user 1. Session windows
    // only support Append mode: rows emit once the watermark passes the
    // session end, so a late flush event advances it.
    input.addData(
      EventStreams.Event(ts(0), 1L, "click", 1.0),
      EventStreams.Event(ts(5), 1L, "click", 1.0),
      EventStreams.Event(ts(45), 1L, "click", 1.0))
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    input.addData(EventStreams.Event(
      Timestamp.valueOf("2024-01-01 14:00:00"), 99L, "flush", 0.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").filter(col("user_id") === 1L)
      .orderBy("session_start").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n_events") === 2L)
    assert(rows(1).getAs[Long]("n_events") === 1L)
  }

  test("dedupStream drops repeated keys across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupStream(input.toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      EventStreams.Event(ts(1), 1L, "click", 1.0),
      EventStreams.Event(ts(1), 1L, "click", 1.0), // dup within batch
      EventStreams.Event(ts(2), 2L, "view", 2.0))
    q.processAllAvailable()
    input.addData(EventStreams.Event(ts(1), 1L, "click", 1.0)) // dup across batches
    q.processAllAvailable()
    val n = spark.table("deduped").count()
    q.stop()
    assert(n === 2)
  }

  test("enrich joins the stream against a static dim per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.enrich(input.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    input.addData(
      EventStreams.Event(ts(1), 1L, "click", 1.0),
      EventStreams.Event(ts(2), 9L, "view", 2.0)) // no dim row
    q.processAllAvailable()
    val rows = spark.table("enriched").orderBy("user_id").collect()
    q.stop()
    assert(rows(0).getAs[String]("tier") === "gold")
    assert(rows(1).isNullAt(rows(1).fieldIndex("tier"))) // left join preserved
  }

  test("toBatchSink applies a batch writer per micro-batch with batch ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.toBatchSink(input.toDF(), "sinktest") { (batch, id) =>
      seen.synchronized { seen += ((id, batch.count())) }
    }
    input.addData(EventStreams.Event(ts(1), 1L, "click", 1.0))
    q.processAllAvailable()
    input.addData(EventStreams.Event(ts(2), 1L, "view", 2.0),
      EventStreams.Event(ts(3), 2L, "view", 3.0))
    q.processAllAvailable()
    q.stop()
    val nonEmpty = seen.filter(_._2 > 0)
    assert(nonEmpty.map(_._2).sum === 3L)
    assert(nonEmpty.map(_._1).distinct.size === nonEmpty.size) // distinct batch ids
  }

  test("runningUserStats keeps state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("userstats")
      .outputMode(OutputMode.Update()).start()
    input.addData(EventStreams.Event(ts(1), 7L, "click", 2.0))
    q.processAllAvailable()
    input.addData(EventStreams.Event(ts(2), 7L, "click", 3.0),
      EventStreams.Event(ts(3), 8L, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("userstats")
      .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("tv"))
      .orderBy("user_id").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("n") === 2L) // user 7 accumulated across batches
    assert(rows(0).getAs[Double]("tv") === 5.0)
    assert(rows(1).getAs[Long]("n") === 1L)
  }

  test("runningUserDistinct: sketch state accumulates; hash matches batch xxhash64") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserDistinct(input.toDS())
      .writeStream.format("memory").queryName("userdistinct")
      .outputMode(OutputMode.Update()).start()
    input.addData(EventStreams.Event(ts(1), 7L, "click", 1.0),
      EventStreams.Event(ts(2), 7L, "click", 1.0)) // duplicate type
    q.processAllAvailable()
    input.addData(EventStreams.Event(ts(3), 7L, "view", 1.0),
      EventStreams.Event(ts(4), 7L, "purchase", 1.0),
      // null event_type must be SKIPPED (batch hashCol semantics), not NPE
      // the state function into a permanent crash loop on replay
      EventStreams.Event(ts(6), 7L, null, 1.0),
      EventStreams.Event(ts(5), 8L, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("userdistinct")
      .groupBy("user_id").agg(max("est_distinct").as("d"))
      .orderBy("user_id").collect()
    q.stop()
    assert(rows.length === 2)
    assert(rows(0).getDouble(1) === 3.0, // exact below k: click/view/purchase
      "user 7 must accumulate distinct types across micro-batches")
    assert(rows(1).getDouble(1) === 1.0)

    // the streaming update hashes bit-identically to SQL xxhash64, so a
    // stream-built sketch merges with a batch-built one: sketch the same
    // values both ways and compare the serialized bytes
    import graft.operators.ThetaSketch
    val vals = Seq("click", "view", "purchase")
    val batchSketch = ThetaSketch.deserialize(
      vals.toDF("v").agg(ThetaSketch.thetaAggK(256)(xxhash64(col("v"))))
        .head.getAs[Array[Byte]](0))
    val streamStyle = ThetaSketch.empty(256)
    vals.foreach { v =>
      val bytes = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      streamStyle.update(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L))
    }
    assert(batchSketch.serialize.toSeq === streamStyle.serialize.toSeq,
      "stream and batch paths must build the identical sketch")
  }

  test("runningUserStats ewma is bit-equal to the batch fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vals = Seq(2.0, 3.5, 1.25, 7.0, 4.75, 0.5)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      EventStreams.Event(ts(i + 1), 7L, "click", v) }
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserStats(input.toDS())
      .writeStream.format("memory").queryName("ewma_stats")
      .outputMode(OutputMode.Update()).start()
    // split across three micro-batches, shuffled INSIDE each batch (the
    // operator sorts in-batch; cross-batch order is the documented contract)
    input.addData(evs(1), evs(0)); q.processAllAvailable()
    input.addData(evs(3), evs(2)); q.processAllAvailable()
    input.addData(evs(5), evs(4)); q.processAllAvailable()
    val got = spark.table("ewma_stats").orderBy(col("n_events").desc)
      .select("ewma").head().getDouble(0)
    q.stop()
    val expected = vals.tail.foldLeft(vals.head)((acc, x) => 0.125 * x + 0.875 * acc)
    assert(got === expected) // exact double equality: identical fold
  }

  test("runningUserQuantiles: digest state accumulates across batches within rank bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic non-monotone values for one hot user + a control user
    val vals = (0 until 900).map(i => ((i * 7919) % 900).toDouble)
    val evs = vals.zipWithIndex.map { case (v, i) =>
      EventStreams.Event(ts(i + 1), 7L, "click", v) }
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.runningUserQuantiles(input.toDS())
      .writeStream.format("memory").queryName("user_q")
      .outputMode(OutputMode.Update()).start()
    // three micro-batches: state must carry the digest across them
    evs.grouped(300).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    input.addData(EventStreams.Event(ts(1000), 8L, "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("user_q")
      .groupBy("user_id").agg(max("n").as("n"), max_by(col("p50"), col("n")).as("p50"),
        max_by(col("p99"), col("n")).as("p99"))
      .orderBy("user_id").collect()
    q.stop()
    assert(rows.length === 2)
    val hot = rows(0)
    assert(hot.getAs[Long]("n") === 900L) // weight exact across batches
    val sorted = vals.sorted
    def rankErr(est: Double, qq: Double): Double = {
      val r = sorted.indexWhere(_ >= est) match { case -1 => sorted.size case i => i }
      math.abs(r - qq * sorted.size)
    }
    assert(rankErr(hot.getAs[Double]("p50"), 0.5) <= 0.02 * 900 + 1)
    assert(rankErr(hot.getAs[Double]("p99"), 0.99) <= 0.02 * 900 + 1)
    assert(rows(1).getAs[Long]("n") === 1L &&
      rows(1).getAs[Double]("p50") === 5.0)
  }

  test("attributeWithin: stream-stream interval join matches within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    final case class Imp(ts: Timestamp, user_id: Long, imp_id: Long)
    final case class Act(a_ts: Timestamp, a_user_id: Long, act_id: Long)
    val imps = MemoryStream[(Timestamp, Long, Long)]
    val acts = MemoryStream[(Timestamp, Long, Long)]
    val joined = EventStreams.attributeWithin(
      imps.toDF().toDF("ts", "user_id", "imp_id"),
      acts.toDF().toDF("a_ts", "a_user_id", "act_id"))
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    try {
      imps.addData((ts(0), 1L, 100L), (ts(30), 1L, 101L), (ts(0), 2L, 200L))
      acts.addData(
        (ts(5), 1L, 900L), // 5 min after imp 100 → matches it (not 101)
        (ts(35), 1L, 901L), // 5 min after imp 101 → matches it only
        (ts(20), 2L, 902L)) // 20 min after imp 200 → outside 10-min window
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("imp_id", "act_id").orderBy("act_id")
        .as[(Long, Long)].collect()
      assert(rows.toSeq === Seq((100L, 900L), (101L, 901L)))
    } finally q.stop()
  }
}
