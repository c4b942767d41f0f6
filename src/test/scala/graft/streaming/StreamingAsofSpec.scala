package graft.streaming

import graft.SparkSpec
import graft.operators.AsofJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAsofSpec extends SparkSpec {
  import StreamingAsof._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val base = 1_700_000_000_000L

  // two keys, quotes and probes interleaved; includes an exact-tie (probe at
  // the same ms as a quote must match it — inclusive semantics) and probes
  // with no preceding quote
  private val quotes = Seq(
    Quote(1L, ts(base + 1000), 10.0), Quote(1L, ts(base + 5000), 11.0),
    Quote(1L, ts(base + 9000), 12.0), Quote(2L, ts(base + 2000), 20.0))
  private val probes = Seq(
    Probe(1L, ts(base + 500), 100L),  // before any quote -> no match
    Probe(1L, ts(base + 1000), 101L), // tie -> 10.0
    Probe(1L, ts(base + 7000), 102L), // -> 11.0
    Probe(1L, ts(base + 9500), 103L), // -> 12.0
    Probe(2L, ts(base + 8000), 104L), // -> 20.0
    Probe(3L, ts(base + 4000), 105L)) // key with no quotes -> no match

  private def batchExpected: Map[Long, (Option[Double], Option[Long])] = {
    import spark.implicits._
    AsofJoin.backward(
      probes.map(p => (p.k, p.ts.getTime, p.probe_id)).toDF("k", "t", "probe_id"),
      quotes.map(q => (q.k, q.ts.getTime, q.value)).toDF("k", "t", "value"),
      Seq("k"), "t", "t", Seq("value"), matchedTimeCol = "qt")
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> ((
        if (r.isNullAt(r.fieldIndex("value"))) None else Some(r.getAs[Double]("value")),
        if (r.isNullAt(r.fieldIndex("qt"))) None else Some(r.getAs[Long]("qt")))))
      .toMap
  }

  private def streamed(maxDelay: String)(
      feed: (MemoryStream[Probe], MemoryStream[Quote],
             () => Unit) => Unit): Map[Long, (Option[Double], Option[Long])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Probe]
    val qIn = MemoryStream[Quote]
    val name = s"asof_out_${System.nanoTime()}"
    val q = StreamingAsof.join(pIn.toDS(), qIn.toDS(), maxDelay)
      .writeStream.queryName(name).outputMode("append")
      .format("memory").start()
    try {
      feed(pIn, qIn, () => q.processAllAvailable())
      // sentinel far in the future on a throwaway key drains every buffer
      pIn.addData(Probe(99L, ts(base + 100_000_000L), 999L))
      qIn.addData(Quote(99L, ts(base + 100_000_000L), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("k") < 99).collect()
      .map(r => r.getAs[Long]("probe_id") -> ((
        Option(r.getAs[java.lang.Double]("value")).map(_.doubleValue),
        Option(r.getAs[java.lang.Long]("quote_tsMs")).map(_.longValue))))
      .toMap
  }

  test("in-order arrival matches the batch as-of join exactly") {
    val got = streamed("1 minute") { (p, q, tick) =>
      q.addData(quotes: _*); p.addData(probes: _*); tick()
    }
    assert(got === batchExpected)
  }

  test("shuffled cross-batch arrival still matches batch exactly") {
    // quotes arrive AFTER the probes that need them, across batches; the
    // whole 9.5 s event span sits inside the 1-minute reorder window, so
    // nothing is late — only reordered
    val got = streamed("1 minute") { (p, q, tick) =>
      p.addData(probes(2), probes(0)); q.addData(quotes(1)); tick()
      p.addData(probes(4), probes(1)); q.addData(quotes(0), quotes(3)); tick()
      p.addData(probes(5), probes(3)); q.addData(quotes(2)); tick()
    }
    assert(got === batchExpected)
  }

  test("quote buffer evicts dominated quotes but keeps the reigning one") {
    // after the watermark passes every quote, a later probe must still match
    // the latest quote (kept), while older quotes are gone from state
    val got = streamed("2 seconds") { (p, q, tick) =>
      q.addData(quotes: _*); tick()
      // push watermark way past the quotes with a sentinel, THEN probe
      q.addData(Quote(98L, ts(base + 60_000L), 0.0)); tick()
      p.addData(Probe(1L, ts(base + 70_000L), 300L)); tick()
    }
    assert(got(300L) === ((Some(12.0), Some(base + 9000))))
  }

  test("randomized volume: 300 probes / 200 quotes across 6 shuffled batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // all event times inside one hour, delay = 1 hour -> reordered, never
    // late. Quotes live on keys 0-7; probes draw from 0-8 so key 8 also
    // exercises the no-quotes-ever path at volume.
    val qRaw = Seq.tabulate(200)(i =>
      Quote(rnd.nextInt(8).toLong, ts(base + rnd.nextInt(3_600_000)), i.toDouble))
    // unique per (k, ts) as the contract requires: keep max value
    val qs = qRaw.groupBy(q => (q.k, q.ts.getTime)).map(_._2.maxBy(_.value)).toSeq
    val ps = Seq.tabulate(300)(i =>
      Probe(rnd.nextInt(9).toLong, ts(base + rnd.nextInt(3_600_000)), 1000L + i))

    val expected = AsofJoin.backward(
      ps.map(p => (p.k, p.ts.getTime, p.probe_id)).toDF("k", "t", "probe_id"),
      qs.map(q => (q.k, q.ts.getTime, q.value)).toDF("k", "t", "value"),
      Seq("k"), "t", "t", Seq("value"), matchedTimeCol = "qt")
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> ((
        if (r.isNullAt(r.fieldIndex("value"))) None else Some(r.getAs[Double]("value")),
        if (r.isNullAt(r.fieldIndex("qt"))) None else Some(r.getAs[Long]("qt")))))
      .toMap

    val mixedP = rnd.shuffle(ps).grouped(50).toSeq
    val mixedQ = rnd.shuffle(qs).grouped(34).toSeq
    val got = streamed("1 hour") { (p, q, tick) =>
      (0 until 6).foreach { i =>
        if (i < mixedP.size) p.addData(mixedP(i): _*)
        if (i < mixedQ.size) q.addData(mixedQ(i): _*)
        tick()
      }
    }
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("exact-boundary arrivals (ts == eviction watermark) are kept, not dropped") {
    // regression (round-5 ADVICE): `ms > wm` silently lost arrivals landing
    // exactly ON the operator's (eviction) watermark. Reachable in production
    // only for rows between the late-events and eviction watermarks (Spark's
    // upstream late filter is `ts <= previous watermark`), which the memory
    // harness can't stage — extra micro-batches equalize the two — so pin
    // the transition function directly with TestGroupState.
    import org.apache.spark.sql.streaming.TestGroupState
    val wm = base + 58_000L
    val state = TestGroupState.create[AsofState](
      org.apache.spark.api.java.Optional.empty[AsofState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(wm),
      hasTimedOut = false)
    val rows = Iterator(
      Tagged(1L, ts(wm), 0, -1L, 55.0),      // quote AT the watermark: kept
      Tagged(1L, ts(wm), 1, 500L, Double.NaN), // probe AT the wm: released now
      Tagged(1L, ts(wm - 1), 1, 501L, Double.NaN)) // strictly older: dropped
    val out = StreamingAsof.transition(1L, rows, state).toList
    assert(out === List(Matched(1L, 500L, wm, Some(55.0), Some(wm))))
    // the boundary quote must survive eviction as the dominating quote
    assert(state.get.quotes === Seq((wm, 55.0)))
  }

  test("arrivals behind the watermark are dropped, not mis-matched") {
    val got = streamed("2 seconds") { (p, q, tick) =>
      q.addData(quotes: _*); tick()
      q.addData(Quote(98L, ts(base + 60_000L), 0.0)); tick() // wm ~ +58 s
      // probe with ts far behind the watermark: its quote neighborhood may
      // already be evicted -> contract says drop
      p.addData(Probe(1L, ts(base + 3000), 400L)); tick()
    }
    assert(!got.contains(400L))
  }
}
