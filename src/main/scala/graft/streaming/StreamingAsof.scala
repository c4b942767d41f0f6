package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (temporal) join: enrich a stream of probes with the most
  * recent quote at-or-before each probe's event time, per key — the streaming
  * twin of [[graft.operators.AsofJoin]] and the operator Flink calls a
  * temporal join. Spark's built-in stream-stream joins can express "a quote
  * exists within Δ" ([[EventStreams.attributeWithin]]) but not "THE LATEST
  * quote before me": that argmax needs ordered state.
  *
  * Mechanics (one stateful operator — union the tagged sides, group by key,
  * `flatMapGroupsWithState`): quotes buffer into per-key state; probes wait
  * until the event-time watermark passes their timestamp — after that no
  * unseen earlier quote can exist, so each is matched (max quote time ≤ probe
  * time) and emitted, in event-time order. Append mode: each probe is emitted
  * exactly once, final.
  *
  * Emission boundary, precisely: a probe is releasable once the watermark
  * reaches its timestamp, and it is emitted in the first invocation of its
  * key after that — new data for the key, or the event-time timeout, which
  * Spark fires only when the watermark STRICTLY exceeds the registered
  * timestamp. A watermark that advances to exactly a probe's timestamp and
  * then never moves again (a stream going permanently silent) would leave
  * that one probe buffered; any further watermark movement flushes it.
  *
  * Bounded state, the part that matters at scale: once the watermark is at
  * `wm`, every future releasable probe has time > `wm`, so among quotes at or
  * before `wm` only the LATEST can ever match again — the rest are evicted
  * each invocation. State per key = 1 dominating quote + quotes/probes
  * younger than the watermark delay (∝ arrival rate × `maxDelay`).
  *
  * Contract mirrors the watermark rules everywhere else in this package:
  * arrivals (either side) STRICTLY older than the operator's current
  * (eviction) watermark are dropped — a late quote cannot retract an
  * already-emitted match (emission is final), and a late probe might need an
  * already-evicted quote, so silently best-effort matching it would be wrong
  * rather than just late. A row exactly ON the watermark is kept: a probe is
  * released immediately, a quote becomes the dominating quote. (Spark's own
  * late-event filter upstream additionally drops rows at-or-before the
  * PREVIOUS batch's watermark — `WatermarkSupport` builds LessThanOrEqual —
  * so the rows this operator adjudicates are those landing between the
  * late-events and eviction watermarks.)
  * Bit-parity with the batch [[graft.operators.AsofJoin.backward]] under
  * shuffled cross-batch arrival is asserted in StreamingAsofSpec.
  */
object StreamingAsof {

  final case class Probe(k: Long, ts: java.sql.Timestamp, probe_id: Long)
  final case class Quote(k: Long, ts: java.sql.Timestamp, value: Double)

  /** Union row: side 0 = quote, 1 = probe (quote sorts first on ties, making
    * the match inclusive, like the batch operator). */
  final case class Tagged(k: Long, ts: java.sql.Timestamp, side: Int,
      probe_id: Long, value: Double)

  final case class AsofState(quotes: Seq[(Long, Double)],
      pending: Seq[(Long, Long)]) // (tsMs, value) / (tsMs, probe_id)

  final case class Matched(k: Long, probe_id: Long, tsMs: Long,
      value: Option[Double], quote_tsMs: Option[Long])

  /** Join two (possibly streaming) typed sources. `maxDelay` is the shared
    * watermark delay: both the reorder tolerance and the emission latency.
    *
    * A key whose streams go quiet retains its one dominating quote
    * indefinitely — that is the operator's contract (a probe arriving a day
    * later still deserves its match), so total state is O(live keys). If the
    * key space itself is unbounded, compose a quote-TTL policy upstream
    * (filter quotes by age) rather than silently evicting here. */
  def join(probes: Dataset[Probe], quotes: Dataset[Quote],
      maxDelay: String): Dataset[Matched] = {
    val spark = probes.sparkSession
    import spark.implicits._
    val tagged = probes.map(p => Tagged(p.k, p.ts, 1, p.probe_id, Double.NaN))
      .unionByName(quotes.map(q => Tagged(q.k, q.ts, 0, -1L, q.value)))
    tagged
      .withWatermark("ts", maxDelay)
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsofState, Matched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(transition)
  }

  /** Per-key state transition — extracted so the watermark-boundary contract
    * is unit-testable with `TestGroupState` (the end-to-end harness cannot
    * reach it: extra micro-batches equalize the late-events and eviction
    * watermarks, so Spark's own `<=` pre-filter swallows boundary rows first).
    */
  private[streaming] def transition(k: Long, rows: Iterator[Tagged],
      state: GroupState[AsofState]): Iterator[Matched] = {
    val wm = state.getCurrentWatermarkMs()
    val prev = state.getOption.getOrElse(AsofState(Nil, Nil))
    // split arrivals; drop anything already strictly behind the watermark
    var quotesBuf = prev.quotes
    var pending = prev.pending
    rows.foreach { r =>
      val ms = r.ts.getTime
      // >= : only rows strictly OLDER than the watermark are late. An
      // exact-boundary probe is releasable immediately below; an
      // exact-boundary quote survives eviction as the dominating quote.
      if (ms >= wm) {
        if (r.side == 0) quotesBuf :+= ((ms, r.value))
        else pending :+= ((ms, r.probe_id))
      } // else: late past the watermark — dropped by contract
    }
    // release probes the watermark has passed, in event-time order
    val (rel, keep) = pending.partition(_._1 <= wm)
    val out = rel.sortBy(p => (p._1, p._2)).map { case (pts, pid) =>
      val m = quotesBuf.filter(_._1 <= pts)
        .sortBy(_._1).lastOption
      Matched(k, pid, pts, m.map(_._2), m.map(_._1))
    }
    // evict dominated quotes: of those at-or-before the watermark only
    // the latest can ever match a future (> wm) probe
    val (old, young) = quotesBuf.partition(_._1 <= wm)
    val kept = (old.sortBy(_._1).takeRight(1) ++ young).sortBy(_._1)
    if (keep.isEmpty && kept.isEmpty) state.remove()
    else {
      state.update(AsofState(kept, keep))
      // wake when the watermark passes the oldest buffered probe
      keep.map(_._1).filter(_ > wm).minOption
        .foreach(state.setTimeoutTimestamp)
    }
    out.iterator
  }
}
