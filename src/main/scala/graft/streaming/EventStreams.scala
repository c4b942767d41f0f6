package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming forms of the event-time operators (SURVEY §2.8). The reference is
  * wholly batch; these exist so the same feature expressions run under
  * Structured Streaming at 100 TB/day ingest — batch queries in
  * [[graft.queries.EventQueries]] are the oracle-verified equivalents.
  *
  * Every transform takes and returns a DataFrame, so it composes identically
  * over `spark.read` (batch backfill) and `spark.readStream` (live) — the
  * lambda architecture collapses to one code path.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event_type with a watermark for state
    * eviction. Late rows beyond the watermark are dropped, matching the
    * batch query's complete-data semantics on backfill.
    */
  def tumblingHourly(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding (hopping) windows via the native `window(ts, size, slide)` —
    * each event lands in size/slide windows; the streaming twin of the batch
    * explode-over-covering-starts query (e_sliding_hourly). */
  def slidingCounts(events: DataFrame, size: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("cnt"), col("sum_value"))

  /** Session windows with a 30-minute inactivity gap — the streaming twin of
    * the batch gaps-and-islands query (e_sessionize). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class Event(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class TaggedEvent(event_id: Long, user_id: Long, ts_ms: Long,
      late: Boolean, late_by_ms: Long)

  /** Late-data DEAD LETTER channel: tag every event with whether the
    * engine's stateful operators would DROP it as late — instead of losing
    * those rows silently (`withWatermark` + any stateful op simply filters
    * them), route them: `tagLate(...).filter(!_.late)` feeds the normal
    * pipeline, `.filter(_.late)` goes to a quarantine sink for
    * reconciliation/backfill.
    *
    * Implementation: a pass-through `flatMapGroupsWithState` whose state is
    * never written — it exists only to read `getCurrentWatermarkMs()`, the
    * SAME global frontier (max event time at the previous micro-batch −
    * delay) that drives the built-in late filters. Unlike aggregations and
    * dedup, fMGWS does NOT pre-filter late input rows (Spark leaves late
    * handling to the user function — spec-verified), so every row reaches
    * the tagger. A row is late iff its event time < the watermark — exactly
    * the batch rule `e_late_arrivals` oracles against DuckDB, and
    * `LateArrivalsSpec` locks this operator's tag set to both the batch
    * rule and the built-in dedup's drop set on the same replay. Keyed by
    * user only to parallelize; the verdict is key-independent.
    *
    * The input must carry `event_id`, `ts` (the watermarked column), and
    * `user_id`. Scale: stateless per row, no state-store growth (nothing is
    * ever `state.update`d), one shuffle on the grouping key. */
  def tagLate(events: DataFrame, delay: String): Dataset[TaggedEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("event_id").as[Long], col("user_id").as[Long],
        col("ts").as[java.sql.Timestamp])
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          rows.map { case (id, user, ts) =>
            if (ts == null) // same null-event-time dead-letter rule as tagLateRows
              TaggedEvent(id, user, 0L, late = true, late_by_ms = -1L)
            else {
              val tsMs = ts.getTime
              TaggedEvent(id, user, tsMs, late = tsMs < wm,
                late_by_ms = math.max(0L, wm - tsMs))
            }
          }
      }
  }
  /** Schema-preserving form of [[tagLate]] for composed pipelines: tags
    * EVERY input column's row with `late`/`late_by_ms` instead of projecting
    * down to the event id — the payload must survive to the quarantine sink,
    * or the dead letter is useless for reconciliation. Same mechanism
    * (pass-through `flatMapGroupsWithState` reading the global watermark,
    * state never written, no pre-filtering of late rows); grouped by a
    * content-hash column purely for parallelism — the verdict is
    * key-independent. The key MUST be deterministic across task
    * re-execution: `Row.hashCode` falls back to identity hashCode for
    * binary values, so under a stage retry rows could re-key into
    * different groups — duplicating or dropping rows and breaking the
    * conservation law [[IngestFlow]] advertises. `hash(...)` is
    * content-deterministic for every type it accepts; map-typed columns
    * (which it rejects) are simply excluded from the key.
    *
    * `tsCol` must be the watermarked TimestampType column. Scale: stateless
    * per row, one shuffle on the synthetic key. */
  def tagLateRows(events: DataFrame, tsCol: String, delay: String,
      parallelism: Int = 32): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, LongType}
    val inSchema = events.schema
    // withColumn would REPLACE an existing column of this name in place
    // (keeping the row width), so the positional key read below would be
    // out of bounds — fail with the clash named, like IngestFlow's guard
    require(!inSchema.fieldNames.contains("__graft_spread"),
      "tagLateRows reserves the column name __graft_spread for its " +
        "synthetic shuffle key; rename that input column")
    val outSchema = inSchema.add("late", BooleanType).add("late_by_ms", LongType)
    val tsIdx = inSchema.fieldIndex(tsCol)
    val hashable = inSchema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    val spreadKey =
      if (hashable.isEmpty) lit(0)
      else pmod(hash(hashable.toIndexedSeq: _*), lit(parallelism))
    val gIdx = inSchema.length // appended last, dropped before output
    events.withWatermark(tsCol, delay)
      .withColumn("__graft_spread", spreadKey)
      .groupByKey(r => r.getInt(gIdx))(Encoders.scalaInt)
      .flatMapGroupsWithState[Long, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[Row], state: GroupState[Long]) =>
          val wm = state.getCurrentWatermarkMs()
          rows.map { r =>
            val payload = r.toSeq.dropRight(1)
            val ts = r.getTimestamp(tsIdx)
            if (ts == null)
              // an unplaceable row (null event time) is dead-letter
              // material, not a query-killer: late with the -1 sentinel
              // (fMGWS does not pre-filter rows, so nulls DO reach here)
              Row.fromSeq(payload :+ true :+ -1L)
            else {
              val tsMs = ts.getTime
              Row.fromSeq(payload :+ (tsMs < wm) :+ math.max(0L, wm - tsMs))
            }
          }
      }(Encoders.scalaLong, Encoders.row(outSchema))
      .toDF()
  }

  /** `hash()` rejects MapType at any nesting depth — exclude such columns
    * from synthetic spread keys. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }

  /** NOTE: adding `ewma` changed this state schema — a checkpoint written by
    * the 4-field version fails the state-store compatibility check on
    * restart; resuming requires a fresh checkpoint (running state is
    * recomputed from the source, not migrated). */
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double,
      max_value: Double, ewma: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user aggregate
    * that survives across micro-batches (the KeyValueGroupedDataset path the
    * survey calls out for custom state). Production deployments add
    * `GroupStateTimeout.ProcessingTimeTimeout` + `state.setTimeoutDuration`
    * to bound state for quiet keys; omitted here because timeout wakeups
    * keep `processAllAvailable` from quiescing in tests.
    */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(userId, 0L, 0.0, Double.MinValue, Double.NaN))
          // full-precision sort: getTime alone truncates to ms and would
          // fold sub-ms neighbors in arrival order, breaking batch parity.
          // Ties on IDENTICAL timestamps remain arbitrary (Event carries no
          // id); the parity contract assumes unique per-user event times.
          val batch = rows.toSeq.sortBy(ev => (ev.ts.getTime, ev.ts.getNanos))
          // EWMA: the same seed-with-first, α=0.125 sequential fold as the
          // batch w_ewma query — the recurrent state IS the one double, the
          // state-store form of that fold. In-batch disorder is sorted here;
          // arrival is assumed per-user time-ordered ACROSS batches (the
          // reorder-tolerant variant composes the same watermark buffer as
          // StreamingInference.scoreWithReorder). Seeding is keyed on
          // n_events, NOT on NaN — a NaN data value must poison the average
          // exactly like the batch fold, not silently re-seed it.
          var seeded = prev.n_events > 0L
          var e = prev.ewma
          batch.foreach { ev =>
            if (!seeded) { e = ev.value; seeded = true }
            else e = 0.125 * ev.value + 0.875 * e
          }
          val next = UserStats(
            userId,
            prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum,
            math.max(prev.max_value, if (batch.isEmpty) prev.max_value
            else batch.map(_.value).max),
            e)
          state.update(next)
          next
      }
  }

  final case class UserQuantiles(user_id: Long, n: Long, p50: Double, p99: Double)

  /** Running per-user quantiles via a t-digest in keyed state — the
    * streaming twin of the batch sketch rollup (`a_tdigest_quantiles`):
    * each micro-batch folds its values into the user's ~KB digest and emits
    * refreshed p50/p99. State is the SERIALIZED digest, so a restart
    * resumes from the checkpoint with the full distribution summary intact;
    * estimates carry the same rank-error bound the batch spec pins
    * (TDigestSpec) — batch boundaries only move compression points, never
    * weight. */
  def runningUserQuantiles(events: Dataset[Event]): Dataset[UserQuantiles] = {
    import events.sparkSession.implicits._
    import graft.operators.TDigest
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Array[Byte], UserQuantiles](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val td = state.getOption.map(TDigest.deserialize)
            .getOrElse(TDigest.empty())
          // same in-batch event-time ordering contract as runningUserStats
          rows.toSeq.sortBy(ev => (ev.ts.getTime, ev.ts.getNanos))
            .foreach(ev => td.add(ev.value))
          state.update(td.serialize)
          UserQuantiles(userId, td.totalWeight.toLong,
            td.quantile(0.5), td.quantile(0.99))
      }
  }

  final case class UserDistinct(user_id: Long, est_distinct: Double)

  /** Streaming per-key distinct-count estimates via a theta sketch in the
    * state store — the set-cardinality member of the streaming sketch
    * family ([[runningUserStats]] counts, [[runningUserQuantiles]]
    * quantiles). State is the serialized sketch (bounded: ≤ k retained
    * hashes per key regardless of stream length); the update is
    * insert-if-below-threshold, so arrival order is irrelevant and a
    * checkpoint-resumed stream continues exactly. Distinctness is over
    * `event_type` here; any string key works the same way.
    *
    * The hash is BIT-IDENTICAL to SQL `xxhash64(string)` (same XXH64 over
    * the UTF-8 bytes, same seed 42), so these streaming sketches MERGE
    * with batch-built `ThetaSketch.thetaAgg(xxhash64(col))` sketches —
    * one sketch family across both halves of a lambda pipeline. */
  def runningUserDistinct(events: Dataset[Event],
      k: Int = 256): Dataset[UserDistinct] = {
    import events.sparkSession.implicits._
    import graft.operators.ThetaSketch
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Array[Byte], UserDistinct](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Array[Byte]]) =>
          val sk = state.getOption.map(ThetaSketch.deserialize)
            .getOrElse(ThetaSketch.empty(k))
          // null event_type is SKIPPED, matching the batch side's
          // ThetaSketch.hashCol null semantics (a bare getBytes would NPE
          // inside the state function and crash-loop the whole query on
          // one poisoned event)
          rows.foreach { ev =>
            if (ev.event_type != null) {
              val bytes = ev.event_type.getBytes(
                java.nio.charset.StandardCharsets.UTF_8)
              sk.update(org.apache.spark.sql.catalyst.expressions.XXH64
                .hashUnsafeBytes(bytes,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
                  bytes.length, 42L))
            }
          }
          state.update(sk.serialize)
          UserDistinct(userId, sk.estimate)
      }
  }

  /** Streaming exact dedup: drop events whose `dedup_key` was already seen,
    * with a watermark bounding the dedup state (keys older than the watermark
    * are evicted — the streaming twin of the batch md5 hash-groupBy dedup).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Stream-static enrichment: join the live stream against a broadcastable
    * dimension table (user profiles, play context). Static side is re-read
    * per micro-batch only if its source changes; no stream state involved.
    */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** Stream-STREAM interval join (attribution): match each right-side event
    * (`actions`: a_user_id, a_ts, ...) to left-side events (`impressions`:
    * user_id, ts, ...) of the same user at most `within` BEFORE it. Both
    * sides are watermarked — together with the time-range predicate that
    * bounds the join state Spark must retain (impressions older than
    * watermark + `within` are evicted). Inner join ⇒ Append mode. The batch
    * twin is the oracle-verified `e_interval_join` query: same predicate,
    * same results on complete data.
    */
  def attributeWithin(impressions: DataFrame, actions: DataFrame,
      within: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    impressions.withWatermark("ts", watermark)
      .join(actions.withWatermark("a_ts", watermark),
        expr(s"user_id = a_user_id AND ts < a_ts AND " +
          s"ts >= a_ts - INTERVAL $within"))

  /** foreachBatch sink: apply an arbitrary BATCH writer to each micro-batch —
    * the escape hatch for sinks without native streaming support (JDBC,
    * bucketed tables, multi-table fan-out). batchId enables exactly-once via
    * idempotent writes keyed on it.
    */
  def toBatchSink(df: DataFrame, name: String)(
      write: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.queryName(name)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) => write(batch.toDF(), batchId)
      }
      .start()

  /** Convenience: run any of the above on a memory sink and return the query
    * name for assertions (used by tests and demos). */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode): Unit = {
    df.writeStream.format("memory").queryName(name).outputMode(mode)
      .start().processAllAvailable()
  }
}
