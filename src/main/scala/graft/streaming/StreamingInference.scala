package graft.streaming

import graft.ml.KerasLstm
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE sequence-model inference in Structured Streaming: tracking frames
  * arrive as a stream and every frame gets its convergence prediction
  * immediately — no waiting for the trajectory to finish, no sequence
  * buffering.
  *
  * This works because an LSTM forward pass is naturally incremental: the
  * whole recurrence between two frames is the fixed-size
  * [[KerasLstm.StepState]] (h/c of both layers + last prediction, ~200
  * floats), which lives in the streaming state store keyed by trajectory.
  * Each micro-batch advances each trajectory's state by its new frames
  * (ordered by frame_id within the batch) and emits one prediction per
  * frame — `flatMapGroupsWithState` in Update mode, the same tool the
  * sessionization operator uses (reference architecture: models.py's
  * batch `model.predict` has no streaming counterpart at all).
  *
  * Two entry points by arrival discipline: [[score]] emits immediately and
  * assumes frames arrive trajectory-ordered ACROSS batches (the state
  * cannot be rewound; in-batch disorder is sorted here);
  * [[scoreWithReorder]] tolerates arbitrary disorder within a watermark
  * delay by buffering per trajectory and releasing in frame order, at the
  * cost of that delay in emission latency. Bit-parity with the batch path
  * is asserted in StreamingInferenceSpec for BOTH: streamed predictions
  * equal [[KerasLstm.Model.forward]] on the same frames exactly, including
  * under cross-batch shuffling.
  *
  * Scale shape: state is O(1) per LIVE trajectory (~800 bytes) — finished
  * trajectories are evicted via the idle timeout (see `score`); weights are
  * broadcast once, and each micro-batch shuffles only its own frames on the
  * trajectory key — the same exchange the batch scorer pays once.
  */
object StreamingInference {

  final case class Frame(game_id: Long, play_id: Long, nfl_id: Long,
      frame_id: Long, features: Seq[Double])

  final case class Scored(game_id: Long, play_id: Long, nfl_id: Long,
      frame_id: Long, predicted_converge_rate: Double)

  /** Serializable state-store twin of [[KerasLstm.StepState]]. */
  final case class StoredState(h1: Seq[Float], c1: Seq[Float],
      h2: Seq[Float], c2: Seq[Float], lastPred: Float, nSteps: Int)

  private def toStored(s: KerasLstm.StepState): StoredState =
    StoredState(s.h1.toSeq, s.c1.toSeq, s.h2.toSeq, s.c2.toSeq,
      s.lastPred, s.nSteps)

  private def fromStored(s: StoredState): KerasLstm.StepState =
    KerasLstm.StepState(s.h1.toArray, s.c1.toArray, s.h2.toArray,
      s.c2.toArray, s.lastPred, s.nSteps)

  /** Score a (possibly streaming) frame Dataset. Emits one [[Scored]] row
    * per input frame, in Update mode.
    *
    * `idleTimeoutMs`: evict a trajectory's state after this long without
    * new frames — REQUIRED for unbounded production streams (trajectories
    * finish, their ~800 B of state must not accumulate forever). None uses
    * NoTimeout: state lives for the query's lifetime, fine for bounded
    * tests/demos (and the only mode under which `processAllAvailable`
    * quiesces deterministically).
    */
  def score(frames: Dataset[Frame], model: KerasLstm.Model,
      idleTimeoutMs: Option[Long] = None): Dataset[Scored] = {
    val spark = frames.sparkSession
    import spark.implicits._
    // broadcast once, like the batch scorer — a plain closure capture would
    // reserialize the ~145 KB of weights into every task of every batch
    val bc = spark.sparkContext.broadcast(model)
    val timeout = idleTimeoutMs.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    frames
      .groupByKey(f => (f.game_id, f.play_id, f.nfl_id))
      .flatMapGroupsWithState[StoredState, Scored](
        OutputMode.Update(), timeout) {
        case ((g, p, n), newFrames, state: GroupState[StoredState]) =>
          if (state.hasTimedOut) {
            state.remove() // trajectory went idle: evict, emit nothing
            Iterator.empty
          } else {
            val m = bc.value
            var st = state.getOption.map(fromStored).getOrElse(m.initState)
            val out = newFrames.toSeq.sortBy(_.frame_id).map { f =>
              require(f.features.size == m.nFeatures,
                s"frame ($g,$p,$n,${f.frame_id}): ${f.features.size} features, " +
                  s"model expects ${m.nFeatures}")
              st = m.step(st, f.features.iterator.map(_.toFloat).toArray)
              Scored(g, p, n, f.frame_id, st.lastPred.toDouble)
            }
            state.update(toStored(st))
            idleTimeoutMs.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** [[score]] input row plus an event-time timestamp, for the
    * out-of-order-tolerant path. */
  final case class TimedFrame(game_id: Long, play_id: Long, nfl_id: Long,
      frame_id: Long, ts: java.sql.Timestamp, features: Seq[Double])

  final case class PendingFrame(frame_id: Long, tsMs: Long,
      features: Seq[Double])

  /** [[StoredState]] plus the reorder buffer: frames not yet releasable
    * (their event time is still above the watermark), the last frame
    * actually scored (the recurrence cannot rewind behind it), and the
    * max event time seen (drives idle eviction in EVENT time). */
  final case class OrderedState(stored: StoredState,
      pending: Seq[PendingFrame], lastScoredFrame: Long, lastEventMs: Long)

  /** Out-of-order-tolerant online scoring: [[score]] assumes frames arrive
    * trajectory-ordered ACROSS micro-batches; this variant removes that
    * assumption by composing a per-trajectory watermark reorder buffer INTO
    * the same stateful operator (one `flatMapGroupsWithState`, one shuffle,
    * one state store — chaining two stateful operators is both restricted
    * in streaming and strictly more expensive).
    *
    * Mechanics per trajectory: arriving frames go to a pending buffer;
    * once the event-time watermark (`withWatermark(ts, maxDelay)`) passes a
    * frame's timestamp it can no longer be preceded by an unseen earlier
    * frame, so all such frames are released IN frame_id ORDER through the
    * recurrent state and their predictions emitted. `EventTimeTimeout`
    * wakes the group when the watermark passes its oldest pending frame,
    * so buffered frames release even when no new data arrives for the key.
    *
    * Guarantees and their price:
    *  - any arrival disorder within `maxDelay` yields BIT-equal output to
    *    the batch forward pass (asserted in StreamingInferenceSpec under
    *    cross-batch shuffling);
    *  - a frame arriving later than `maxDelay` after its event time is
    *    DROPPED if its slot was already passed (`frame_id <=
    *    lastScoredFrame` — the recurrence cannot rewind), the standard
    *    watermark contract;
    *  - emission latency is `maxDelay` (predictions wait out the reorder
    *    window) — the immediate-emit [[score]] remains the right choice
    *    for feeds that ARE ordered.
    *
    * `idleGapMs` (event-time): evict a trajectory's state once the
    * watermark is that far past its newest frame. State is O(1) per live
    * trajectory plus the bounded pending buffer (≤ maxDelay's worth of
    * frames). */
  def scoreWithReorder(frames: Dataset[TimedFrame], model: KerasLstm.Model,
      maxDelay: String, idleGapMs: Option[Long] = None): Dataset[Scored] = {
    val spark = frames.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    frames
      .withWatermark("ts", maxDelay)
      .groupByKey(f => (f.game_id, f.play_id, f.nfl_id))
      .flatMapGroupsWithState[OrderedState, Scored](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((g, p, n), newFrames, state: GroupState[OrderedState]) =>
          val m = bc.value
          val wm = state.getCurrentWatermarkMs()
          val prev = state.getOption.getOrElse(OrderedState(
            toStored(m.initState), Nil, Long.MinValue, Long.MinValue))
          val incoming = newFrames.map { f =>
            require(f.features.size == m.nFeatures,
              s"frame ($g,$p,$n,${f.frame_id}): ${f.features.size} features, " +
                s"model expects ${m.nFeatures}")
            PendingFrame(f.frame_id, f.ts.getTime, f.features)
          }.toSeq
          val all = prev.pending ++ incoming
          val (releasable, pending) = all.partition(_.tsMs <= wm)
          var st = fromStored(prev.stored)
          var lastScored = prev.lastScoredFrame
          val out = releasable.sortBy(_.frame_id).flatMap { f =>
            if (f.frame_id <= lastScored) None // slot already passed: drop
            else {
              st = m.step(st, f.features.iterator.map(_.toFloat).toArray)
              lastScored = f.frame_id
              Some(Scored(g, p, n, f.frame_id, st.lastPred.toDouble))
            }
          }
          val lastEventMs = (prev.lastEventMs +: all.map(_.tsMs)).max
          val idleDeadline = idleGapMs.map(gap => lastEventMs + gap)
          if (pending.isEmpty && idleDeadline.exists(_ <= wm)) {
            state.remove() // trajectory idle past the gap: evict
          } else {
            state.update(OrderedState(toStored(st), pending, lastScored,
              lastEventMs))
            // wake when the watermark passes the oldest buffered frame or
            // the idle deadline; candidates at-or-below the watermark are
            // excluded (setTimeoutTimestamp rejects them — and with frames
            // still pending, the pending min is the wake-up that matters)
            val wake = (pending.map(_.tsMs) ++ idleDeadline)
              .filter(_ > wm).minOption
            wake.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }

  /** Start the streaming scorer writing to an in-memory sink (for demos /
    * tests); production sinks swap the format. `idleTimeoutMs` is threaded
    * to [[score]] — set it on unbounded production streams (state eviction);
    * the None default keeps the memory-sink/test path deterministic under
    * `processAllAvailable`. */
  def start(frames: DataFrame, model: KerasLstm.Model, queryName: String,
      checkpointLocation: String,
      idleTimeoutMs: Option[Long] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = frames.sparkSession
    import spark.implicits._
    score(frames.as[Frame], model, idleTimeoutMs)
      .writeStream.queryName(queryName)
      .outputMode("update")
      .option("checkpointLocation", checkpointLocation)
      .format("memory")
      .start()
  }
}
