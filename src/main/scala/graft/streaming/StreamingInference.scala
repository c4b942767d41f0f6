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
  * Frames are assumed to arrive trajectory-ordered ACROSS batches (the
  * state cannot be rewound); out-of-order arrival within a batch is sorted
  * here, and event-time reordering beyond that belongs in an upstream
  * watermark buffer. Bit-parity with the batch path is asserted in
  * StreamingInferenceSpec: streamed predictions equal
  * [[KerasLstm.Model.forward]] on the same frames exactly.
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
