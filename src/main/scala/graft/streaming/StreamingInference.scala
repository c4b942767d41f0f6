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
  * Scale shape: state is O(1) per live trajectory (~800 bytes), weights are
  * a broadcast-sized closure constant, and each micro-batch shuffles only
  * its own frames on the trajectory key — the same exchange the batch
  * scorer pays once.
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

  /** Score a (possibly streaming) frame Dataset. Emits one [[Scored] ] row
    * per input frame, in Update mode. */
  def score(frames: Dataset[Frame], model: KerasLstm.Model): Dataset[Scored] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames
      .groupByKey(f => (f.game_id, f.play_id, f.nfl_id))
      .flatMapGroupsWithState[StoredState, Scored](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((g, p, n), newFrames, state: GroupState[StoredState]) =>
          var st = state.getOption.map(fromStored).getOrElse(model.initState)
          val out = newFrames.toSeq.sortBy(_.frame_id).map { f =>
            st = model.step(st, f.features.iterator.map(_.toFloat).toArray)
            Scored(g, p, n, f.frame_id, st.lastPred.toDouble)
          }
          state.update(toStored(st))
          out.iterator
      }
  }

  /** Start the streaming scorer writing to an in-memory sink (for demos /
    * tests); production sinks swap the format. */
  def start(frames: DataFrame, model: KerasLstm.Model, queryName: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = frames.sparkSession
    import spark.implicits._
    score(frames.as[Frame], model)
      .writeStream.queryName(queryName)
      .outputMode("update")
      .option("checkpointLocation", checkpointLocation)
      .format("memory")
      .start()
  }
}
