package graft.streaming

import graft.SparkSpec
import graft.ml.KerasLstm
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Online LSTM inference over the committed weights: streamed predictions
  * must BIT-EQUAL the batch forward pass on the same frames, including when
  * a trajectory's frames are split across micro-batches (the state store
  * carries the recurrence over the batch boundary).
  */
class StreamingInferenceSpec extends SparkSpec {

  private lazy val model = KerasLstm.load(
    "/root/reference/models/convergence_lstm_model_BlindPhysics_Completed_Pass.h5")

  private def mkFrames(traj: Long, n: Int): Seq[StreamingInference.Frame] =
    (1 to n).map { f =>
      StreamingInference.Frame(traj, traj, traj, f.toLong,
        (0 until model.nFeatures).map(k =>
          math.sin(traj * 31 + f * 3 + k) * (if (k < 2) 40.0 else 2.0)))
    }

  test("streamed predictions bit-equal the batch forward pass across " +
    "micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t1 = mkFrames(1L, 9)
    val t2 = mkFrames(2L, 6)

    val input = MemoryStream[StreamingInference.Frame]
    val q = StreamingInference.start(input.toDF(), model, "online_preds",
      java.nio.file.Files.createTempDirectory("si_ckpt").toString)
    // split BOTH trajectories mid-sequence across the batch boundary —
    // frames 6..9 of t1 and 4..6 of t2 must resume from stored state
    input.addData(t1.take(5) ++ t2.take(3): _*)
    q.processAllAvailable()
    input.addData(t1.drop(5) ++ t2.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("online_preds")
      .as[StreamingInference.Scored].collect()
      .map(s => (s.game_id, s.frame_id) -> s.predicted_converge_rate).toMap
    assert(streamed.size === 15)

    Seq(1L -> t1, 2L -> t2).foreach { case (traj, frames) =>
      val batch = model.forward(
        frames.map(_.features.iterator.map(_.toFloat).toArray).toArray)
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(streamed((traj, f.frame_id)) === batch(i).toDouble,
          s"traj $traj frame ${f.frame_id}")
      }
    }
  }

  test("malformed frames fail fast with row context, not deep in the matmul") {
    import spark.implicits._
    val bad = Seq(StreamingInference.Frame(1L, 1L, 1L, 1L, Seq(1.0, 2.0))).toDS()
    val ex = intercept[Exception] {
      StreamingInference.score(bad, model).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m =>
      m.contains("2 features") && m.contains("expects 28")), messages(ex))
  }

  test("masked (all-zero) frames repeat the previous prediction online") {
    val frames = mkFrames(7L, 4)
    val withZero = frames.take(2) ++
      Seq(StreamingInference.Frame(7L, 7L, 7L, 3L,
        Seq.fill(model.nFeatures)(0.0))) ++ frames.drop(3)
    var st = model.initState
    val preds = withZero.map { f =>
      st = model.step(st, f.features.iterator.map(_.toFloat).toArray)
      st.lastPred
    }
    assert(preds(2) === preds(1), "masked frame must repeat")
    assert(preds(3) !== preds(2))
  }
}
