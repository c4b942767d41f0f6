package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.io.Source

/** Forward-pass semantics pinned by a CROSS-IMPLEMENTATION fixture:
  * scripts/lstm_fixture.py implements the same architecture independently
  * (NumPy float32, its own HDF5 parser) over the same committed weights and
  * wrote src/test/resources/lstm_fixture.csv. Agreement across two unrelated
  * implementations of the published Keras equations (gate order, activations,
  * masking, float32 arithmetic) is the strongest available check: the
  * reference never published the per-frame model INPUTS, only its outputs,
  * so golden end-to-end parity is not derivable from public artifacts.
  */
class KerasLstmSpec extends SparkSpec {

  private val blind =
    "/root/reference/models/convergence_lstm_model_BlindPhysics_Completed_Pass.h5"
  private lazy val model = KerasLstm.load(blind)

  private lazy val fixture: Map[Int, Seq[(Array[Float], Float)]] = {
    val src = Source.fromFile("src/test/resources/lstm_fixture.csv")
    try {
      src.getLines().drop(1).map { line =>
        val Array(seqId, t, xs, y) = line.split(",", 4)
        (seqId.toInt, t.toInt, xs.split(";").map(_.toFloat), y.toFloat)
      }.toSeq.groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(r => (r._3, r._4))
      }
    } finally src.close()
  }

  test("forward pass matches the independent NumPy implementation per frame") {
    assert(fixture.size === 5)
    fixture.foreach { case (seqId, rows) =>
      val x = rows.map(_._1).toArray
      val expected = rows.map(_._2)
      val got = model.forward(x)
      expected.indices.foreach { t =>
        assert(math.abs(got(t) - expected(t)) < 1e-4f,
          s"seq $seqId frame $t: got ${got(t)}, fixture ${expected(t)}")
      }
    }
  }

  test("forwardFlat is bit-identical to forward (incl. masked steps and padding)") {
    fixture.foreach { case (seqId, rows) =>
      val seq = rows.map(_._1).toArray
      val nF = seq.head.length
      // pad to maxLen the way Sequences.build does: extra all-zero frames
      val maxLen = seq.length + 3
      val flat = new Array[Double](maxLen * nF)
      seq.zipWithIndex.foreach { case (x, t) =>
        x.zipWithIndex.foreach { case (v, k) => flat(t * nF + k) = v.toDouble }
      }
      val viaFlat = model.forwardFlat(flat, seq.length)
      val viaStep = model.forward(seq)
      assert(viaFlat.toSeq === viaStep.toSeq, // exact float equality: same op order
        s"seq $seqId: flat path diverged from step path")
    }
  }

  test("forwardFlatF (float boundary) is bit-identical to forwardFlat (double)") {
    fixture.foreach { case (seqId, rows) =>
      val seq = rows.map(_._1).toArray
      val nF = seq.head.length
      val maxLen = seq.length + 2
      val flatF = new Array[Float](maxLen * nF)
      seq.zipWithIndex.foreach { case (x, t) =>
        x.zipWithIndex.foreach { case (v, k) => flatF(t * nF + k) = v }
      }
      val flatD = flatF.map(_.toDouble)
      assert(model.forwardFlatF(flatF, seq.length).toSeq ===
        model.forwardFlat(flatD, seq.length).toSeq,
        s"seq $seqId: float boundary diverged from double boundary")
    }
  }

  test("extreme activations saturate to ±1, never NaN (exp-form tanh overflow guard)") {
    // features large enough to push gate pre-activations far past the
    // exp(2x) overflow point (x ≈ 355): Math.tanh returns ±1 there and the
    // exp form must too — one NaN would poison every later prediction
    val extreme = Array.fill(3)(Array.fill(model.nFeatures)(1e9f))
    val preds = model.forward(extreme)
    assert(preds.forall(p => !p.isNaN && !p.isInfinite), preds.toSeq.toString)
    // and the flat path agrees bit-for-bit under the same extremes
    val flat = extreme.flatten.map(_.toDouble)
    assert(model.forwardFlat(flat, 3).toSeq === preds.toSeq)
  }

  test("Masking(0.0): an all-zero timestep carries state — prediction repeats") {
    // fixture seq 3 has x[5] zeroed by construction
    val rows = fixture(3)
    assert(rows(5)._1.forall(_ == 0f))
    val got = model.forward(rows.map(_._1).toArray)
    assert(got(5) === got(4), "masked step must not advance the LSTM state")
    // and removing the masked step entirely leaves later frames unchanged
    val without = model.forward(
      (rows.take(5) ++ rows.drop(6)).map(_._1).toArray)
    rows.indices.drop(6).foreach { t =>
      assert(math.abs(got(t) - without(t - 1)) < 1e-7f, s"frame $t")
    }
  }

  test("a LEADING masked step emits the zero-state bias path, not 0.0") {
    // fixture seq 4 has x[0] zeroed: the carried state is the INITIAL zero
    // state, and Keras' TimeDistributed head still computes over it — the
    // output is dense(relu(dense(0))) (≈ the output bias), never literal 0
    val rows = fixture(4)
    assert(rows.head._1.forall(_ == 0f))
    val got = model.forward(rows.map(_._1).toArray)
    assert(got(0) !== 0f)
    assert(math.abs(got(0) - rows.head._2) < 1e-6f,
      s"leading masked frame: got ${got(0)}, fixture ${rows.head._2}")
  }

  test("tail zero-padding never changes real-frame predictions") {
    val x = fixture(1).map(_._1).toArray // 7 real frames
    val padded = x ++ Array.fill(18)(new Array[Float](model.nFeatures))
    val a = model.forward(x)
    val b = model.forward(padded)
    x.indices.foreach(t => assert(a(t) === b(t)))
  }

  test("scoreSequences: per-frame rows, 1-based frame_idx, only real frames") {
    import spark.implicits._
    val frames = (1 to 3).flatMap { traj =>
      (1 to (traj * 3)).map { f =>
        (traj.toLong, traj.toLong, traj.toLong, f.toLong,
          (0 until model.nFeatures).map(k => (f * 0.1 + k * 0.01)).toArray)
      }
    }.toDF("game_id", "play_id", "nfl_id", "frame_id", "feats")
    val wide = (0 until model.nFeatures).foldLeft(frames) { (d, k) =>
      d.withColumn(s"f$k", col("feats")(k))
    }.drop("feats")
    val seqs = graft.bdb.Sequences.build(
      wide, (0 until model.nFeatures).map(k => s"f$k"), maxLen = 25)
    val scored = KerasLstm.scoreSequences(seqs, model,
      Seq("game_id", "play_id", "nfl_id")).cache()
    assert(scored.count() === (3 + 6 + 9))
    val perTraj = scored.groupBy("game_id")
      .agg(count(lit(1)).as("n"), min("frame_idx").as("lo"), max("frame_idx").as("hi"))
      .orderBy("game_id").collect()
    perTraj.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) === (i + 1) * 3L)
      assert(r.getLong(2) === 1L && r.getLong(3) === (i + 1) * 3L)
    }
    assert(scored.filter(col("predicted_converge_rate").isNull).count() === 0)
  }

  test("scoreFlat(buildFlat) ≡ scoreSequences(build) bit-for-bit " +
      "(the m_lstm_infer de-padded fast path)") {
    import spark.implicits._
    val frames = (1 to 4).flatMap { traj =>
      (1 to (traj * 2 + 1)).map { f =>
        (traj.toLong, 0L, 0L, f.toLong,
          (0 until model.nFeatures).map(k =>
            (f * 0.07f + k * 0.013f + traj * 0.3f)).toArray)
      }
    }.toDF("game_id", "play_id", "nfl_id", "frame_id", "farr")
    val keys = Seq("game_id", "play_id", "nfl_id")
    val viaPadded = KerasLstm.scoreSequences(
      graft.bdb.Sequences.build(frames, Seq("farr"), maxLen = 7,
        valueType = "float"), model, keys)
      .orderBy("game_id", "frame_idx").collect()
    val viaFlat = KerasLstm.scoreFlat(
      graft.bdb.Sequences.buildFlat(frames, Seq("farr"), maxLen = 7,
        valueType = "float"), model, keys)
      .orderBy("game_id", "frame_idx").collect()
    assert(viaFlat.length === viaPadded.length)
    viaFlat.zip(viaPadded).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(3) === b.getLong(3))
      assert(java.lang.Double.doubleToLongBits(a.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(b.getDouble(4)),
        s"prediction diverged at game_id=${a.getLong(0)} frame=${a.getLong(3)}")
    }
  }

  test("LstmModel.predict joins predictions back onto frames positionally") {
    import spark.implicits._
    val feats = (0 until model.nFeatures).map(k => s"f$k")
    // 30 frames: the first 5 fall off the maxLen=25 tail window → null pred
    val frames0 = (1 to 30).map { f =>
      (7L, 7L, 7L, f.toLong, f * 0.01)
    }.toDF("game_id", "play_id", "nfl_id", "frame_id", "base")
    val frames = feats.zipWithIndex.foldLeft(frames0) { case (d, (c, k)) =>
      d.withColumn(c, col("base") + k * 0.001)
    }.drop("base").withColumn("converge_rate", col("f0") * 0.1)
    val m = new graft.bdb.LstmModel(blind, feats)
    val out = m.withResidual(frames).cache()
    assert(out.count() === 30)
    assert(out.filter(col("predicted_converge_rate").isNull).count() === 5)
    assert(out.filter(col("frame_id") <= 5 &&
      col("predicted_converge_rate").isNotNull).count() === 0)
    assert(out.filter(col("residual").isNotNull).count() === 25)
  }
}
