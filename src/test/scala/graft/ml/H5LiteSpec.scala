package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM HDF5 reader against the six committed Keras artifacts.
  * Ground-truth shapes and spot values were extracted from the raw bytes at
  * the documented HDF5 dataset offsets (scripts/lstm_fixture.py's
  * independent struct-level parser) — a byte-order, offset, or layout bug in
  * H5Lite shows up as a value mismatch here.
  */
class H5LiteSpec extends AnyFunSuite {

  private val modelsDir = "/root/reference/models"
  private val blind = s"$modelsDir/convergence_lstm_model_BlindPhysics_Completed_Pass.h5"

  test("reads every weight tensor of the BlindPhysics model with exact values") {
    val t = H5Lite.readFloatTensors(blind)
    def pick(layer: String, leaf: String): H5Lite.Tensor =
      t.collectFirst {
        case (p, x) if p.startsWith(s"/model_weights/$layer/") &&
          p.endsWith(s"/$leaf") => x
      }.get

    val k1 = pick("lstm_1", "kernel")
    assert(k1.dims === Seq(28, 256))
    assert(k1.data.head === 0.11456955224275589f)
    assert(k1.data.last === 0.030798256397247314f)
    val r1 = pick("lstm_1", "recurrent_kernel")
    assert(r1.dims === Seq(64, 256))
    assert(r1.data.head === -0.09011317789554596f)
    val b1 = pick("lstm_1", "bias")
    assert(b1.dims === Seq(256))
    assert(b1.data.head === 0.025273295119404793f)
    // trained forget-gate biases start at 1.0: their sum dominates the total
    assert(math.abs(b1.data.map(_.toDouble).sum - 62.32850646972656) < 1e-3)
    assert(pick("lstm_2", "kernel").dims === Seq(64, 128))
    assert(pick("dense_1", "kernel").dims === Seq(32, 16))
    val ok = pick("output", "kernel")
    assert(ok.dims === Seq(16, 1))
    assert(ok.data.head === -0.15961496531963348f)
    assert(pick("output", "bias").data.head === 0.08138200640678406f)
  }

  test("all six committed models load and their layers chain") {
    val expected = Map(
      "convergence_lstm_model_BlindPhysics_Completed_Pass.h5" -> 28,
      "convergence_lstm_model_Completed_Pass.h5" -> 28,
      "convergence_lstm_model_with_defender_sep_Completed_Pass.h5" -> 29,
      "truespeed_lstm_with_sep_at_catch.h5" -> 26,
      "truespeed_lstm_with_sep_at_catch_2.h5" -> 26,
      "truespeed_lstm_without_sep_at_catch.h5" -> 25)
    expected.foreach { case (name, nFeat) =>
      val m = KerasLstm.load(s"$modelsDir/$name")
      assert(m.nFeatures === nFeat, name)
      assert(m.lstm1.units === 64 && m.lstm2.units === 32, name)
      assert(m.hidden.nOut === 16 && m.out.nOut === 1, name)
    }
  }

  test("skips non-float and chunked content gracefully (optimizer scalars)") {
    val t = H5Lite.readFloatTensors(blind)
    // the Adam iteration counter is int64 — must not be surfaced as floats
    assert(!t.keys.exists(_.endsWith("/iteration")))
    // but the float32 learning-rate scalar is readable
    val lr = t.collectFirst { case (p, x) if p.endsWith("/learning_rate") => x }
    assert(lr.exists(x => x.dims.isEmpty && x.data.length == 1))
  }
}
