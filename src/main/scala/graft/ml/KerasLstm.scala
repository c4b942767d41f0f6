package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine forward-pass inference for the reference's convergence LSTM
  * (reference: bdb2026/models.py:24-67 — the exact architecture is
  * Masking(0.0) → LSTM(64, seq) → Dropout → LSTM(32, seq) → Dropout →
  * TimeDistributed(Dense(16, relu)) → TimeDistributed(Dense(1, linear));
  * dropout is identity at inference).
  *
  * Weights come straight from the committed Keras `.h5` artifacts via
  * [[H5Lite]] — no TensorFlow at runtime. The math is standard Keras LSTM
  * semantics: gate order [i, f, g, o] in the fused kernels, sigmoid
  * recurrent activation, tanh cell activation,
  *   z = x·W + h·R + b;  c = σ(z_f)∘c + σ(z_i)∘tanh(z_g);  h = σ(z_o)∘tanh(c)
  * computed in Float to mirror the reference's float32 tensors
  * (sequences.py:71 builds X as float32). Masking: a timestep whose feature
  * vector is entirely 0.0 is skipped — state carries through unchanged —
  * which is exactly how Keras Masking treats both tail padding and
  * interior all-zero rows.
  *
  * Scale shape: weights total ~36 k floats (~145 KB) and are broadcast once;
  * scoring is embarrassingly parallel over sequences — a whole-sequence
  * Scala UDF over the broadcast weights (the documented last-resort
  * imperative case, SURVEY §2.9(d): a recurrent forward pass is not
  * expressible as Catalyst expressions, and the unit of work is one
  * sequence, not one scalar — ~40 k flops per invocation).
  */
object KerasLstm {

  /** Fused Keras LSTM cell weights: kernel (nIn×4U), recurrent (U×4U),
    * bias (4U), gate columns ordered [i | f | g | o]. */
  final case class Cell(w: Array[Float], r: Array[Float], b: Array[Float],
      nIn: Int, units: Int) {
    require(w.length == nIn * 4 * units && r.length == units * 4 * units &&
      b.length == 4 * units, s"cell shape mismatch: nIn=$nIn units=$units")
  }

  /** Dense layer: kernel (nIn×nOut) + bias (nOut). */
  final case class Dense(w: Array[Float], b: Array[Float], nIn: Int, nOut: Int)

  /** The full recurrent state between two timesteps: hidden + cell vectors
    * of both LSTM layers plus the last emitted prediction (what a masked
    * step repeats). Immutable — each step returns a new one — so it can
    * live in a Structured Streaming state store for ONLINE inference
    * ([[graft.streaming.StreamingInference]]): the recurrence is naturally
    * incremental, one frame in → one prediction out, no sequence buffering.
    */
  final case class StepState(h1: Array[Float], c1: Array[Float],
      h2: Array[Float], c2: Array[Float], lastPred: Float, nSteps: Int)

  final case class Model(lstm1: Cell, lstm2: Cell, hidden: Dense, out: Dense) {
    def nFeatures: Int = lstm1.nIn

    /** Fresh pre-first-frame state. `lastPred` starts at the zero-state
      * bias path: a LEADING masked step carries the zero initial state, and
      * Keras' TimeDistributed head still computes over it — not 0. */
    def initState: StepState = StepState(
      new Array[Float](lstm1.units), new Array[Float](lstm1.units),
      new Array[Float](lstm2.units), new Array[Float](lstm2.units),
      out.forwardLinear(hidden.forwardRelu(new Array[Float](lstm2.units)))(0),
      0)

    /** Advance one timestep. An entirely-zero frame is masked: the state
      * carries through unchanged and the previous prediction repeats
      * (Keras Masking semantics, propagated through both layers). */
    def step(s: StepState, x: Array[Float]): StepState = {
      var allZero = true
      var k = 0
      while (allZero && k < x.length) { if (x(k) != 0f) allZero = false; k += 1 }
      if (allZero) s.copy(nSteps = s.nSteps + 1)
      else {
        val (h1, c1) = stepCell(lstm1, s.h1, s.c1, x)
        val (h2, c2) = stepCell(lstm2, s.h2, s.c2, h1)
        val pred = out.forwardLinear(hidden.forwardRelu(h2))(0)
        StepState(h1, c1, h2, c2, pred, s.nSteps + 1)
      }
    }

    /** Per-timestep predictions for one padded sequence; `seq` is
      * (T × nFeatures). Batch form of [[step]] — bit-identical. */
    def forward(seq: Array[Array[Float]]): Array[Float] = {
      val preds = new Array[Float](seq.length)
      var s = initState
      var t = 0
      while (t < seq.length) {
        s = step(s, seq(t))
        preds(t) = s.lastPred
        t += 1
      }
      preds
    }
  }

  private def sigmoid(x: Float): Float = (1.0 / (1.0 + math.exp(-x))).toFloat

  /** One Keras LSTM cell update: returns the new (h, c). Inputs untouched. */
  private def stepCell(cell: Cell, hPrev: Array[Float], cPrev: Array[Float],
      x: Array[Float]): (Array[Float], Array[Float]) = {
    val u = cell.units
    val z = new Array[Float](4 * u)
    System.arraycopy(cell.b, 0, z, 0, 4 * u)
    var k = 0
    while (k < cell.nIn) {
      val xv = x(k)
      if (xv != 0f) {
        val row = k * 4 * u
        var j = 0
        while (j < 4 * u) { z(j) += xv * cell.w(row + j); j += 1 }
      }
      k += 1
    }
    k = 0
    while (k < u) {
      val hv = hPrev(k)
      if (hv != 0f) {
        val row = k * 4 * u
        var j = 0
        while (j < 4 * u) { z(j) += hv * cell.r(row + j); j += 1 }
      }
      k += 1
    }
    val h = new Array[Float](u)
    val c = new Array[Float](u)
    var j = 0
    while (j < u) {
      val i = sigmoid(z(j))
      val f = sigmoid(z(u + j))
      val g = math.tanh(z(2 * u + j)).toFloat
      val o = sigmoid(z(3 * u + j))
      c(j) = f * cPrev(j) + i * g
      h(j) = o * math.tanh(c(j)).toFloat
      j += 1
    }
    (h, c)
  }

  implicit private class DenseOps(val d: Dense) extends AnyVal {
    def forwardRelu(x: Array[Float]): Array[Float] = apply(x, relu = true)
    def forwardLinear(x: Array[Float]): Array[Float] = apply(x, relu = false)
    private def apply(x: Array[Float], relu: Boolean): Array[Float] = {
      val y = d.b.clone()
      var k = 0
      while (k < d.nIn) {
        val xv = x(k)
        if (xv != 0f) {
          val row = k * d.nOut
          var j = 0
          while (j < d.nOut) { y(j) += xv * d.w(row + j); j += 1 }
        }
        k += 1
      }
      if (relu) { var j = 0; while (j < d.nOut) { if (y(j) < 0f) y(j) = 0f; j += 1 } }
      y
    }
  }

  /** Load a committed Keras model file. Matches datasets by their stable
    * layer-group names (`lstm_1`/`lstm_2`/`dense_1`/`output` directly under
    * /model_weights) — the inner auto-numbered names (dense_2 vs dense_4...)
    * vary between saves of the same architecture. */
  def load(path: String): Model = {
    val tensors = H5Lite.readFloatTensors(path)
    def find(layer: String, leaf: String): H5Lite.Tensor =
      tensors.collectFirst {
        case (p, t) if p.startsWith(s"/model_weights/$layer/") &&
          p.endsWith(s"/$leaf") => t
      }.getOrElse(sys.error(
        s"$path: no dataset /model_weights/$layer/**/$leaf " +
          s"(have: ${tensors.keys.toSeq.sorted.mkString(", ")})"))

    def cell(layer: String): Cell = {
      val w = find(layer, "kernel"); val r = find(layer, "recurrent_kernel")
      val b = find(layer, "bias")
      Cell(w.data, r.data, b.data, w.dims.head, w.dims(1) / 4)
    }
    def dense(layer: String): Dense = {
      val w = find(layer, "kernel"); val b = find(layer, "bias")
      Dense(w.data, b.data, w.dims.head, w.dims(1))
    }
    val m = Model(cell("lstm_1"), cell("lstm_2"), dense("dense_1"), dense("output"))
    require(m.lstm2.nIn == m.lstm1.units && m.hidden.nIn == m.lstm2.units &&
      m.out.nIn == m.hidden.nOut && m.out.nOut == 1,
      s"$path: layers do not chain (${m.lstm1.units}→${m.lstm2.nIn}, " +
        s"${m.lstm2.units}→${m.hidden.nIn}, ${m.hidden.nOut}→${m.out.nIn})")
    m
  }

  /** Score a padded-sequence table (the [[graft.bdb.Sequences.build]] output
    * contract: key columns + `seq_len: int` + `seq: array<array<double>>`)
    * → one row per REAL frame: key columns + `frame_idx` (1-based position
    * in the sequence, the reference's frame numbering at BDB_2026.ipynb
    * cell 107) + `predicted_converge_rate`.
    */
  def scoreSequences(seqs: DataFrame, model: Model,
      keyCols: Seq[String]): DataFrame = {
    val spark = seqs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val forward = udf { (seq: Seq[Seq[Double]], seqLen: Int) =>
      val arr = seq.iterator.take(seqLen)
        .map(_.iterator.map(_.toFloat).toArray).toArray
      bc.value.forward(arr).toSeq
    }
    seqs
      .withColumn("preds", forward(col("seq"), col("seq_len")))
      .select(keyCols.map(col) :+ posexplode(col("preds")): _*)
      .select(keyCols.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("frame_idx"),
        col("col").cast("double").as("predicted_converge_rate")): _*)
  }
}
