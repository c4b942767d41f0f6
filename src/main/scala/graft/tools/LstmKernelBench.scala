package graft.tools

/** Dev-only: single-threaded ns/frame of the raw LSTM forward kernel, no
  * Spark — the A/B harness for the SIMD path (SPARK_GRAFT_LSTM_SCALAR=1
  * forces the scalar loops in the same binary). Run both and divide. */
object LstmKernelBench {
  def main(args: Array[String]): Unit = {
    val model = graft.ml.KerasLstm.load(graft.queries.ModelQueries.modelPath)
    val nF = model.nFeatures
    val T = 120
    val rnd = new scala.util.Random(42)
    val seqs = Array.fill(64)(Array.fill(T * nF)(rnd.nextGaussian()))
    var sink = 0.0f
    def pass(): Unit = {
      var i = 0
      while (i < seqs.length) {
        val p = model.forwardFlat(seqs(i), T)
        sink += p(T - 1)
        i += 1
      }
    }
    (1 to 20).foreach(_ => pass()) // JIT warm
    val reps = 50
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => pass())
    val ns = (System.nanoTime() - t0).toDouble / (reps.toLong * seqs.length * T)
    println(f"[lstmkernel] vectorized=${graft.ml.KerasLstm.vectorized} " +
      f"${ns}%.0f ns/frame (sink=$sink)")
  }
}
