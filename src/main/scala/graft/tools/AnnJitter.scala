package graft.tools

/** Why does ANN search executor-CPU wobble ±30% between idle benches on
  * unchanged plans (r13 judge refuting phantom regressions; r14 saw the
  * same flip between two back-to-back runs)? This harness runs each ANN
  * search N times in one JVM and prints PER-RUN executor CPU — if cpu
  * decays to a plateau the wobble is JIT warmup (the bench's single warm
  * run samples an arbitrary point on the decay curve); if it stays random
  * the cause is allocation/GC interplay and the bench should report a
  * trimmed statistic instead.
  *
  * Usage: runMain graft.tools.AnnJitter [sfDir] [runs]
  */
object AnnJitter {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          cpuNanos.addAndGet(st.stageInfo.taskMetrics.executorCpuTime); ()
        }
      })
    def settle(): Long = {
      var prev = -1L; var cur = cpuNanos.get; var i = 0
      while (cur != prev && i < 20) { Thread.sleep(50); prev = cur; cur = cpuNanos.get; i += 1 }
      cur
    }
    import org.apache.spark.sql.functions.col
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 20)
    val idx = graft.operators.IvfPq.build(vecs, dim = 64)
    val pqCb = graft.operators.Pq.train(vecs, dim = 64, m = 16, k = 16,
      sampleFraction = 0.5)
    val pqEnc = graft.operators.Pq.encode(vecs, pqCb).cache()
    pqEnc.count()
    val targets = Seq(
      "s_ivfpq_search" -> (() =>
        graft.operators.IvfPq.search(idx, queries, kNN = 5, nProbe = 4).count()),
      "s_pq_search" -> (() =>
        graft.operators.Pq.search(pqEnc, queries, pqCb, k = 5, shortlist = 64)
          .count()))
    targets.foreach { case (name, run) =>
      val cpu = (1 to runs).map { _ =>
        val c0 = settle(); run(); val c1 = settle(); (c1 - c0) / 1e9
      }
      println(f"[jitter] $name per-run cpu_s: " +
        cpu.map(c => f"$c%.3f").mkString(" "))
    }
    spark.stop()
  }
}
