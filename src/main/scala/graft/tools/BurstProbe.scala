package graft.tools

/** Measures the box's BURST-CONCURRENCY cpu-accounting factor — the
  * instrument behind BASELINE.md's box-class field (r17 verdict #4).
  *
  * NOTES_r17 §3 evidence: a FIXED 40-task plan burns 1.5–3.2× the executor
  * cpu at 32 concurrent threads vs 8 on an idle box of this VM class, while
  * the tight-loop calibration probe (no allocation) tracks only core speed
  * — the inflation lives in allocator/memory contention inside short
  * 32-wide stage bursts, so the probe that exposes it must ALLOCATE like a
  * real task (UnsafeRow buffers, strings), not just spin.
  *
  * Factor = (executor cpu of W work split across `cpus` concurrent tasks)
  *        / (`cpus` × executor cpu of W/cpus on ONE task).
  * Honest accounting ⇒ ~1.0; this VM class reads the burst inflation the
  * headline cpu totals carry, which is what lets BASELINE.md's pinned
  * cpu_total gate again: compare cpu_total / burst_factor across boxes.
  *
  *   scripts/run_tool.sh graft.tools.BurstProbe [itersPerTask]
  */
object BurstProbe {

  /** One task's allocation-heavy unit of work: byte-array + string churn
    * per iteration, the allocation profile of an agg/codegen task. Returns
    * a value so nothing folds away. */
  private def churn(iters: Long, salt: Long): Long = {
    var h = salt
    var i = 0L
    while (i < iters) {
      val a = new Array[Byte](((i + salt) % 48 + 16).toInt)
      a(0) = (i ^ h).toByte
      h ^= java.util.Arrays.hashCode(a)
      h += java.lang.Long.toString(h ^ i).length
      i += 1
    }
    h
  }

  /** Median-of-`runs` executor-cpu seconds for `parts` concurrent churn
    * tasks of `iters` iterations each, measured through the stage listener
    * (the same counter the bench adjudicates with). */
  def measure(spark: org.apache.spark.sql.SparkSession, parts: Int,
      iters: Long, runs: Int = 3): Double = {
    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        cpuNanos.addAndGet(st.stageInfo.taskMetrics.executorCpuTime)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def settled(): Long = {
      var prev = cpuNanos.get
      var i = 0
      while (i < 20) {
        Thread.sleep(30)
        val cur = cpuNanos.get
        if (cur == prev) i = 20 else { prev = cur; i += 1 }
      }
      prev
    }
    try {
      val samples = (1 to runs).map { _ =>
        val c0 = settled()
        spark.sparkContext.parallelize(0 until parts, parts)
          .map(p => churn(iters, p.toLong)).count()
        (settled() - c0) / 1e9
      }.sorted
      samples(runs / 2)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** The burst factor for this session's core count. PER-TASK work is
    * identical in both jobs (same `itersPerTask`), so honest cpu accounting
    * makes the wide job's total exactly `cpus ×` the single-task total and
    * the ratio reads 1.0. */
  def burstFactor(spark: org.apache.spark.sql.SparkSession,
      itersPerTask: Long = 2_000_000L): Double = {
    val cpus = spark.sparkContext.defaultParallelism
    measure(spark, 1, itersPerTask, runs = 1) // untimed warm (C2)
    measure(spark, cpus, itersPerTask, runs = 1)
    val single = measure(spark, 1, itersPerTask)
    val burst = measure(spark, cpus, itersPerTask)
    burst / (cpus * single)
  }

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toLong else 2_000_000L
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val cpus = spark.sparkContext.defaultParallelism
    measure(spark, 1, iters, runs = 1) // warm
    measure(spark, cpus, iters, runs = 1)
    val single = measure(spark, 1, iters)
    val burst = measure(spark, cpus, iters)
    println(f"[burstprobe] cpus=$cpus itersPerTask=$iters " +
      f"single_cpu_s=$single%.3f burst_cpu_s=$burst%.3f " +
      f"factor=${burst / (cpus * single)}%.3f (honest accounting = ~1.0)")
    spark.stop()
  }
}
