package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Dev-only: time named registry queries (median of 3 runs after warmup),
  * reporting per-query SHUFFLE WRITE BYTES alongside wall time — the number
  * that actually predicts 100 TB behavior for reduction operators like the
  * bloom semi-join (wall time at toy SF is launch-latency noise; shuffle
  * bytes scale with the data).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          st.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    // Shuffle-bytes A/B for the bloom semi-join reduction: the SAME
    // fact⋈dim-subset join with and without the probe-side bitset filter.
    // Equal row counts (the join kills false positives) with smaller shuffle
    // on the bloom side is the operator's entire value proposition.
    def measure(body: => Long): (Long, Long) = {
      body // warm
      shuffleBytes.set(0L)
      val n = body
      Thread.sleep(300)
      (n, shuffleBytes.get)
    }
    if (args.contains("bloom_compare")) {
      import org.apache.spark.sql.functions._
      val li = graft.sources.Tables.lineitem(spark, dir)
        .hint("SHUFFLE_HASH") // force a shuffled join both sides: the probe
      val supp = graft.sources.Tables.supplier(spark, dir) // reduction target
        .where(col("s_nationkey") === 7).select("s_suppkey", "s_name")
      val (nPlain, bPlain) = measure(
        li.join(supp, col("l_suppkey") === col("s_suppkey"), "inner").count())
      val (nBloom, bBloom) = measure(
        graft.operators.BloomJoin.inner(li, supp, "l_suppkey", "s_suppkey").count())
      require(nPlain == nBloom, s"bloom changed the result: $nPlain vs $nBloom")
      println(f"bloom_compare: rows $nPlain  plain ${bPlain / 1024.0}%.1f KiB  " +
        f"bloom ${bBloom / 1024.0}%.1f KiB  (${bPlain.toDouble / math.max(bBloom, 1)}%.1fx)")
    }
    args.foreach { name =>
      Registry.all.find(_.name == name).foreach { q =>
        q.run(spark, dir).count() // warmup
        val runs = (1 to 3).map { _ =>
          shuffleBytes.set(0L)
          val t0 = System.nanoTime()
          q.run(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // stage-completed events are delivered async
          (dt, shuffleBytes.get)
        }
        val times = runs.map(_._1).sorted
        val bytes = runs.map(_._2).max
        println(f"${q.name}%-28s median ${times(1)}%.3f s  " +
          f"shuffle ${bytes / 1024.0}%.1f KiB  (${times.mkString(", ")})")
      }
    }
    spark.stop()
  }
}
