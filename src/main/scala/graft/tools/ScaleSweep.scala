package graft.tools

import graft.{Bench, GraftSession, JsonText}
import graft.queries.Registry

/** Scaling-exponent sweep of the sf1 heavy tail (r14 VERDICT #1): run each
  * heavy query at several ScaleGen'd data scales IN ONE JVM and record
  * steady-state executor cpu, wall, and shuffle-write bytes per scale, so
  * round-over-round NOTES can table measured scaling exponents instead of
  * arguing asymptotics. A query scaling worse than ~O(n log n) in cpu, or
  * shuffling super-linearly, is a scale bug to root-cause.
  *
  * Methodology: per query, plateau-warm at the SMALLEST scale (two
  * consecutive untimed cpu deltas within 10%, cap 8 — Bench §8a's rule, so
  * C2 compilation never lands in a timed window), then per scale one
  * untimed settle run + `runs` timed runs; the MIN cpu/wall of the timed
  * runs is recorded (contention-resistant). Same session for every cell:
  * plans differ only by file counts, JIT state is shared, and the
  * cross-JVM wobble rounds 12-14 fought cannot enter the table.
  *
  * Usage: runMain graft.tools.ScaleSweep <out.json> <label=dir> [label=dir ...]
  *        [-- query ...]   (default: Bench.Sf1Heavy)
  * Env: SPARK_GRAFT_SWEEP_RUNS (timed runs per cell, default 2);
  *      SPARK_GRAFT_SWEEP_ACTION=count|noop (default count — see the
  *      column-pruning note at the `consume` binding; registry-wide audits
  *      want noop).
  */
object ScaleSweep {

  def main(args: Array[String]): Unit = {
    val (front, back) = args.span(_ != "--")
    require(front.length >= 2,
      "usage: ScaleSweep <out.json> <label=dir> [label=dir ...] [-- query ...]")
    val outPath = front.head
    val dirs = front.tail.map { a =>
      val Array(l, d) = a.split("=", 2); (l, d)
    }.toSeq
    val queries = if (back.length > 1) back.tail.toSeq else Bench.Sf1Heavy
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.min(32).toString).toInt
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNanos = new java.util.concurrent.atomic.AtomicLong
    val shufBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          cpuNanos.addAndGet(st.stageInfo.taskMetrics.executorCpuTime)
          shufBytes.addAndGet(st.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def settle(): (Long, Long) = {
      var prev = (cpuNanos.get, shufBytes.get)
      var i = 0
      while (i < 20) {
        Thread.sleep(50)
        val cur = (cpuNanos.get, shufBytes.get)
        if (cur == prev) i = 20 else { prev = cur; i += 1 }
      }
      prev
    }
    def delta(body: => Unit): (Double, Long, Double) = {
      settle()
      val (c0, s0) = (cpuNanos.get, shufBytes.get)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      val (c1, s1) = settle()
      ((c1 - c0) / 1e9, s1 - s0, wall)
    }
    def warmToPlateau(run: () => Unit): Int = {
      var prev = -1.0
      var i = 0
      var stable = false
      while (i < 8 && !stable) {
        try {
          val (c, _, _) = delta(run())
          stable = prev >= 0 && math.abs(c - prev) <= 0.1 * math.max(prev, 1e-9)
          prev = c
        } catch { case _: Throwable => stable = true }
        i += 1
      }
      i
    }

    // out-of-window staging per dir (bucketed fact twins re-stage per
    // process; do it before any timed window, same rationale as Bench)
    dirs.foreach { case (_, d) =>
      try graft.queries.JoinQueries.bucketedFacts(spark, d)
      catch { case e: Throwable => System.err.println(s"[sweep] staging $d: $e") }
    }

    val byName = Registry.all.map(q => q.name -> q).toMap
    val runs = sys.env.getOrElse("SPARK_GRAFT_SWEEP_RUNS", "2").toInt
    // `count()` (the Bench-compatible default) lets Catalyst column-prune an
    // un-consumed projection/window to a shell plan — fine for the join/agg
    // heavy tail, wrong for a registry-wide audit where map-heavy queries
    // would time ~nothing at every scale and read as falsely flat. `noop`
    // materializes EVERY output column through Spark's no-op batch sink, so
    // the timed work is the real plan at each scale.
    val action = sys.env.getOrElse("SPARK_GRAFT_SWEEP_ACTION", "count")
    val consume: org.apache.spark.sql.DataFrame => Unit = action match {
      case "noop" => df => df.write.mode("overwrite").format("noop").save()
      case _      => df => { df.count(); () }
    }
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { name =>
      byName.get(name) match {
        case None => System.err.println(s"[sweep] no registry query named $name")
        case Some(q) =>
          GraftSession.tuneShuffleFor(spark, cpus, dirs.head._2)
          val warmed = warmToPlateau(() => consume(q.run(spark, dirs.head._2)))
          val cells = dirs.map { case (label, d) =>
            // each tier runs with the partition count a fresh session over
            // that tier would derive (env override respected) — the audit
            // measures the engine's own sizing, not a frozen local knob
            GraftSession.tuneShuffleFor(spark, cpus, d)
            val rec =
              try {
                delta(consume(q.run(spark, d))) // settle at this scale
                val timed = (1 to runs).map(_ => delta(consume(q.run(spark, d))))
                val cpu = timed.map(_._1).min
                val sh = timed.map(_._2).max
                val wall = timed.map(_._3).min
                f"""{"cpu_s":$cpu%.3f,"wall_s":$wall%.3f,"shuffle_mb":${sh / 1048576.0}%.1f}"""
              } catch { case e: Throwable =>
                s"""{"error":${JsonText.quote(e.getClass.getSimpleName + ": " +
                  String.valueOf(e.getMessage).take(120))}}"""
              }
            System.err.println(s"[sweep] $name @ $label -> $rec")
            s"""${JsonText.quote(label)}:$rec"""
          }
          rows(name) = cells.mkString("{", ",", s""","warm_runs":$warmed}""")
      }
    }
    val doc = rows.map { case (k, v) => s"""${JsonText.quote(k)}:$v""" }
      .mkString(s"""{"dirs":${dirs.map(d => JsonText.quote(d._2)).mkString("[", ",", "]")},"queries":{""", ",", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), doc)
    println(doc)
    spark.stop()
  }
}
