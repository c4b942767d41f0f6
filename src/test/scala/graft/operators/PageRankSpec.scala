package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap

  /** Reference power iteration in plain doubles (same formula, same K). */
  private def reference(edges: Seq[(String, String)], iters: Int,
      d: Double = 0.85): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(deg.contains).map(r).sum
      val in = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) / deg(e._1)).sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (in.getOrElse(v, 0.0) + dang / n))).toMap
    }
    r
  }

  test("two-node cycle converges to the uniform fixed point") {
    val got = ranks(Seq(("a", "b"), ("b", "a")), 20)
    assert(math.abs(got("a") - 0.5) < 1e-9 && math.abs(got("b") - 0.5) < 1e-9)
  }

  test("matches a plain-double power iteration on an asymmetric graph") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    val got = ranks(edges, 15)
    val ref = reference(edges, 15)
    assert(got.keySet === ref.keySet)
    // pico-unit rounding drifts ≤ K·n·5e-13 from the double iteration
    got.foreach { case (v, r) =>
      assert(math.abs(r - ref(v)) < 1e-8, s"$v: $r vs ${ref(v)}")
    }
    // c has the most in-links and must rank first
    assert(got.maxBy(_._2)._1 === "c")
  }

  test("dangling mass is redistributed: ranks still sum to ~1") {
    val got = ranks(Seq(("a", "b"), ("c", "b")), 12) // b has no out-edges
    assert(math.abs(got.values.sum - 1.0) < 1e-6, got.toString)
    assert(got("b") > got("a") && got("a") === got("c"))
    val ref = reference(Seq(("a", "b"), ("c", "b")), 12)
    got.foreach { case (v, r) => assert(math.abs(r - ref(v)) < 1e-8) }
  }

  test("multigraph: a doubled edge carries double weight") {
    val got = ranks(Seq(("a", "b"), ("a", "b"), ("a", "c")), 10)
    val ref = reference(Seq(("a", "b"), ("a", "b"), ("a", "c")), 10)
    got.foreach { case (v, r) => assert(math.abs(r - ref(v)) < 1e-8) }
    assert(got("b") > got("c"))
  }

  test("releases its intermediate caches: at most one O(|V|) block remains") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = PageRank.run(
      Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst"), 12)
    df.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"leaked ${after - before} cached RDDs (nodes/deg/round checkpoints)")
  }

  test("runUntilConverged exits early on a fast-mixing graph and is capped " +
    "on a slow one") {
    // the 2-cycle starts AT its fixed point (uniform): round 1's L1 delta
    // is exactly 0 pico-units, so any tol stops it immediately
    val (fastDf, fastRounds) = PageRank.runUntilConverged(
      Seq(("a", "b"), ("b", "a")).toDF("src", "dst"), tol = 1e-9,
      maxIterations = 50)
    val fast = fastDf.collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(fastRounds === 1, s"expected immediate convergence, ran $fastRounds")
    assert(math.abs(fast("a") - 0.5) < 1e-9 && math.abs(fast("b") - 0.5) < 1e-9)

    // an asymmetric graph far from uniform cannot reach a 1e-15 L1 delta in
    // 3 rounds: the cap fires, and the capped result is EXACTLY the
    // fixed-K result (the tol path must not perturb the iteration)
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    val (slowDf, slowRounds) = PageRank.runUntilConverged(
      edges.toDF("src", "dst"), tol = 1e-15, maxIterations = 3)
    assert(slowRounds === 3, s"cap must bound the iteration, ran $slowRounds")
    val slow = slowDf.collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    val fixedK = ranks(edges, 3)
    slow.foreach { case (v, r) => assert(r === fixedK(v), s"$v: $r vs ${fixedK(v)}") }
  }

  test("runs concurrently with an active streaming query (conf auto-isolation)") {
    // Round 10 guarded the conf scoping with require(no active streams);
    // the iteration now runs on a private newSession, so a live stream on
    // the caller's session must neither block PageRank nor be planned
    // under its scoped confs (shuffle partitions, AQE-off cuts).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)]
    val stream = input.toDF().toDF("k", "v")
      .groupBy("k").sum("v")
    val q = stream.writeStream.format("memory").queryName("pr_live_sink")
      .outputMode("complete").start()
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
      val got = ranks(edges, 15) // would have thrown under the old require
      val ref = reference(edges, 15)
      got.foreach { case (v, r) =>
        assert(math.abs(r - ref(v)) < 1e-8, s"$v: $r vs ${ref(v)}")
      }
      // the stream stayed live and still progresses afterwards
      input.addData((1L, 3.0))
      q.processAllAvailable()
      assert(spark.table("pr_live_sink").count() === 2)
      // and the caller session's confs were never touched
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    } finally q.stop()
  }

  test("empty edge list yields an empty result; zero iterations = uniform") {
    assert(PageRank.run(Seq.empty[(String, String)].toDF("src", "dst"), 5)
      .count() === 0)
    val uniform = ranks(Seq(("a", "b"), ("b", "c"), ("c", "a")), 0)
    uniform.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-9))
  }

  test("driver-local small-graph path is BIT-identical to the distributed iteration") {
    // multigraph with dangling nodes and uneven degrees — every arithmetic
    // branch of a round (dangling redistribution, weighted contributions,
    // rounding) exercised; the audit graph's shape (37×41 keys, dup edges)
    val edges = spark.range(400).selectExpr(
      "concat('n', id % 37) AS src", "concat('n', (id * 7) % 41) AS dst")
    def collectRanks(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r =>
        r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    val local = collectRanks(PageRank.run(edges, iterations = 8))
    val dist = collectRanks(PageRank.run(edges, iterations = 8,
      localMaxNodes = 0)) // force the distributed iteration
    assert(local.keySet === dist.keySet)
    local.foreach { case (v, r) =>
      // bit-identity, not tolerance: same pico-longs, same final division
      assert(java.lang.Double.doubleToLongBits(r) ===
        java.lang.Double.doubleToLongBits(dist(v)),
        s"$v: local $r != distributed ${dist(v)}")
    }
    // the convergence-terminated form too: same ranks AND same round count
    val (lDf, lRounds) = PageRank.runUntilConverged(edges, tol = 1e-6,
      maxIterations = 24)
    val (dDf, dRounds) = PageRank.runUntilConverged(edges, tol = 1e-6,
      maxIterations = 24, localMaxNodes = 0)
    assert(lRounds === dRounds,
      "the exact BIGINT stopping rule must fire on the same round")
    val (lr, dr) = (collectRanks(lDf), collectRanks(dDf))
    lr.foreach { case (v, r) =>
      assert(java.lang.Double.doubleToLongBits(r) ===
        java.lang.Double.doubleToLongBits(dr(v)), s"$v: $r vs ${dr(v)}")
    }
  }

  test("multigraph collapse runs at the CALLER's parallelism, not the " +
      "iteration scope's (r18 regression: a 1-partition collapse)") {
    // The r18 defect: the O(|E|) collapse executed inside the private
    // iteration session whose shuffle.partitions is scoped DOWN to the
    // collapsed frame's size, so the one data-scale pass of the whole
    // operator ran as a single task. This pins the fix: with the caller
    // session set to 5 shuffle partitions (AQE coalescing off so tiny test
    // data can't legally merge them), SOME stage of the run must execute
    // 5 tasks — the collapse's reduce side. Pre-fix, every stage ran at
    // the iteration scope's 1-2 partitions and this fails.
    val caller = spark.newSession()
    caller.conf.set("spark.sql.shuffle.partitions", "5")
    caller.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val edges = caller.range(0, 2000)
      .selectExpr("CAST(id % 53 AS STRING) AS src",
        "CAST((id * 7) % 53 AS STRING) AS dst")
    val taskCounts = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        taskCounts.add(e.stageInfo.numTasks); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // localMaxNodes = 0 forces the distributed path end-to-end, so the
      // iteration scope (the conf this test guards against leaking) exists
      PageRank.run(edges, iterations = 2, localMaxNodes = 0).count()
      // listener events deliver async — poll until the queue quiesces
      var prev = -1
      var i = 0
      while (i < 40 && taskCounts.size != prev) {
        prev = taskCounts.size; Thread.sleep(50); i += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    val counts = taskCounts.asScala.toSeq
    assert(counts.exists(_ >= 5),
      s"no stage ran at the caller's 5-partition parallelism — the collapse " +
        s"is executing inside the iteration scope again (stage task counts: " +
        s"${counts.sorted.mkString(",")})")
  }
}
