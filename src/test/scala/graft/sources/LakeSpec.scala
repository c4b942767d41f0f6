package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

class LakeSpec extends SparkSpec {

  /** Counts shuffle exchanges, descending through AQE wrappers (an
    * AdaptiveSparkPlanExec hides its materialized stages from `children`). */
  private def countShuffles(plan: SparkPlan): Int = plan match {
    case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
    case q: QueryStageExec => countShuffles(q.plan)
    case e: ShuffleExchangeLike => 1 + e.children.map(countShuffles).sum
    case other => other.children.map(countShuffles).sum
  }

  test("co-bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong % 50, s"r$i")).toDF("k", "rv")
    Lake.writeBucketed(left, "lake_left", Seq("k"), 8)
    Lake.writeBucketed(right, "lake_right", Seq("k"), 8)
    // disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Lake.read(spark, "lake_left")
        .join(Lake.read(spark, "lake_right"), Seq("k"))
      joined.count() // force planning + execution
      val shuffles = countShuffles(joined.queryExecution.executedPlan)
      assert(shuffles === 0, s"expected bucketed join without exchange, got $shuffles")
      // and the same join on raw frames DOES shuffle
      val raw = left.join(right, Seq("k"))
      raw.count()
      assert(countShuffles(raw.queryExecution.executedPlan) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS lake_left")
      spark.sql("DROP TABLE IF EXISTS lake_right")
    }
  }

  test("partition columns prune whole directories at scan time") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    (1 to 300).map(i => (i % 12 + 1, i.toLong, i * 1.5))
      .toDF("month", "id", "v")
      .write.partitionBy("month").parquet(path)
    val filtered = spark.read.parquet(path).filter(col("month") === 3)
    filtered.count()
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined)
    assert(scan.get.partitionFilters.nonEmpty, "partition filter not pushed")
    // only month=3's files are actually read (inputFiles ignores pruning, so
    // use the scan's numFiles metric vs the total on disk)
    val totalFiles = spark.read.parquet(path).inputFiles.length
    val readFiles = scan.get.metrics("numFiles").value
    assert(readFiles < totalFiles,
      s"expected pruning: read $readFiles of $totalFiles files")
  }

  test("zorderWrite narrows per-file ranges in BOTH dimensions") {
    import spark.implicits._
    // uniform grid over (a, b): a row's a and b are independent
    val df = (0 until 4096).map(i => (i % 64, i / 64, i.toLong))
      .toDF("a", "b", "id")
    val zpath = java.nio.file.Files.createTempDirectory("zord").toString + "/z"
    val plainPath = java.nio.file.Files.createTempDirectory("zord").toString + "/p"
    Lake.zorderWrite(df, zpath, "a", "b", nFiles = 8)
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.parquet(plainPath) // sorted by a only

    def avgSpanPerFile(path: String, c: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).head().getDouble(0)
      spans
    }
    // plain a-sort: b-span per file ≈ full range (63); z-order: both bounded
    val zA = avgSpanPerFile(zpath, "a")
    val zB = avgSpanPerFile(zpath, "b")
    val pB = avgSpanPerFile(plainPath, "b")
    assert(zB < pB * 0.7, s"z-order b-span $zB should beat a-sorted $pB")
    assert(zA < 63.0, s"z-order a-span $zA should also be bounded")
  }

  test("zorderWrite on 3 columns narrows per-file ranges in ALL dimensions") {
    import spark.implicits._
    // uniform 16x16x16 grid: a, b, c independent
    val df = (0 until 4096).map(i => (i % 16, (i / 16) % 16, i / 256, i.toLong))
      .toDF("a", "b", "c", "id")
    val zpath = java.nio.file.Files.createTempDirectory("zord3").toString + "/z"
    val plainPath = java.nio.file.Files.createTempDirectory("zord3").toString + "/p"
    Lake.zorderWrite(df, zpath, Seq("a", "b", "c"), nFiles = 8, bits = 12)
    df.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.parquet(plainPath) // sorted by a only

    def avgSpanPerFile(path: String, c: String): Double =
      spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg("span")).head().getDouble(0)

    // a-sorted layout leaves b and c spans at ~full range (15); z-order
    // bounds every dimension (each contributes bits/3 of the leading key)
    val pB = avgSpanPerFile(plainPath, "b")
    val pC = avgSpanPerFile(plainPath, "c")
    for (dim <- Seq("b", "c")) {
      val z = avgSpanPerFile(zpath, dim)
      val p = if (dim == "b") pB else pC
      assert(z < p * 0.7, s"3-dim z-order $dim-span $z should beat a-sorted $p")
    }
    assert(avgSpanPerFile(zpath, "a") < 15.0, "a-span should also be bounded")
  }

  test("upsertByKey replaces matching keys and appends new ones") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_up").toString + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v").write.parquet(path)
    Lake.upsertByKey(spark,
      path, Seq((2L, "b2", 20.0), (9L, "new", 9.0)).toDF("id", "name", "v"),
      Seq("id"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0),
      (9L, "new", 9.0)))

    // partition-pruned variant: untouched rows outside `where` survive
    Lake.upsertByKey(spark,
      path, Seq((3L, "c3", 30.0)).toDF("id", "name", "v"),
      Seq("id"), where = Some(col("id") >= 3))
    val out2 = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(out2 === Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c3", 30.0),
      (9L, "new", 9.0)))
  }

  test("upsertByKey keeps rows whose `where` predicate evaluates NULL") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_upn").toString + "/t"
    // row 3 has a NULL grp: `grp = 'a'` and `NOT (grp = 'a')` are BOTH
    // non-true for it — a naive filter pair deletes it from the table
    Seq((1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, None, 3.0))
      .toDF("id", "grp", "v").write.parquet(path)
    Lake.upsertByKey(spark,
      path, Seq((1L, Some("a"), 10.0)).toDF("id", "grp", "v"),
      Seq("id"), where = Some(col("grp") === "a"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, Option[String], Double)].collect().toSeq
    assert(out === Seq((1L, Some("a"), 10.0), (2L, Some("b"), 2.0),
      (3L, None, 3.0)), "NULL-predicate row must survive the upsert")
  }

  test("upsertByKey replaces an out-of-scope old row an in-scope update targets") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_upd").toString + "/t"
    // row 3's grp is NULL (outside scope grp='a'); the update brings key 3
    // INTO scope — the old version must be replaced, not kept alongside
    // (which would duplicate the key). Same for a plain out-of-scope row.
    Seq((1L, Some("a"), 1.0), (3L, Option.empty[String], 3.0),
      (4L, Some("b"), 4.0)).toDF("id", "grp", "v").write.parquet(path)
    Lake.upsertByKey(spark,
      path, Seq((3L, Some("a"), 30.0), (4L, Some("a"), 40.0))
        .toDF("id", "grp", "v"),
      Seq("id"), where = Some(col("grp") === "a"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, Option[String], Double)].collect().toSeq
    assert(out === Seq((1L, Some("a"), 1.0), (3L, Some("a"), 30.0),
      (4L, Some("a"), 40.0)), "keys 3 and 4 must appear exactly once, updated")
  }

  test("upsertByKey rejects updates outside the `where` scope") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_ups").toString + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "grp", "v")
      .write.parquet(path)
    // update targets grp='b' but the rewrite scope is grp='a': the old row 2
    // would survive in `untouched` AND reappear via updates → duplicate key.
    val ex = intercept[IllegalArgumentException] {
      Lake.upsertByKey(spark,
        path, Seq((2L, "b", 20.0)).toDF("id", "grp", "v"),
        Seq("id"), where = Some(col("grp") === "a"))
    }
    assert(ex.getMessage.contains("outside the `where` scope"))
    // and the table is untouched
    assert(spark.read.parquet(path).count() === 2)
  }

  test("upsertByKey works as a foreachBatch streaming sink (the documented " +
    "MERGE micro-batch shape)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("lake_ups2").toString + "/t"
    Seq((1L, "init", 1.0), (2L, "init", 2.0)).toDF("id", "name", "v")
      .write.parquet(path)
    val input = MemoryStream[(Long, String, Double)]
    val q = input.toDF().toDF("id", "name", "v").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lake_ckpt").toString)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          Lake.upsertByKey(spark, path, batch.toDF(), Seq("id"))
      }.start()
    input.addData((2L, "updated", 20.0), (3L, "new", 3.0))
    q.processAllAvailable()
    input.addData((3L, "re-updated", 30.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(out === Seq((1L, "init", 1.0), (2L, "updated", 20.0),
      (3L, "re-updated", 30.0)))
  }

  test("partition-pruned upsert leaves other partitions byte-identical on disk") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_pp").toString + "/t"
    Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"), (4L, 2, "d"), (5L, 3, "e"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)

    // (path, length, mtime) of every file in the partitions the upsert must NOT touch
    def fileStates(days: Int*): Seq[(String, Long, Long)] = days.flatMap { d =>
      val dir = new java.io.File(s"$path/day=$d")
      dir.listFiles().toSeq.map(f => (f.getPath, f.length(), f.lastModified()))
    }.sorted
    val before = fileStates(1, 3)

    Lake.upsertByKey(spark, path,
      Seq((3L, 2, "c2"), (9L, 2, "new")).toDF("id", "day", "v"),
      Seq("id"), where = Some(col("day") === 2), partitionCol = Some("day"))

    assert(fileStates(1, 3) === before,
      "files outside the updated partition must be physically untouched")
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (2L, "b", 1), (3L, "c2", 2),
      (4L, "d", 2), (5L, "e", 3), (9L, "new", 2)))

    // a brand-new partition value creates its directory; others still untouched
    val before2 = fileStates(1, 2, 3)
    Lake.upsertByKey(spark, path, Seq((10L, 7, "x")).toDF("id", "day", "v"),
      Seq("id"), partitionCol = Some("day"))
    assert(fileStates(1, 2, 3) === before2)
    assert(spark.read.parquet(path).filter(col("day") === 7).count() === 1)
    // no visible staging leftovers for partition discovery to misparse
    assert(!new java.io.File(s"$path/.upsert_tmp").exists() ||
      new java.io.File(s"$path/.upsert_tmp").listFiles().isEmpty)
  }

  test("partition-pruned upsert merges 12 touched partitions as one job wave, " +
    "reading the updates lineage once") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_many").toString + "/t"
    val base = (0 until 15).flatMap(d => Seq((d * 10L, d, "a"), (d * 10L + 1, d, "b")))
    base.toDF("id", "day", "v").write.partitionBy("day").parquet(path)

    def fileStates(days: Seq[Int]): Seq[(String, Long, Long)] = days.flatMap { d =>
      new java.io.File(s"$path/day=$d").listFiles().toSeq
        .map(f => (f.getPath, f.length(), f.lastModified()))
    }.sorted
    val before = fileStates(Seq(12, 13, 14))

    // instrument the updates lineage: a per-partition merge loop that
    // re-executed it once per touched directory would overcount
    val acc = spark.sparkContext.longAccumulator("updates_lineage_rows")
    val upd = (0 until 12).map(d => (d * 10L, d, "upd")).toDS()
      .map { r => acc.add(1); r }.toDF("id", "day", "v")

    spark.sparkContext.setJobGroup("upsert_many", "single-wave upsert")
    try Lake.upsertByKey(spark, path, upd, Seq("id"), partitionCol = Some("day"))
    finally spark.sparkContext.clearJobGroup()

    assert(acc.value === 12L, "updates lineage must execute exactly once")
    // the round-5 loop launched a read-merge-swap job pair PER touched
    // directory (≥24 jobs here); the single-wave merge is checkpoint +
    // distinct + one merge write (a handful with AQE), independent of the
    // touched-partition count
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup("upsert_many")
    assert(jobs.length <= 10,
      s"merge must not scale jobs with touched partitions, got ${jobs.length}")

    assert(fileStates(Seq(12, 13, 14)) === before,
      "untouched partitions must stay byte-identical")
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    val expected = ((0 until 12).flatMap(d =>
      Seq((d * 10L, "upd", d), (d * 10L + 1, "b", d))) ++
      (12 until 15).flatMap(d =>
        Seq((d * 10L, "a", d), (d * 10L + 1, "b", d)))).sortBy(_._1)
    assert(out === expected)
  }

  test("partition-pruned upsert: string partition values with a lossy " +
    "dirname parse round trip (\"01\", \"1e3\") keep non-updated rows") {
    import spark.implicits._
    // partition discovery over ONLY the touched dirs would infer day=01 as
    // int 1 and day=1e3 as double 1000.0; a cast back to string then never
    // matches the updates' raw values — the displacement join displaces
    // nothing and old rows stage under directories the swap loop never
    // promotes. Round-6 self-review: this silently dropped every
    // pre-existing non-updated row of the touched partitions.
    val path = java.nio.file.Files.createTempDirectory("lake_str").toString + "/t"
    Seq((1L, "01", "a"), (2L, "01", "b"), (3L, "1e3", "c"), (4L, "+1", "d"),
      (5L, "abc", "e"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    // untouched = every day= dir except the two the updates name (dir names
    // for values like "+1" depend on the escaping scheme — don't guess it)
    def untouchedStates(): Seq[(String, Long, Long)] =
      new java.io.File(path).listFiles().toSeq
        .filter(d => d.getName.startsWith("day=") &&
          d.getName != "day=01" && d.getName != "day=1e3")
        .flatMap(_.listFiles().toSeq.map(f => (f.getPath, f.length(), f.lastModified())))
        .sorted
    val before = untouchedStates()
    assert(before.nonEmpty)

    Lake.upsertByKey(spark, path,
      Seq((2L, "01", "b2"), (3L, "1e3", "c2"), (9L, "01", "new"))
        .toDF("id", "day", "v"),
      Seq("id"), partitionCol = Some("day"))

    assert(untouchedStates() === before, "untouched dirs stay put")
    // the "abc" dir pins discovery to string for this assertion read, so
    // values come back raw
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, String)].collect().toSeq
    assert(out === Seq((1L, "a", "01"), (2L, "b2", "01"), (3L, "c2", "1e3"),
      (4L, "d", "+1"), (5L, "e", "abc"), (9L, "new", "01")),
      "non-updated rows of touched partitions must survive")
  }

  test("partition-pruned upsert recovers a crash between the swap renames " +
    "without losing the partition") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_crash").toString + "/t"
    Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)

    // simulate the crash window: target staged aside to .upsert_old but the
    // promote rename never happened — day=1 exists ONLY under the hidden dir
    val root = new java.io.File(path)
    new java.io.File(root, ".upsert_old").mkdirs()
    assert(new java.io.File(root, "day=1")
      .renameTo(new java.io.File(root, ".upsert_old/day=1")))

    // the next upsert touching day=1 must restore the old rows and merge,
    // NOT treat the partition as empty and then sweep the only copy
    Lake.upsertByKey(spark, path, Seq((2L, 1, "b2"), (9L, 1, "new")).toDF("id", "day", "v"),
      Seq("id"), partitionCol = Some("day"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (2L, "b2", 1), (3L, "c", 2), (9L, "new", 1)),
      "pre-crash row 1 must survive the recovered merge")
  }

  test("partition-pruned upsert bootstraps a table root that does not exist yet") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_boot").toString + "/t"
    Lake.upsertByKey(spark, path, Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "day", "v"),
      Seq("id"), partitionCol = Some("day"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (2L, "b", 2)))
  }

  test("partition-pruned upsert: keys including the partition column replace " +
    "touched partitions wholesale") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_ppw").toString + "/t"
    Seq((1L, 1, "a"), (2L, 2, "b"), (3L, 2, "c"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    // keys == Seq(day): no within-partition key → wholesale replaceWhere
    Lake.upsertByKey(spark, path, Seq((8L, 2, "only")).toDF("id", "day", "v"),
      Seq("day"), partitionCol = Some("day"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (8L, "only", 2)))
  }

  test("partition-pruned upsert rejects bad layouts, NULL partitions, and " +
    "out-of-scope updates") {
    import spark.implicits._
    // not hive-partitioned → loud failure before any disk mutation
    val flat = java.nio.file.Files.createTempDirectory("lake_ppf").toString + "/t"
    Seq((1L, 1, "a")).toDF("id", "day", "v").write.parquet(flat)
    val e1 = intercept[IllegalArgumentException] {
      Lake.upsertByKey(spark, flat, Seq((1L, 1, "x")).toDF("id", "day", "v"),
        Seq("id"), partitionCol = Some("day"))
    }
    assert(e1.getMessage.contains("not hive-partitioned"))

    val path = java.nio.file.Files.createTempDirectory("lake_ppn").toString + "/t"
    Seq((1L, Some(1), "a")).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(path)
    val e2 = intercept[IllegalArgumentException] {
      Lake.upsertByKey(spark, path,
        Seq((2L, Option.empty[Int], "x")).toDF("id", "day", "v"),
        Seq("id"), partitionCol = Some("day"))
    }
    assert(e2.getMessage.contains("NULL partition values"))

    val e3 = intercept[IllegalArgumentException] {
      Lake.upsertByKey(spark, path,
        Seq((2L, Some(9), "x")).toDF("id", "day", "v"),
        Seq("id"), where = Some(col("day") === 1), partitionCol = Some("day"))
    }
    assert(e3.getMessage.contains("outside the `where` scope"))
  }

  test("deleteByKey: pruned path deletes across partitions, drops emptied ones, " +
    "leaves unnamed partitions byte-identical") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_del").toString + "/t"
    Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"), (4L, 2, "d"), (5L, 3, "e"),
      (6L, 4, "f"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    def fileStates(days: Int*): Seq[(String, Long, Long)] = days.flatMap { d =>
      val dir = new java.io.File(s"$path/day=$d")
      dir.listFiles().toSeq.map(f => (f.getPath, f.length(), f.lastModified()))
    }.sorted
    val before = fileStates(1, 4)
    // touches day=2 (partial delete), day=3 (emptied → dir removed),
    // day=9 (absent → no-op); day=1/day=4 must stay untouched on disk
    Lake.deleteByKey(spark, path,
      Seq((3L, 2), (5L, 3), (99L, 9)).toDF("id", "day"),
      Seq("id", "day"), partitionCol = Some("day"))
    assert(fileStates(1, 4) === before,
      "partitions the deletes don't name must be physically untouched")
    assert(!new java.io.File(s"$path/day=3").exists(),
      "an emptied partition directory is removed")
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (2L, "b", 1), (4L, "d", 2), (6L, "f", 4)))
    // idempotent re-run
    Lake.deleteByKey(spark, path, Seq((3L, 2), (5L, 3)).toDF("id", "day"),
      Seq("id", "day"), partitionCol = Some("day"))
    assert(spark.read.parquet(path).count() === 4)
  }

  test("deleteByKey: whole-partition delete via keys == Seq(p); unpartitioned " +
    "path; NULL keys and missing partition key rejected") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_del2").toString + "/t"
    Seq((1L, 1, "a"), (2L, 2, "b"), (3L, 3, "c"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    // keys = just the partition column → wholesale partition removal
    Lake.deleteByKey(spark, path, Seq(Tuple1(2)).toDF("day"),
      Seq("day"), partitionCol = Some("day"))
    assert(!new java.io.File(s"$path/day=2").exists())
    assert(spark.read.parquet(path).select("id").as[Long].collect().sorted
      === Seq(1L, 3L))
    // pruned path without p in keys is unknowable
    intercept[IllegalArgumentException] {
      Lake.deleteByKey(spark, path, Seq(Tuple1(1L)).toDF("id"),
        Seq("id"), partitionCol = Some("day"))
    }
    // NULL keys would silently match nothing
    intercept[IllegalArgumentException] {
      Lake.deleteByKey(spark, path,
        Seq((Option.empty[Long], 1)).toDF("id", "day"),
        Seq("id", "day"), partitionCol = Some("day"))
    }
    // unpartitioned path: plain anti-join + safe swap
    val flat = java.nio.file.Files.createTempDirectory("lake_del3").toString + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").write.parquet(flat)
    Lake.deleteByKey(spark, flat, Seq(Tuple1(2L)).toDF("id"), Seq("id"))
    assert(spark.read.parquet(flat).select("id").as[Long].collect().sorted
      === Seq(1L, 3L))
  }

  test("deleteByKey: string partition values with lossy inference round-trips " +
    "(day='01') still target the right directory") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_del4").toString + "/t"
    Seq((1L, "01", "a"), (2L, "01", "b"), (3L, "1", "c"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    // inference would read day=01 as int 1 and delete from the WRONG dir
    Lake.deleteByKey(spark, path, Seq((1L, "01")).toDF("id", "day"),
      Seq("id", "day"), partitionCol = Some("day"))
    val out = spark.read.schema("id LONG, v STRING, day STRING")
      .parquet(path).orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out === Seq((2L, "b", "01"), (3L, "c", "1")))
  }

  test("deleteByKey recovers a crash between the swap renames without losing " +
    "the partition") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_del5").toString + "/t"
    Seq((1L, 1, "a"), (2L, 1, "b"), (3L, 2, "c"))
      .toDF("id", "day", "v").write.partitionBy("day").parquet(path)
    // crash window: day=1 staged aside but never promoted
    val root = new java.io.File(path)
    new java.io.File(root, ".upsert_old").mkdirs()
    assert(new java.io.File(root, "day=1")
      .renameTo(new java.io.File(root, ".upsert_old/day=1")))
    // the re-run delete must restore day=1 first, then delete only id=2
    Lake.deleteByKey(spark, path, Seq((2L, 1)).toDF("id", "day"),
      Seq("id", "day"), partitionCol = Some("day"))
    val out = spark.read.parquet(path).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(out === Seq((1L, "a", 1), (3L, "c", 2)),
      "pre-crash row 1 must survive the recovered delete")
  }

  test("scdRetire closes the current version without a successor; " +
    "point-in-time reads before the retirement still answer; idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_retire").toString + "/dim"
    Lake.scdMerge(spark, path, Seq((1L, "a"), (2L, "x")).toDF("id", "v"),
      Seq("id"), asOf = 100L, bootstrap = true)
    Lake.scdMerge(spark, path, Seq((1L, "b")).toDF("id", "v"), Seq("id"), 200L)
    // retire key 1 at t=300; key 9 absent → no-op
    Lake.scdRetire(spark, path, Seq(1L, 9L).toDF("id"), Seq("id"), asOf = 300L)
    def asOfRead(t: Long): Seq[(Long, String)] = spark.read.parquet(path)
      .filter(col("effective_from") <= t &&
        (col("effective_to").isNull || col("effective_to") > t))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(asOfRead(150L) === Seq((1L, "a"), (2L, "x")))
    assert(asOfRead(250L) === Seq((1L, "b"), (2L, "x")))
    assert(asOfRead(300L) === Seq((2L, "x")), "retired at 300 — gone at 300")
    // no current version of key 1 remains; history intact
    val cur = spark.read.parquet(path).filter(col("is_current"))
      .select("id").as[Long].collect().toSeq
    assert(cur === Seq(2L))
    assert(spark.read.parquet(path).filter(col("id") === 1L).count() === 2)
    // idempotent: retiring again (or an absent key) changes nothing
    Lake.scdRetire(spark, path, Seq(1L).toDF("id"), Seq("id"), asOf = 400L)
    assert(asOfRead(350L) === Seq((2L, "x")))
    assert(spark.read.parquet(path).count() === 3)
    // a retire BEFORE a version's effective_from is an inverted interval
    intercept[IllegalArgumentException] {
      Lake.scdRetire(spark, path, Seq(2L).toDF("id"), Seq("id"), asOf = 50L)
    }
    // NULL retire keys rejected
    intercept[IllegalArgumentException] {
      Lake.scdRetire(spark, path, Seq(Option.empty[Long]).toDF("id"),
        Seq("id"), asOf = 500L)
    }
  }

  test("scdMerge: type-2 history — close changed, keep unchanged, insert new, idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_scd").toString + "/dim"
    // t=100: bootstrap three entities
    Lake.scdMerge(spark, path,
      Seq((1L, "alice", "eng"), (2L, "bob", "ops"), (3L, "cara", "eng"))
        .toDF("id", "name", "team"),
      Seq("id"), asOf = 100L, bootstrap = true)

    // t=200: bob changes team, cara unchanged, dana is new
    Lake.scdMerge(spark, path,
      Seq((2L, "bob", "eng"), (3L, "cara", "eng"), (4L, "dana", "ops"))
        .toDF("id", "name", "team"),
      Seq("id"), asOf = 200L)

    def snap(): Seq[(Long, String, String, Long, Option[Long], Boolean)] =
      spark.read.parquet(path)
        .select(col("id"), col("name"), col("team"), col("effective_from"),
          col("effective_to"), col("is_current"))
        .as[(Long, String, String, Long, Option[Long], Boolean)]
        .collect().sortBy(r => (r._1, r._4)).toSeq
    val expected = Seq(
      (1L, "alice", "eng", 100L, None, true),        // untouched by batch 2
      (2L, "bob", "ops", 100L, Some(200L), false),   // closed at 200
      (2L, "bob", "eng", 200L, None, true),          // new version
      (3L, "cara", "eng", 100L, None, true),         // unchanged: no churn
      (4L, "dana", "ops", 200L, None, true))         // new key
    assert(snap() === expected)

    // re-running the same batch is a no-op (idempotence)
    Lake.scdMerge(spark, path,
      Seq((2L, "bob", "eng"), (3L, "cara", "eng"), (4L, "dana", "ops"))
        .toDF("id", "name", "team"),
      Seq("id"), asOf = 300L)
    assert(snap() === expected, "identical batch must not create versions")

    // t=400: alice changes; bob's HISTORY row stays untouched
    Lake.scdMerge(spark, path,
      Seq((1L, "alice", "ops")).toDF("id", "name", "team"),
      Seq("id"), asOf = 400L)
    assert(snap() === Seq(
      (1L, "alice", "eng", 100L, Some(400L), false),
      (1L, "alice", "ops", 400L, None, true),
      (2L, "bob", "ops", 100L, Some(200L), false),
      (2L, "bob", "eng", 200L, None, true),
      (3L, "cara", "eng", 100L, None, true),
      (4L, "dana", "ops", 200L, None, true)))

    // as-of query: team roster at t=150 (the point-in-time read the
    // history exists for)
    val asOf150 = spark.read.parquet(path)
      .filter(col("effective_from") <= 150 &&
        (col("effective_to").isNull || col("effective_to") > 150))
      .select("id", "team").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(asOf150 === Seq((1L, "eng"), (2L, "ops"), (3L, "eng")))

    // NULL-attribute transitions are real changes both directions
    Lake.scdMerge(spark, path,
      Seq((4L, "dana", null: String)).toDF("id", "name", "team"),
      Seq("id"), asOf = 500L)
    Lake.scdMerge(spark, path,
      Seq((4L, "dana", null: String)).toDF("id", "name", "team"),
      Seq("id"), asOf = 600L) // same incl. NULL -> no-op
    val dana = snap().filter(_._1 == 4L)
    assert(dana === Seq(
      (4L, "dana", "ops", 200L, Some(500L), false),
      (4L, "dana", null, 500L, None, true)))

    // metadata-column collisions and attr-free updates rejected loudly
    intercept[IllegalArgumentException] {
      Lake.scdMerge(spark, path,
        Seq((1L, "x", true)).toDF("id", "name", "is_current"), Seq("id"), 700L)
    }
    intercept[IllegalArgumentException] {
      Lake.scdMerge(spark, path, Seq(Tuple1(1L)).toDF("id"), Seq("id"), 700L)
    }
  }

  test("scdVacuum drops only versions expired before the horizon") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_vac").toString + "/dim"
    Lake.scdMerge(spark, path, Seq((1L, "a"), (2L, "x")).toDF("id", "v"),
      Seq("id"), asOf = 100L, bootstrap = true)
    Lake.scdMerge(spark, path, Seq((1L, "b")).toDF("id", "v"), Seq("id"), 200L)
    Lake.scdMerge(spark, path, Seq((1L, "c")).toDF("id", "v"), Seq("id"), 300L)
    // versions: 1:[100,200) [200,300) [300,∞); 2:[100,∞)
    val (b1, a1) = Lake.scdVacuum(spark, path, horizon = 250L)
    assert((b1, a1) === ((4L, 3L))) // only 1:[100,200) expired before 250
    // as-of at the horizon still answers
    val at250 = spark.read.parquet(path)
      .filter(col("effective_from") <= 250 &&
        (col("effective_to").isNull || col("effective_to") > 250))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(at250 === Seq((1L, "b"), (2L, "x")))
    // idempotent when nothing expires
    assert(Lake.scdVacuum(spark, path, horizon = 250L) === ((3L, 3L)))
  }

  test("scdMerge: NULL keys and out-of-order asOf batches are rejected loudly") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_scd2").toString + "/dim"
    Lake.scdMerge(spark, path, Seq((1L, "a")).toDF("id", "v"),
      Seq("id"), asOf = 100L, bootstrap = true)
    Lake.scdMerge(spark, path, Seq((1L, "b")).toDF("id", "v"), Seq("id"), 200L)
    // NULL key would re-insert as "new" on every run (NULL never joins)
    intercept[IllegalArgumentException] {
      Lake.scdMerge(spark, path,
        Seq((Option.empty[Long], "x")).toDF("id", "v"), Seq("id"), 300L)
    }
    // late batch closing a NEWER version would write an inverted interval
    val e = intercept[IllegalArgumentException] {
      Lake.scdMerge(spark, path, Seq((1L, "c")).toDF("id", "v"), Seq("id"), 150L)
    }
    assert(e.getMessage.contains("effective-time order"))
    // duplicate-key batch would silently write TWO is_current versions of
    // key 1, breaking as-of reads and idempotence
    val dup = intercept[IllegalArgumentException] {
      Lake.scdMerge(spark, path,
        Seq((1L, "c"), (1L, "d")).toDF("id", "v"), Seq("id"), 300L)
    }
    assert(dup.getMessage.contains("duplicate keys"))
    // table unchanged by the rejected batches
    assert(spark.read.parquet(path).count() === 2)
  }

  test("partition-pruned upsert rejects schema drift between updates and table") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_drift").toString + "/t"
    Seq((1L, 1, "a", 9.9), (2L, 2, "b", 8.8))
      .toDF("id", "day", "v", "extra").write.partitionBy("day").parquet(path)
    // updates MISSING the `extra` column: a declared-schema merge would
    // silently drop `extra` from every touched partition
    val e = intercept[IllegalStateException] {
      Lake.upsertByKey(spark, path, Seq((1L, 1, "a2")).toDF("id", "day", "v"),
        Seq("id"), partitionCol = Some("day"))
    }
    assert(e.getMessage.contains("extra") && e.getMessage.contains("MISSING"),
      e.getMessage)
    // updates with an EXTRA column the table lacks: silent null-backfill
    val e2 = intercept[IllegalStateException] {
      Lake.upsertByKey(spark, path,
        Seq((1L, 1, "a2", 9.9, true)).toDF("id", "day", "v", "extra", "novel"),
        Seq("id"), partitionCol = Some("day"))
    }
    assert(e2.getMessage.contains("novel"), e2.getMessage)
    // updates with a RETYPED column: the declared-schema read would scan
    // the files under the wrong type — the message names column and both
    // types (SchemaCompat.maintenanceDrift)
    val e3 = intercept[IllegalStateException] {
      Lake.upsertByKey(spark, path,
        Seq((1L, 1, "a2", "not-a-double")).toDF("id", "day", "v", "extra"),
        Seq("id"), partitionCol = Some("day"))
    }
    assert(e3.getMessage.contains("extra") && e3.getMessage.contains("double")
      && e3.getMessage.contains("string"), e3.getMessage)
    // table untouched by the rejected merges
    assert(spark.read.parquet(path).columns.toSet ===
      Set("id", "day", "v", "extra"))
    assert(spark.read.parquet(path).count() === 2)
  }

  test("maintenance drift gates also cover the full-rewrite upsert and " +
    "deleteByKey key types") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("lake_drift2").toString
    // full-rewrite upsert: retyped value column named in one message
    val flat = s"$base/flat"
    Seq((1L, "a", 1.5)).toDF("id", "v", "score").write.parquet(flat)
    val e = intercept[IllegalStateException] {
      Lake.upsertByKey(spark, flat,
        Seq((1L, "a2", 7)).toDF("id", "v", "score"), Seq("id"))
    }
    assert(e.getMessage.contains("score") && e.getMessage.contains("double"),
      e.getMessage)
    // deleteByKey (unpartitioned): retyped key would be implicitly cast in
    // the anti-join — rejected with the key named instead
    val e2 = intercept[IllegalStateException] {
      Lake.deleteByKey(spark, flat, Seq("1").toDF("id"), Seq("id"))
    }
    assert(e2.getMessage.contains("id") && e2.getMessage.contains("bigint"),
      e2.getMessage)
    // deleteByKey (pruned): same for the non-partition key columns
    val part = s"$base/part"
    Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "day", "v")
      .write.partitionBy("day").parquet(part)
    val e3 = intercept[IllegalStateException] {
      Lake.deleteByKey(spark, part, Seq(("1", 1)).toDF("id", "day"),
        Seq("id", "day"), partitionCol = Some("day"))
    }
    assert(e3.getMessage.contains("id") && e3.getMessage.contains("bigint"),
      e3.getMessage)
    // tables untouched; a well-typed delete still works
    assert(spark.read.parquet(flat).count() === 1)
    Lake.deleteByKey(spark, part, Seq((1L, 1)).toDF("id", "day"),
      Seq("id", "day"), partitionCol = Some("day"))
    assert(spark.read.parquet(part).count() === 1)
    // scdMerge: a retyped business attribute is caught before any rewrite
    val scd = s"$base/scd"
    Lake.scdMerge(spark, scd, Seq((1L, "x", 2.0)).toDF("id", "name", "w"),
      Seq("id"), asOf = 100L, bootstrap = true)
    val e4 = intercept[IllegalStateException] {
      Lake.scdMerge(spark, scd, Seq((1L, "x", 3)).toDF("id", "name", "w"),
        Seq("id"), asOf = 200L)
    }
    assert(e4.getMessage.contains("w") && e4.getMessage.contains("double"),
      e4.getMessage)
  }

  test("safeReplace swaps contents and sweeps crash leftovers") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_sr").toString + "/t"
    Seq((1L, "old")).toDF("id", "v").write.parquet(path)
    // simulate leftovers from a previous crash mid-swap
    Seq((99L, "stale")).toDF("id", "v").write.parquet(path + "__tmp")
    Seq((98L, "stale")).toDF("id", "v").write.parquet(path + "__old")

    Lake.safeReplace(spark, path, Seq((2L, "new")).toDF("id", "v"))
    val out = spark.read.parquet(path).as[(Long, String)].collect().toSeq
    assert(out === Seq((2L, "new")))
    assert(!new java.io.File(path + "__tmp").exists())
    assert(!new java.io.File(path + "__old").exists())
  }

  test("compact rewrites many small files into few") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("lake_c").toString + "/t"
    // 10 appends of 100 rows → ≥10 files
    (1 to 10).foreach { b =>
      (1 to 100).map(i => (b * 1000L + i, i.toDouble)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(path)
    }
    val (before, after) = Lake.compact(spark, path, rowsPerFile = 500)
    assert(before >= 10)
    assert(after === 2) // 1000 rows / 500 per file
    assert(spark.read.parquet(path).count() === 1000)
    assert(spark.read.parquet(path).select(sum("v")).head().getDouble(0)
      === 10 * (1 to 100).map(_.toDouble).sum)
  }

  test("groupBy on the bucket key needs no exchange") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong % 20, i.toDouble)).toDF("k", "v")
    Lake.writeBucketed(df, "lake_agg", Seq("k"), 4)
    try {
      val agg = Lake.read(spark, "lake_agg").groupBy("k").agg(sum("v"))
      agg.count()
      assert(countShuffles(agg.queryExecution.executedPlan) === 0)
    } finally spark.sql("DROP TABLE IF EXISTS lake_agg")
  }
}
