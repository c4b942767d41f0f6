package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FileSkippingSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def writeRanged(path: String): Unit =
    spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id").cast("double") / 10)
      .withColumn("s", format_string("k%04d", col("id")))
      .repartitionByRange(8, col("id"))
      .sortWithinPartitions("id")
      .write.parquet(path)

  test("footer stats match actual per-file min/max") {
    val path = tmp("fsk_stats")
    writeRanged(path)
    val actual = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("mn"), max("id").as("mx"))
      .collect()
      .map(r => new java.io.File(new java.net.URI(r.getString(0)).getPath).getName ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val stats = FileSkipping.fileStats(spark, path, "id")
    assert(stats.size === 8)
    stats.foreach { s =>
      val name = new org.apache.hadoop.fs.Path(s.file).getName
      assert(s.hasStats, s"footer stats missing for $name")
      assert((s.minLong.get, s.maxLong.get) === actual(name))
    }
  }

  test("long-range scan prunes files and matches the unpruned result") {
    val path = tmp("fsk_long")
    writeRanged(path)
    val (kept, pruned) = FileSkipping.prunedFiles(spark, path, "id", 200, 260)
    assert(pruned.nonEmpty && kept.size < 8,
      s"range-partitioned layout must prune: kept ${kept.size} of 8")
    val got = FileSkipping.readPruned(spark, path, "id", 200, 260)
      .select("id").as[Long].collect().sorted
    assert(got === (200L to 260L).toArray)
  }

  test("double and string predicates prune in their own domains") {
    val path = tmp("fsk_dom")
    writeRanged(path)
    val gotD = FileSkipping.readPruned(spark, path, "v", 50.0, 52.0)
      .select("id").as[Long].collect().sorted
    assert(gotD === (500L to 520L).toArray)
    assert(FileSkipping.prunedFiles(spark, path, "v", 50.0, 52.0)._2.nonEmpty)
    val gotS = FileSkipping.readPruned(spark, path, "s", "k0300", "k0310")
      .select("id").as[Long].collect().sorted
    assert(gotS === (300L to 310L).toArray)
    assert(FileSkipping.prunedFiles(spark, path, "s", "k0300", "k0310")._2.nonEmpty)
  }

  test("z-ordered layout prunes on BOTH clustered dimensions") {
    val path = tmp("fsk_z")
    val df = (0 until 4096).map(i => (i % 64, i / 64, i.toLong))
      .toDF("a", "b", "id")
    Lake.zorderWrite(df, path, "a", "b", nFiles = 8)
    val (keptA, prunedA) = FileSkipping.prunedFiles(spark, path, "a", 3, 6)
    val (keptB, prunedB) = FileSkipping.prunedFiles(spark, path, "b", 3, 6)
    assert(prunedA.nonEmpty, s"a-range kept all ${keptA.size} files")
    assert(prunedB.nonEmpty, s"b-range kept all ${keptB.size} files")
    val got = FileSkipping.readPruned(spark, path, "b", 3, 6).count()
    assert(got === 4L * 64)
  }

  test("manifest serves fresh stats; a stale manifest is detected, not trusted") {
    val path = tmp("fsk_man")
    writeRanged(path)
    FileSkipping.writeManifest(spark, path, Seq("id", "v"))
    // fresh: prunes and matches
    val got = FileSkipping.readPruned(spark, path, "id", 100, 120)
      .select("id").as[Long].collect().sorted
    assert(got === (100L to 120L).toArray)
    // rewrite the table with a DIFFERENT range layout (files change);
    // the manifest is now stale — results must reflect the new data
    spark.range(2000, 2500).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .withColumn("s", format_string("k%04d", col("id")))
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(path)
    val got2 = FileSkipping.readPruned(spark, path, "id", 2100, 2110)
      .select("id").as[Long].collect().sorted
    assert(got2 === (2100L to 2110L).toArray)
    val gone = FileSkipping.readPruned(spark, path, "id", 100, 120).count()
    assert(gone === 0L)
  }

  test("the manifest file itself is invisible to data reads and stats") {
    val path = tmp("fsk_hide")
    writeRanged(path)
    FileSkipping.writeManifest(spark, path, Seq("id"))
    assert(spark.read.parquet(path).count() === 1000L)
    assert(FileSkipping.fileStats(spark, path, "id").size === 8)
  }

  test("the footer pass is a distributed job, opening each footer once for all columns") {
    val path = tmp("fsk_dist")
    writeRanged(path)
    // Count Spark jobs + executor tasks across the manifest build: the footer
    // reads must run as TASKS (executor-side), not as a driver loop — at
    // 100 TB file counts a driver-side footer pass is an hours-long
    // bottleneck. One footer pass must also cover BOTH columns (stats rows
    // for id and v from a single job).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val byCol = FileSkipping.fileStatsMulti(spark, path, Seq("id", "v"))
      // listener events are delivered async; poll briefly before judging
      val deadline = System.nanoTime() + 10_000_000_000L
      while ((jobs.get < 1 || tasks.get < 1) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(jobs.get >= 1, "footer pass did not launch a Spark job")
      assert(tasks.get >= 1, "footer pass ran no executor tasks")
      assert(byCol("id").size === 8 && byCol("v").size === 8)
      assert(byCol("id").forall(_.hasStats) && byCol("v").forall(_.hasStats))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("hive-partitioned layout: distributed listing finds every leaf, pruning works") {
    val path = tmp("fsk_hive")
    // 10 partition dirs (>= the parallel-listing threshold) × range files
    spark.range(0, 1000).toDF("id")
      .withColumn("pt", col("id") % 10)
      .write.partitionBy("pt").parquet(path)
    val stats = FileSkipping.fileStats(spark, path, "id")
    assert(stats.size >= 10, s"expected a file per partition dir, got ${stats.size}")
    assert(stats.forall(_.hasStats))
    // every row accounted for across the listed leaves
    assert(stats.map(_.rows).sum === 1000L)
    // min-max pruning still applies per leaf file (id values interleave
    // across partitions here, so this checks correctness, not selectivity)
    import spark.implicits._
    val got = FileSkipping.readPruned(spark, path, "id", 100, 120)
      .select("id").as[Long].collect().sorted
    assert(got === (100L to 120L).toArray)
  }

  test("incremental manifest update reads only new files, equals a full rebuild") {
    val path = tmp("fsk_incr")
    writeRanged(path)
    FileSkipping.writeManifest(spark, path, Seq("id", "v"))
    // ingest: append two new files; the 8 existing files are untouched
    spark.range(5000, 5200).toDF("id")
      .withColumn("v", col("id").cast("double") / 10)
      .withColumn("s", format_string("k%04d", col("id")))
      .repartitionByRange(2, col("id"))
      .write.mode("append").parquet(path)
    val upd = FileSkipping.updateManifest(spark, path, Seq("id", "v"))
    assert(upd.filesRead === 2, s"expected footer reads for the 2 new files, got $upd")
    assert(upd.filesCarried === 8, s"expected 8 carried files, got $upd")
    // the updated manifest is trusted (fresh) and prunes correctly into
    // BOTH the old and the new key ranges
    import spark.implicits._
    val oldRange = FileSkipping.readPruned(spark, path, "id", 100, 120)
      .select("id").as[Long].collect().sorted
    assert(oldRange === (100L to 120L).toArray)
    val newRange = FileSkipping.readPruned(spark, path, "id", 5100, 5110)
      .select("id").as[Long].collect().sorted
    assert(newRange === (5100L to 5110L).toArray)
    // row-for-row agreement with a from-scratch rebuild of the MANIFEST
    // (stats are per-file facts, so incremental and full builds must agree)
    def manifestRows(): Set[Seq[Any]] =
      spark.read.parquet(s"$path/_graft_stats.parquet")
        .collect().map(_.toSeq).toSet
    val incremental = manifestRows()
    FileSkipping.writeManifest(spark, path, Seq("id", "v"))
    val rebuilt = manifestRows()
    assert(incremental === rebuilt)
    // a deleted file's rows are dropped, not trusted stale: remove one file
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_"))
      .minBy(_.getName.toString)
    fs.delete(victim, false)
    val upd2 = FileSkipping.updateManifest(spark, path, Seq("id", "v"))
    assert(upd2.filesRead === 0 && upd2.filesCarried === 9, s"got $upd2")
  }

  test("an all-NULL file is pruned: range predicates cannot match NULL") {
    val path = tmp("fsk_null")
    val withNulls = spark.range(0, 100).toDF("id")
      .withColumn("v", when(col("id") < 50, col("id")).otherwise(lit(null)))
      .repartitionByRange(2, col("v"))
    withNulls.write.parquet(path)
    val (kept, pruned) = FileSkipping.prunedFiles(spark, path, "v", 0, 100)
    assert(pruned.nonEmpty, "the all-NULL file should be pruned")
    assert(FileSkipping.readPruned(spark, path, "v", 0L, 100L).count() === 50L)
  }

  test("native bloom filters prune point lookups where min/max cannot") {
    val path = tmp("fsk_bloom")
    // hash layout: every file's [min,max] spans ~the whole id domain, so
    // range stats are useless for equality — only the bloom can prune
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("s", format_string("key%05d", col("id")))
      .repartition(8, col("id"))
    FileSkipping.writeWithBloom(df, path, Seq("id", "s"), ndv = 1000)
    // present value: exactly one file truly holds it; blooms may admit a
    // few false positives but must prune MOST of the 8 files
    val (kept, pruned) = FileSkipping.pointLookupFiles(spark, path, "id", 1234L)
    assert(kept.size + pruned.size === 8)
    assert(kept.size <= 3, s"bloom pruned too little: kept ${kept.size} of 8")
    import spark.implicits._
    val got = FileSkipping.readPoint(spark, path, "id", 1234L)
      .select("id").as[Long].collect()
    assert(got === Array(1234L))
    // string column probes through Binary hashing
    val gotS = FileSkipping.readPoint(spark, path, "s", "key02345")
      .select("id").as[Long].collect()
    assert(gotS === Array(2345L))
    // absent value: result is empty regardless of which files survive
    assert(FileSkipping.readPoint(spark, path, "id", 999999L).count() === 0L)
    // files WITHOUT blooms degrade to keep-all on this layout, never wrong:
    // every id is unique, so parquet's dictionary writer falls back to
    // PLAIN — no dictionary rung either, nothing can rule a file out
    val plainPath = tmp("fsk_nobloom")
    df.write.parquet(plainPath)
    val (keptP, _) = FileSkipping.pointLookupFiles(spark, plainPath, "id", 1234L)
    assert(keptP.size === 8)
    assert(FileSkipping.readPoint(spark, plainPath, "id", 1234L).count() === 1L)
  }

  test("fully dictionary-encoded chunks prune point lookups EXACTLY — no " +
    "bloom needed, no false positives") {
    // repeated values so the dictionary writer does NOT fall back to plain:
    // 500 distinct v over 4000 rows, hash-spread so min/max cannot prune
    val path = tmp("fsk_dict")
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id") % 500)
      .withColumn("s", format_string("cat%03d", col("id") % 200))
      .repartition(8, col("v"))
    df.write.parquet(path)
    // present value: hash layout puts all its rows in EXACTLY one file, and
    // dictionary membership is exact — one kept file, zero false positives
    val (kept, pruned) = FileSkipping.pointLookupFiles(spark, path, "v", 123L)
    assert(kept.size === 1 && pruned.size === 7,
      s"dictionary must prune exactly: kept ${kept.size}")
    import spark.implicits._
    assert(FileSkipping.readPoint(spark, path, "v", 123L)
      .select("id").as[Long].collect().sorted ===
      (0L until 4000L).filter(_ % 500 == 123).toArray)
    // string dictionaries decode too; only files whose dictionary holds the
    // category survive
    val (keptS, _) = FileSkipping.pointLookupFiles(spark, path, "s", "cat077")
    assert(keptS.nonEmpty && keptS.size < 8)
    assert(FileSkipping.readPoint(spark, path, "s", "cat077").count() === 20L)
    // absent values prune EVERY file (exact, unlike a bloom's maybe)
    assert(FileSkipping.pointLookupFiles(spark, path, "v", 9999L)._1.isEmpty)
    assert(FileSkipping.readPoint(spark, path, "v", 9999L).count() === 0L)
    // RAW (unannotated) BINARY columns prune too: the engine's own
    // binary-vs-string equality is byte equality, so UTF-8 probe bytes are
    // the right comparison there (only OTHER annotations — decimal etc. —
    // must degrade to keep; see utf8Bytes)
    val binPath = tmp("fsk_dictbin")
    spark.range(0, 4000).toDF("id")
      .withColumn("b", format_string("cat%03d", col("id") % 200).cast("binary"))
      .repartition(8, col("b"))
      .write.parquet(binPath)
    val (keptB, _) = FileSkipping.pointLookupFiles(spark, binPath, "b", "cat077")
    assert(keptB.nonEmpty && keptB.size < 8,
      s"raw-binary dictionary should prune, kept ${keptB.size}")
    assert(FileSkipping.readPoint(spark, binPath, "b", "cat077").count() === 20L)
  }

  test("dictionary rung answers RANGE scans where stats and blooms cannot") {
    // hash layout on v: every file's [min,max] spans the domain, so range
    // stats keep everything; blooms only answer equality — the dictionary
    // is the only mechanism that can prune a range here
    val path = tmp("fsk_dictrange")
    spark.range(0, 4000).toDF("id")
      .withColumn("v", col("id") % 500)
      .repartition(8, col("v"))
      .write.parquet(path)
    val (keptStats, _) = FileSkipping.prunedFiles(spark, path, "v", 100L, 102L)
    assert(keptStats.size === 8, "range stats cannot prune a hash layout")
    val (kept, pruned) = FileSkipping.prunedFilesDict(spark, path, "v", 100L, 102L)
    assert(kept.size + pruned.size === 8)
    assert(kept.size <= 3 && kept.nonEmpty,
      s"3 values hash to <=3 files; dictionary kept ${kept.size}")
    import spark.implicits._
    assert(FileSkipping.readPrunedDict(spark, path, "v", 100L, 102L)
      .select("id").as[Long].collect().sorted ===
      (0L until 4000L).filter(i => i % 500 >= 100 && i % 500 <= 102).toArray)
    // a range outside the domain prunes every file, result exactly empty
    assert(FileSkipping.prunedFilesDict(spark, path, "v", 600L, 700L)._1.isEmpty)
    assert(FileSkipping.readPrunedDict(spark, path, "v", 600L, 700L).count() === 0L)
    // RAW binary with INVALID UTF-8 content: the byte 0xC5 alone is a bare
    // lead byte; String round-tripping would substitute U+FFFD (EF BF BD),
    // re-ordering it PAST the range bounds and wrongly pruning the file.
    // The raw-bytes comparison keeps it: [C5] sits inside
    // ["Ā"=C4 80, "Š"=C5 A0] in unsigned byte order.
    val rawPath = tmp("fsk_dictraw")
    spark.range(0, 400).toDF("id")
      .withColumn("b", when(col("id") % 2 === 0, lit(Array(0xC5.toByte)))
        .otherwise(lit(Array('A'.toByte))))
      .repartition(2, col("b"))
      .write.parquet(rawPath)
    val (keptRaw, _) =
      FileSkipping.prunedFilesDict(spark, rawPath, "b", "Ā", "Š")
    assert(keptRaw.nonEmpty,
      "file holding invalid-UTF-8 byte 0xC5 (in range by byte order) was pruned")

    // the staged l_pruned_scan_dict layout behaves the same way on real data
    val dir = "/root/testdata/sf0.001"
    val staged = graft.queries.RelationalQueries.dictOrdersPath(spark, dir)
    val (ks, _) = FileSkipping.prunedFiles(spark, staged, "o_custkey", 40L, 45L)
    assert(ks.size === 8, "stats keep all 8 staged files")
    val (kd, _) = FileSkipping.prunedFilesDict(spark, staged, "o_custkey", 40L, 45L)
    assert(kd.size < 8 && kd.nonEmpty,
      s"dictionary refine must open a strict subset, kept ${kd.size}")
    val got = FileSkipping.readPrunedDict(spark, staged, "o_custkey", 40L, 45L)
      .count()
    val want = graft.sources.Tables.orders(spark, dir)
      .where(col("o_custkey").between(40, 45)).count()
    assert(got === want && got > 0)
  }

  test("l_point_lookup_bloom's staged orders layout: stats keep every file, " +
    "the bloom is the pruning mechanism, result equals the raw table") {
    val dir = "/root/testdata/sf0.001"
    val staged = graft.queries.RelationalQueries.bloomedOrdersPath(spark, dir)
    // hash layout on o_custkey: every file's [min,max] spans the domain, so
    // a stats-only equality probe (range [42,42]) cannot rule anything out
    val (keptStats, prunedStats) =
      FileSkipping.prunedFiles(spark, staged, "o_custkey", 42L, 42L)
    assert(prunedStats.isEmpty && keptStats.size === 8,
      s"range stats should keep all 8 files, kept ${keptStats.size}")
    // the bloom must open a strict subset (1 true file + few false positives)
    val (keptBloom, prunedBloom) =
      FileSkipping.pointLookupFiles(spark, staged, "o_custkey", 42L)
    assert(keptBloom.size + prunedBloom.size === 8)
    assert(keptBloom.size <= 3,
      s"bloom pruned too little: kept ${keptBloom.size} of 8")
    // staged + pruned read ≡ raw-table filter, row for row
    val got = FileSkipping.readPoint(spark, staged, "o_custkey", 42L)
      .select("o_orderkey").as[Long].collect().sorted
    val want = graft.sources.Tables.orders(spark, dir)
      .where(col("o_custkey") === 42)
      .select("o_orderkey").as[Long].collect().sorted
    assert(got.nonEmpty && got === want)
  }

  test("l_zorder_scan's staged layout: min-max stats prune a z-ordered " +
    "dimension and the read equals the raw table") {
    val dir = "/root/testdata/sf0.001"
    val staged = graft.queries.RelationalQueries.zorderOrdersPath(spark, dir)
    val (kept, pruned) =
      FileSkipping.prunedFiles(spark, staged, "o_custkey", 20L, 40L)
    assert(pruned.nonEmpty,
      s"z-order bounds should prune some of ${kept.size + pruned.size} files " +
        "for a ~14%-of-domain custkey range")
    val got = FileSkipping.readPruned(spark, staged, "o_custkey", 20L, 40L)
      .count()
    val want = graft.sources.Tables.orders(spark, dir)
      .where(col("o_custkey").between(20, 40)).count()
    assert(got === want && got > 0)
  }

  test("stats-disabled files are never pruned: empty Statistics means unknowable, not all-null") {
    // parquet-mr materializes a NON-NULL but EMPTY Statistics object when a
    // column's stats were never written (parquet.column.statistics.enabled#col
    // = false). That must read as "cannot rule out", NOT as an all-null
    // chunk — conflating them silently drops matching rows from point
    // lookups and range scans.
    val path = tmp("fsk_nostats")
    spark.range(0, 400).toDF("id")
      .withColumn("s", format_string("k%04d", col("id")))
      .repartitionByRange(4, col("id"))
      .write
      .option("parquet.column.statistics.enabled#id", "false")
      .option("parquet.column.statistics.enabled#s", "false")
      // dictionary off too: this test pins the NOTHING-available degradation
      // (the dictionary rung would otherwise prune these chunks exactly)
      .option("parquet.enable.dictionary", "false")
      .parquet(path)
    // point lookup: no stats, no bloom → every file kept, result exact
    val (kept, pruned) = FileSkipping.pointLookupFiles(spark, path, "id", 123L)
    assert(pruned.isEmpty, s"pruned ${pruned.size} stats-less files — would drop rows")
    assert(kept.size === 4)
    import spark.implicits._
    assert(FileSkipping.readPoint(spark, path, "id", 123L)
      .select("id").as[Long].collect() === Array(123L))
    // range scan: hasStats=false → keep-all, result exact
    val (keptR, prunedR) = FileSkipping.prunedFiles(spark, path, "id", 100, 120)
    assert(prunedR.isEmpty && keptR.size === 4)
    assert(FileSkipping.readPruned(spark, path, "id", 100, 120)
      .select("id").as[Long].collect().sorted === (100L to 120L).toArray)
  }

  test("supplementary-character strings compare in unsigned UTF-8 order, not UTF-16") {
    // "￿" encodes as EF BF BF; U+1F600 (a non-BMP emoji) as F0 9F 98 80.
    // Unsigned UTF-8 (parquet's stringType order): "￿" < emoji, so a
    // file holding both has max = emoji and "￿" is inside its bounds.
    // UTF-16 code-unit order (Java String <=): "￿" (0xFFFF) sorts ABOVE
    // the emoji's lead surrogate (0xD83D), so a UTF-16 comparison would
    // prune the very file that contains the probed value.
    val path = tmp("fsk_supp")
    val emoji = new String(Character.toChars(0x1F600))
    Seq(("￿", 1L), (emoji, 2L)).toDF("s", "id")
      .coalesce(1).write.parquet(path)
    Seq(("apple", 3L), ("banana", 4L)).toDF("s", "id")
      .coalesce(1).write.mode("append").parquet(path)
    // point lookup keeps the supplementary file (and min-max prunes the
    // ascii file), returning the row
    val (kept, pruned) = FileSkipping.pointLookupFiles(spark, path, "s", "￿")
    assert(pruned.nonEmpty, "ascii file should min-max prune")
    import spark.implicits._
    assert(FileSkipping.readPoint(spark, path, "s", "￿")
      .select("id").as[Long].collect() === Array(1L))
    // range path agrees under the same ordering
    assert(FileSkipping.readPruned(spark, path, "s", "￿", "￿")
      .select("id").as[Long].collect() === Array(1L))
    assert(FileSkipping.readPruned(spark, path, "s", "￿", emoji)
      .select("id").as[Long].collect().sorted === Array(1L, 2L))
  }

  test("unsupported column types keep every file; mismatched bounds fail loudly") {
    val path = tmp("fsk_edge")
    spark.range(0, 100).toDF("id")
      .withColumn("flag", col("id") % 2 === 0)
      .repartition(4).write.parquet(path)
    // boolean stats are unsupported → no pruning, no error
    val (kept, pruned) = FileSkipping.prunedFiles(spark, path, "flag", 0, 1)
    assert(pruned.isEmpty && kept.size === 4)
    // integer literals against a long column are fine; strings are not
    intercept[IllegalArgumentException] {
      FileSkipping.prunedFiles(spark, path, "id", "a", "z")
    }
  }

  test("footer-stats/schema memo: repeated reads serve cached metadata; an " +
      "in-process rewrite through Tables.invalidate is seen fresh") {
    val path = tmp("fsk_memo")
    writeRanged(path)
    val first = FileSkipping.fileStats(spark, path, "id")
    assert(first.map(_.maxLong.get).max === 999L)
    assert(FileSkipping.readPruned(spark, path, "id", 0, 10_000).count() === 1000L)
    // memo must serve the same stats object-for-object on a second call
    assert(FileSkipping.fileStats(spark, path, "id") === first)
    // rewrite the table in place (different row count AND value domain),
    // invalidate like every in-process writer must, and re-read: the fresh
    // listing sees the new files, the memo must not resurrect old bounds
    spark.range(5000, 5100).toDF("id")
      .withColumn("v", col("id").cast("double"))
      .withColumn("s", format_string("k%04d", col("id")))
      .repartition(2).write.mode("overwrite").parquet(path)
    Tables.invalidate(new java.io.File(path).getParent)
    val second = FileSkipping.fileStats(spark, path, "id")
    assert(second.size === 2)
    assert(second.flatMap(_.minLong).min === 5000L)
    assert(second.flatMap(_.maxLong).max === 5099L)
    // pruned read-back (memoized schema path) sees only the new data
    assert(FileSkipping.readPruned(spark, path, "id", 0, 10_000).count() === 100L)
    assert(FileSkipping.readPruned(spark, path, "id", 0, 4999).count() === 0L)
  }
}
