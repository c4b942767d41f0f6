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
