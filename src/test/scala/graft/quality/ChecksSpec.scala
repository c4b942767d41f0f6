package graft.quality

import graft.SparkSpec
import graft.bdb.Fixtures
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {

  test("clean tracking fixture passes every rule") {
    val df = Fixtures.simplePlay(spark)
    assert(Checks.report(df, Checks.trackingRules).count() === 0)
    assert(Checks.oneTargetPerPlay(df).count() === 0)
    Checks.enforce(df, Checks.trackingRules) // must not throw
  }

  test("violations are counted per rule in one pass") {
    val df = Fixtures.simplePlay(spark)
      .withColumn("s", when(col("frame_id") === 1, 99.0).otherwise(col("s")))
      .withColumn("x", when(col("frame_id") === 2, -5.0).otherwise(col("x")))
    val rep = Checks.report(df, Checks.trackingRules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("speed_physical") === 2L) // both players at frame 1
    assert(rep("x_in_field") === 2L)
    intercept[IllegalStateException] {
      Checks.enforce(df, Checks.trackingRules)
    }
  }

  test("requireColumns fail-loud lists all missing columns") {
    val df = Fixtures.simplePlay(spark)
    Checks.requireColumns(df, Seq("game_id", "x", "y"))
    val e = intercept[IllegalArgumentException] {
      Checks.requireColumns(df, Seq("game_id", "nope1", "nope2"))
    }
    assert(e.getMessage.contains("nope1"))
    assert(e.getMessage.contains("nope2"))
  }

  test("oneTargetPerPlay flags plays with duplicate targets") {
    val df = Fixtures.simplePlay(spark)
      .withColumn("player_role",
        when(col("nfl_id") === 20, "Targeted Receiver").otherwise(col("player_role")))
    val bad = Checks.oneTargetPerPlay(df).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[Long]("n_targets") === 2L)
  }

  test("enforceStream passes clean batches and fails the query on violations") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ckpt = java.nio.file.Files.createTempDirectory("gate").toString
    val rules = Seq(Checks.Rule("positive", col("v") > 0.0))
    val seen = new java.util.concurrent.atomic.AtomicLong(0)

    val input = MemoryStream[(Long, Double)]
    val q = Checks.enforceStream(
      input.toDF().toDF("id", "v"), rules, s"$ckpt/c1") {
      (batch, _) => seen.addAndGet(batch.count())
    }
    try {
      input.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      assert(seen.get() === 2L)
      input.addData((3L, -1.0)) // violates → batch throws → query fails
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("positive") ||
        (e.getCause != null && e.getCause.getMessage.contains("positive")))
      assert(seen.get() === 2L) // bad batch never reached the sink
    } finally if (q.isActive) q.stop()
  }

  test("psi: zero for identical distributions, large for a shift, finite for empty bins") {
    import spark.implicits._
    val edges = Seq(10.0, 20.0, 30.0)
    val base = (1 to 100).map(i => (i % 40).toDouble).toDF("v")
    val same = Checks.psi(base, base, "v", edges).head()
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[Long]("n_base") === 100L)

    // shifted distribution: everything lands in the top bin
    val shifted = (1 to 100).map(_ => 35.0).toDF("v")
    val drift = Checks.psi(base, shifted, "v", edges).head().getAs[Double]("psi")
    assert(drift > 0.25, s"expected major drift, got $drift")
    assert(!drift.isInfinite) // empty-bin proportions clamp at eps, never ±inf

    intercept[IllegalArgumentException] {
      Checks.psi(base, base, "v", Seq(20.0, 10.0)) // unsorted edges
    }
  }
}
