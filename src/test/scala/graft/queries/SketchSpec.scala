package graft.queries

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a_hll_mergeable: merged daily sketches == one direct sketch, near exact") {
    val row = Registry.all.find(_.name == "a_hll_mergeable").get
      .run(spark, dir).head()
    val nDays = row.getAs[Long]("n_days")
    val merged = row.getAs[Long]("merged_users")
    val direct = row.getAs[Long]("direct_users")
    val exact = row.getAs[Long]("exact_users")
    assert(nDays > 1, "needs multiple partitions for the merge to mean anything")
    // register-wise max merge is order-independent, so merged-of-parts and
    // direct sketching see identical registers. The ESTIMATES can still
    // differ slightly at higher cardinalities (the union result estimates via
    // a different path than a stream-built sketch in dense HLL mode), so pin
    // near-agreement, not bit-equality.
    assert(math.abs(merged - direct).toDouble / math.max(direct, 1L) < 0.01,
      s"merged $merged vs direct $direct disagree beyond 1%")
    // default lgConfigK=12 -> ~1.6% standard error; 5% is a safe gate
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact drifted past 5%")
  }

  test("a_cms_topk: merged CMS never underestimates, stays within eps*N") {
    import org.apache.spark.sql.functions._
    val rows = Registry.all.find(_.name == "a_cms_topk").get
      .run(spark, dir).collect()
    assert(rows.length === 10)
    val n = graft.sources.Tables.events(spark, dir).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_n")
      // CMS counters only ever over-count (hash collisions add, never
      // subtract): estimate >= exact ALWAYS, and <= exact + eps*N at the
      // configured confidence (eps=0.001 -> slack 0.1% of the stream)
      assert(est >= exact, s"CMS underestimated: $est < $exact")
      assert(est <= exact + (0.001 * n).toLong + 1,
        s"CMS estimate $est beyond exact $exact + eps*N")
    }
  }

  test("CMS merge of per-day sketches is bit-identical to one direct sketch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
    val daily = ev.groupBy("day")
      .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42)).as("cms"))
      .select("cms").collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("cms")))
    assert(daily.length > 1)
    val merged = daily.reduce { (a, b) => a.mergeInPlace(b); a }
    val direct = CountMinSketch.readFrom(
      ev.agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42))
        .as("cms")).head().getAs[Array[Byte]]("cms"))
    // counter-wise addition with a shared seed: merged-of-parts and
    // direct-over-union hold IDENTICAL counters, so every estimate agrees
    val users = ev.select("user_id").distinct().collect().map(_.getLong(0))
    users.foreach { u =>
      assert(merged.estimateCount(u) === direct.estimateCount(u), s"user $u")
    }
    assert(merged.totalCount() === direct.totalCount())
  }
}
