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
    val ev = graft.sources.Tables.eventsUs(spark, dir)
      .select(col("user_id"), expr("tus div 86400000000").as("day"))
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

  test("sketch merges are associative: merge(a, merge(b, c)) == merge(merge(a, b), c)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = graft.sources.Tables.eventsUs(spark, dir)
      .select(col("user_id"), expr("tus div 86400000000").as("day"))
    // three disjoint day-slices as the parts
    val parts = ev.withColumn("slice", pmod(col("day"), lit(3)))
    def cmsOf(slice: Int): Array[Byte] = parts.filter(col("slice") === slice)
      .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42))
        .as("cms")).head().getAs[Array[Byte]]("cms")
    val Seq(a, b, c) = Seq(0, 1, 2).map(cmsOf)
    def cms(bytes: Array[Byte]) = CountMinSketch.readFrom(bytes)
    def ser(s: CountMinSketch): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(); s.writeTo(bos); bos.toByteArray
    }
    // mergeInPlace mutates the receiver — rebuild from bytes per grouping
    val left = { val ab = cms(a); ab.mergeInPlace(cms(b)); ab.mergeInPlace(cms(c)); ab }
    val right = { val bc = cms(b); bc.mergeInPlace(cms(c))
      val abc = cms(a); abc.mergeInPlace(bc); abc }
    // counter-wise addition is associative — the serialized sketches are
    // BIT-EQUAL, not just estimate-equal
    assert(java.util.Arrays.equals(ser(left), ser(right)),
      "CMS merge groupings diverged")

    // HLL: register-wise max through hll_union_agg — associativity asserted
    // at the serialized-sketch level by re-associating the union in SQL
    val daily = parts.groupBy("slice")
      .agg(hll_sketch_agg(col("user_id")).as("sk")).cache()
    def unionOf(slices: Seq[Int]): Array[Byte] = daily
      .filter(col("slice").isin(slices.map(Integer.valueOf): _*))
      .agg(hll_union_agg(col("sk")).as("u")).head().getAs[Array[Byte]]("u")
    def estimateOf(parts2: Seq[Array[Byte]]): Long = spark.createDataFrame(
        java.util.List.copyOf(java.util.Arrays.asList(
          parts2.map(org.apache.spark.sql.Row(_)): _*)),
        new org.apache.spark.sql.types.StructType()
          .add("u", org.apache.spark.sql.types.BinaryType))
      .agg(hll_sketch_estimate(hll_union_agg(col("u"))).as("e")).head().getLong(0)
    val ab = estimateOf(Seq(unionOf(Seq(0, 1)), unionOf(Seq(2))))
    val bc = estimateOf(Seq(unionOf(Seq(1, 2)), unionOf(Seq(0))))
    assert(ab === bc, s"HLL union re-association diverged: $ab vs $bc")
    daily.unpersist()
  }
}
