package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TDigestSpec extends SparkSpec {

  /** Max rank error we hold the δ=100 digest to, as a fraction of n.
    * Dunning's bound for k₁ is O(q(1−q)/δ) on rank; 1% of n is a loose,
    * stable ceiling for mid quantiles and far looser than observed. */
  private val RankTolerance = 0.01

  private def rankOf(sorted: Array[Double], v: Double): Int = {
    val i = java.util.Arrays.binarySearch(sorted, v)
    if (i >= 0) i else -i - 1
  }

  private def assertQuantiles(sorted: Array[Double], td: TDigest,
      qs: Seq[Double], tolFrac: Double = RankTolerance): Unit = {
    val n = sorted.length
    qs.foreach { q =>
      val est = td.quantile(q)
      val rankErr = math.abs(rankOf(sorted, est) - q * n)
      assert(rankErr <= tolFrac * n + 1,
        s"q=$q: estimate $est has rank error $rankErr (n=$n)")
    }
  }

  private val Qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("uniform data: rank error within bound at every probed quantile") {
    val xs = (0 until 20000).map(i => ((i * 7919) % 20000).toDouble).toArray
    val td = TDigest.empty()
    xs.foreach(td.add)
    assertQuantiles(xs.sorted, td, Qs)
    assert(td.totalWeight === 20000.0)
  }

  test("heavy-tailed data: tail quantiles stay accurate (the k1 property)") {
    // deterministic lognormal-ish skew: exp of a triangular ramp
    val xs = (0 until 20000).map { i =>
      val u = ((i * 104729) % 20000) / 20000.0
      math.exp(6 * u)
    }.toArray
    val td = TDigest.empty()
    xs.foreach(td.add)
    assertQuantiles(xs.sorted, td, Qs :+ 0.999)
  }

  test("merge of parts covers the union within the same bound; weight exact") {
    val xs = (0 until 30000).map(i => ((i * 31337) % 30000).toDouble).toArray
    val parts = xs.grouped(10000).map { chunk =>
      val d = TDigest.empty(); chunk.foreach(d.add); d
    }.toSeq
    val merged = parts.reduce(_ mergeWith _)
    assert(merged.totalWeight === 30000.0)
    assertQuantiles(xs.sorted, merged, Qs, tolFrac = 2 * RankTolerance)
    // centroid count stays bounded by the compression, not the data size
    assert(merged.centroidCount < 200,
      s"digest grew unboundedly: ${merged.centroidCount} centroids")
  }

  test("serialization round-trips every quantile exactly") {
    val td = TDigest.empty()
    (0 until 5000).foreach(i => td.add(math.sin(i) * 100))
    val back = TDigest.deserialize(td.serialize)
    Qs.foreach(q => assert(back.quantile(q) === td.quantile(q)))
  }

  test("degenerate digests: empty is NaN, singleton is the value") {
    assert(TDigest.empty().quantile(0.5).isNaN)
    val one = TDigest.empty(); one.add(42.0)
    assert(one.quantile(0.0) === 42.0 && one.quantile(1.0) === 42.0)
  }

  test("DataFrame aggs: per-day sketch + distributed merge matches exact percentiles") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.eventsUs(spark, dir)
      .select(expr("tus div 86400000000").as("day"), col("value"))
    val daily = ev.groupBy("day").agg(TDigest.tdigestAgg(col("value")).as("td"))
    assert(daily.count() > 1, "need multiple days for a real rollup")
    val mergedBytes = daily.agg(TDigest.tdigestMergeAgg(col("td")).as("td"))
      .head().getAs[Array[Byte]]("td")
    val merged = TDigest.deserialize(mergedBytes)
    val xs = ev.select("value").collect().map(_.getDouble(0)).sorted
    assert(merged.totalWeight === xs.length.toDouble)
    assertQuantiles(xs, merged, Seq(0.5, 0.9, 0.99), tolFrac = 2 * RankTolerance)
  }

  test("NULL and NaN inputs are skipped, matching percentile's null semantics") {
    // dirty column: nulls and NaNs interleaved with real values — the digest
    // must aggregate the clean subset instead of failing the query, agreeing
    // with SQL percentile (skips nulls) on the same rows
    import org.apache.spark.sql.functions.{col, expr, when, lit}
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v",
        when(col("id") % 10 === 0, lit(null).cast("double"))
          .when(col("id") % 10 === 1, lit(Double.NaN))
          .otherwise(col("id").cast("double")))
    val row = df.agg(
      TDigest.tdigestAgg(col("v")).as("td"),
      expr("percentile(CASE WHEN NOT isnan(v) THEN v END, 0.5)").as("exact_p50"))
      .head()
    val d = TDigest.deserialize(row.getAs[Array[Byte]]("td"))
    assert(d.totalWeight === 800.0, "exactly the non-null non-NaN rows")
    val xs = (0 until 1000).filter(i => i % 10 >= 2).map(_.toDouble).sorted.toArray
    assertQuantiles(xs, d, Seq(0.1, 0.5, 0.9), tolFrac = RankTolerance)
    assert(math.abs(d.quantile(0.5) - row.getAs[Double]("exact_p50"))
      <= (xs.last - xs.head) * 0.02)
  }

  test("registry a_tdigest_quantiles: digest columns sit near the exact columns") {
    val row = graft.queries.Registry.all.find(_.name == "a_tdigest_quantiles").get
      .run(spark, "/root/testdata/sf0.001").head()
    val n = row.getAs[Long]("n_events")
    assert(n > 0 && row.getAs[Long]("n_days") > 1)
    // value-domain sanity: the self-audit columns bracket the estimates
    // loosely (rank bound is the real gate, asserted above on raw data)
    val spread = math.abs(row.getAs[Double]("exact_p99") -
      row.getAs[Double]("exact_p50")) + 1e-9
    assert(math.abs(row.getAs[Double]("td_p50") - row.getAs[Double]("exact_p50"))
      <= 0.2 * spread)
    assert(math.abs(row.getAs[Double]("td_p99") - row.getAs[Double]("exact_p99"))
      <= 0.2 * spread)
  }
}
