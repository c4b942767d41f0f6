package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("sizing: bits grow with n, shrink with looser fpp; k >= 1; cap holds") {
    val m1 = BloomJoin.optimalNumBits(1000, 0.01)
    val m2 = BloomJoin.optimalNumBits(10000, 0.01)
    val m3 = BloomJoin.optimalNumBits(1000, 0.1)
    assert(m2 > m1 && m3 < m1)
    assert(BloomJoin.optimalNumBits(Long.MaxValue / 4, 0.0001) === (1L << 27))
    assert(BloomJoin.optimalK(1000, m1) >= 1)
  }

  test("inner via bloom equals plain inner join (skew + nulls both sides)") {
    val big = ((1 to 5000).map(i => (Some((i % 700).toLong), s"b$i")) ++
      Seq((None: Option[Long], "bnull1"), (None, "bnull2")))
      .toDF("k", "payload")
    val small = (Seq(3L, 14L, 159L, 265L, 358L, 979L).map(Some(_)) :+
      (None: Option[Long])).map(k => (k, s"s${k.getOrElse(-1L)}"))
      .toDF("sk", "name")
    val viaBloom = BloomJoin.inner(big, small, "k", "sk")
      .select("k", "payload", "name").collect().toSet
    val plain = big.join(small, col("k") === col("sk"), "inner")
      .select("k", "payload", "name").collect().toSet
    assert(viaBloom === plain)
    assert(viaBloom.nonEmpty, "test data must actually join")
  }

  test("semi via bloom equals plain left-semi join") {
    val big = (1 to 2000).map(i => ((i % 97).toLong, i)).toDF("k", "v")
    val small = Seq(5L, 13L, 42L).toDF("sk")
    val viaBloom = BloomJoin.semi(big, small, "k", "sk").collect().toSet
    val plain = big.join(small, col("k") === col("sk"), "left_semi")
      .collect().toSet
    assert(viaBloom === plain)
    assert(viaBloom.nonEmpty, "test data must actually join")
  }

  test("disjoint probe keys pass at ~fpp, not wholesale") {
    val small = (0L until 1000L).toDF("sk")
    val bloom = BloomJoin.build(small, "sk", fpp = 0.01)
    // probe keys share nothing with the build keys
    val probes = (1000000L until 1004000L).toDF("k")
    val passed = BloomJoin.filtered(probes, "k", bloom).count()
    // deterministic given fixed keys and xxhash64; 5x headroom over the
    // target rate so a re-derivation of m/k doesn't make this brittle
    assert(passed <= (4000 * 0.05).toLong,
      s"false-positive rate ${passed / 4000.0} far above target 0.01")
  }

  test("members always pass: no false negatives by construction") {
    val small = (0L until 500L).map(i => i * 7919L).toDF("sk")
    val bloom = BloomJoin.build(small, "sk")
    assert(BloomJoin.filtered(small.withColumnRenamed("sk", "k"), "k", bloom)
      .count() === 500L)
  }

  test("filtered() is a narrow filter: no exchange, stays codegen") {
    val small = Seq(1L, 2L, 3L).toDF("sk")
    val bloom = BloomJoin.build(small, "sk")
    // spark.range, not a local relation — ConvertToLocalRelation would
    // otherwise evaluate the filter at plan time and hide the physical shape
    val big = spark.range(1, 101).toDF("k")
    val plan = BloomJoin.filtered(big, "k", bloom)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bloom filter must not shuffle:\n$plan")
    // `*(1) Filter` = the filter runs inside whole-stage-codegen span 1
    assert(plan.contains("*(1) Filter"), s"filter fell out of codegen:\n$plan")
  }

  test("string keys work (hash is type-aware end to end)") {
    val big = (1 to 1000).map(i => (s"key${i % 50}", i)).toDF("k", "v")
    val small = Seq("key7", "key21", "key49").toDF("sk")
    val viaBloom = BloomJoin.inner(big, small, "k", "sk").collect().toSet
    val plain = big.join(small, col("k") === col("sk"), "inner").collect().toSet
    assert(viaBloom === plain)
    assert(viaBloom.size === 60)
  }

  test("empty small side: nothing passes, join is empty like the plain one") {
    val big = (1 to 100).map(_.toLong).toDF("k")
    val small = spark.range(0).toDF("sk")
    assert(BloomJoin.inner(big, small, "k", "sk").count() === 0L)
  }
}
