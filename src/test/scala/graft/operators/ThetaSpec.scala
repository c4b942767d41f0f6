package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ThetaSpec extends SparkSpec {

  private def hash64(s: String): Long =
    // any stable 64-bit mix works for the unit tests; the DataFrame path
    // uses Spark's xxhash64
    scala.util.hashing.MurmurHash3.stringHash(s).toLong << 32 |
      (scala.util.hashing.MurmurHash3.stringHash(s.reverse).toLong & 0xffffffffL)

  test("exact below k, bounded error above") {
    val s = ThetaSketch.empty(k = 512)
    (1 to 100).foreach(i => s.update(hash64(s"item$i")))
    assert(s.estimate === 100.0, "below k the sketch is exact")
    val big = ThetaSketch.empty(k = 4096)
    val n = 100000
    (1 to n).foreach(i => big.update(hash64(s"doc-$i")))
    val rse = 1.0 / math.sqrt(4096 - 1)
    assert(math.abs(big.estimate - n) / n < 5 * rse,
      s"estimate ${big.estimate} off by ${math.abs(big.estimate - n) / n}")
  }

  test("duplicates do not inflate; update order and merge order are irrelevant") {
    val a = ThetaSketch.empty(k = 256)
    (1 to 1000).foreach(i => a.update(hash64(s"x$i")))
    (1 to 1000).foreach(i => a.update(hash64(s"x$i"))) // again
    val b = ThetaSketch.empty(k = 256)
    (1000 to 1 by -1).foreach(i => b.update(hash64(s"x$i")))
    assert(a.estimate === b.estimate)
    assert(a.serialize.toSeq === b.serialize.toSeq,
      "same distinct set must give the identical sketch regardless of order")
  }

  test("merge is exactly the sketch of the union (deterministic)") {
    val k = 512
    val direct = ThetaSketch.empty(k)
    (1 to 6000).foreach(i => direct.update(hash64(s"u$i")))
    val a = ThetaSketch.empty(k)
    (1 to 4000).foreach(i => a.update(hash64(s"u$i")))
    val b = ThetaSketch.empty(k)
    (2000 to 6000).foreach(i => b.update(hash64(s"u$i"))) // overlapping
    val merged = a.mergeWith(b)
    assert(merged.serialize.toSeq === direct.serialize.toSeq,
      "KMV merge must equal sketching the union directly")
  }

  test("intersection / difference / jaccard estimates within bounds") {
    val k = 4096
    def sk(range: Range, tag: String) = {
      val s = ThetaSketch.empty(k)
      range.foreach(i => s.update(hash64(s"$tag$i")))
      s
    }
    // |A|=60k, |B|=60k, |A∩B|=20k (shared tag), jaccard = 20k/100k = 0.2
    val a = sk(1 to 40000, "onlyA").mergeWith(sk(1 to 20000, "shared"))
    val b = sk(1 to 40000, "onlyB").mergeWith(sk(1 to 20000, "shared"))
    val inter = ThetaSketch.intersectEstimate(a, b)
    assert(math.abs(inter - 20000) / 20000 < 0.15,
      s"intersection estimate $inter vs 20000")
    val diff = ThetaSketch.aNotBEstimate(a, b)
    assert(math.abs(diff - 40000) / 40000 < 0.15, s"A\\B estimate $diff")
    val j = ThetaSketch.jaccardEstimate(a, b)
    assert(math.abs(j - 0.2) < 0.05, s"jaccard estimate $j vs 0.2")
  }

  test("serialization round-trips the sketch and its algebra") {
    val s = ThetaSketch.empty(k = 128)
    (1 to 5000).foreach(i => s.update(hash64(s"r$i")))
    val back = ThetaSketch.deserialize(s.serialize)
    assert(back.estimate === s.estimate)
    assert(ThetaSketch.intersectEstimate(s, back) === s.estimate,
      "a sketch intersected with its own copy is itself")
  }

  test("mergeWith downgrades to the smaller k (stream-state × batch sketch)") {
    // the advertised lambda composition: a k=256 streaming-state sketch
    // merges with a default-k batch sketch — result is the min-k sketch of
    // the union, exactly what sketching the union at k=256 would give
    val small = ThetaSketch.empty(k = 256)
    (1 to 5000).foreach(i => small.update(hash64(s"m$i")))
    val big = ThetaSketch.empty(k = 4096)
    (3000 to 9000).foreach(i => big.update(hash64(s"m$i")))
    val direct = ThetaSketch.empty(k = 256)
    (1 to 9000).foreach(i => direct.update(hash64(s"m$i")))
    val merged = small.mergeWith(big)
    assert(merged.k === 256)
    assert(merged.serialize.toSeq === direct.serialize.toSeq,
      "cross-k merge must equal the min-k sketch of the union")
  }

  test("merge-agg of an EMPTY small-k sketch downgrades k in any row order") {
    import spark.implicits._
    // regression: the rollup aggregator used to infer its zero buffer from
    // emptiness, so a genuinely EMPTY k=256 sketch (all-null slice) was
    // "adopted over" when it arrived first — result k depended on row
    // order. Both orders must now give the k=256 sketch of the union.
    val emptySmall = ThetaSketch.empty(k = 256).serialize
    val big = ThetaSketch.empty(k = 4096)
    (1 to 5000).foreach(i => big.update(hash64(s"o$i")))
    val direct = ThetaSketch.empty(k = 256)
    (1 to 5000).foreach(i => direct.update(hash64(s"o$i")))
    def rollup(first: Array[Byte], second: Array[Byte]): Array[Byte] =
      Seq(first, second).toDF("sk").coalesce(1)
        .agg(ThetaSketch.thetaMergeAgg(col("sk")).as("sk"))
        .head.getAs[Array[Byte]]("sk")
    val ab = rollup(emptySmall, big.serialize)
    val ba = rollup(big.serialize, emptySmall)
    assert(ab.toSeq === ba.toSeq, "merge result must not depend on row order")
    assert(ab.toSeq === direct.serialize.toSeq,
      "an empty sketch still contributes its k to the downgrade")
  }

  test("NULLs are excluded via hashCol (bare xxhash64 would count the seed)") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val est = df.agg(ThetaSketch.thetaAgg(ThetaSketch.hashCol(col("v"))).as("sk"))
      .select(ThetaSketch.estimateOf(col("sk"))).head.getDouble(0)
    assert(est === 2.0, s"NULLs must not count as a phantom item, got $est")
    // and the footgun this guards: bare xxhash64 DOES produce the seed
    val bare = df.agg(ThetaSketch.thetaAgg(xxhash64(col("v"))).as("sk"))
      .select(ThetaSketch.estimateOf(col("sk"))).head.getDouble(0)
    assert(bare === 3.0, "documents why hashCol exists")
  }

  test("DataFrame rollup: sketch per day, merged estimate vs exact distinct") {
    import spark.implicits._
    // 3 'days' with overlapping user sets — the stored-sketch rollup path
    val rows = (1 to 30000).map(i => (i % 3, s"user${i % 7000}"))
    val df = rows.toDF("day", "uid")
    val daily = df.groupBy("day")
      .agg(ThetaSketch.thetaAgg(ThetaSketch.hashCol(col("uid"))).as("sk"))
    assert(daily.count() === 3)
    val merged = daily.agg(ThetaSketch.thetaMergeAgg(col("sk")).as("sk"))
      .select(ThetaSketch.estimateOf(col("sk")).as("est")).head.getDouble(0)
    val exact = df.select("uid").distinct().count()
    assert(math.abs(merged - exact) / exact < 0.1,
      s"rollup estimate $merged vs exact $exact")
    // estimates are deterministic under repartition (hash-set semantics)
    val daily2 = df.repartition(13).groupBy("day")
      .agg(ThetaSketch.thetaAgg(ThetaSketch.hashCol(col("uid"))).as("sk"))
    val merged2 = daily2.agg(ThetaSketch.thetaMergeAgg(col("sk")).as("sk"))
      .select(ThetaSketch.estimateOf(col("sk")).as("est")).head.getDouble(0)
    assert(merged === merged2, "partitioning must not change the sketch")
  }
}
