package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** **Merging t-digest** (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", arXiv:1902.04023) — the MERGEABLE quantile
  * sketch that completes the engine's sketch-per-partition rollup family:
  * HLL answers "how many distinct", Count-Min answers "how often", t-digest
  * answers "what is q0.99" over any partition range WITHOUT rescanning raw
  * data.
  *
  * Why t-digest and not a uniform sample or fixed bins: the k₁ scale
  * function caps centroid weight near the tails (centroid capacity
  * ∝ q(1−q)), so relative rank error stays tight exactly where production
  * latency/size percentiles live (q99, q999), while the sketch stays a few
  * KB regardless of input size.
  *
  * This is the MERGING variant: values buffer locally and collapse into
  * sorted centroids in one pass (sort + greedy compress); two digests merge
  * by merging their sorted centroid lists and compressing once. Both paths
  * are deterministic given input order — no RNG — and weight is conserved
  * exactly (`totalWeight` is the true count, asserted in TDigestSpec).
  *
  * 100 TB shape: one `tdigestAgg` hash-agg per partition (map-side partial
  * merge like any Spark agg), ~KB sketch per group persisted beside the
  * data, any-range quantiles via `tdigestMergeAgg` over the stored sketches.
  */
final class TDigest(
    val compression: Double,
    private var means: Array[Double],
    private var weights: Array[Double],
    private var buf: Array[Double],
    private var bufN: Int) extends Serializable {

  import TDigest._

  def centroidCount: Int = { flush(); means.length }

  def totalWeight: Double = weights.sum + bufN

  def add(x: Double): Unit = {
    require(!x.isNaN, "NaN cannot be ranked")
    if (bufN == buf.length) flush()
    buf(bufN) = x
    bufN += 1
  }

  /** Collapse the unsorted buffer into the centroid arrays. */
  private def flush(): Unit = {
    if (bufN == 0) return
    val sorted = java.util.Arrays.copyOf(buf, bufN)
    java.util.Arrays.sort(sorted)
    val (m, w) = mergeSorted(means, weights, sorted,
      Array.fill(sorted.length)(1.0))
    val (cm, cw) = compress(m, w, compression)
    means = cm; weights = cw; bufN = 0
  }

  /** Merge `other` into a NEW digest (inputs untouched). */
  def mergeWith(other: TDigest): TDigest = {
    require(other.compression == compression,
      "cannot merge digests with different compressions")
    flush(); other.flush()
    val (m, w) = mergeSorted(means, weights, other.means, other.weights)
    val (cm, cw) = compress(m, w, compression)
    new TDigest(compression, cm, cw, new Array[Double](BufSize), 0)
  }

  /** Estimated value at quantile `q` ∈ [0, 1]: linear interpolation between
    * adjacent centroid means under the half-weight convention (each
    * centroid's mean sits at the midpoint of its weight span). */
  def quantile(q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile $q outside [0,1]")
    flush()
    val n = means.length
    if (n == 0) return Double.NaN
    if (n == 1) return means(0)
    val w = totalWeight
    val target = q * w
    var cum = 0.0
    var i = 0
    while (i < n) {
      val center = cum + weights(i) / 2
      if (target < center) {
        if (i == 0) return means(0)
        val prevCenter = cum - weights(i - 1) / 2
        val frac = (target - prevCenter) / (center - prevCenter)
        return means(i - 1) + frac * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means(n - 1)
  }

  /** Fixed-layout bytes: compression, centroid count, means, weights. */
  def serialize: Array[Byte] = {
    flush()
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + means.length * 16)
    bb.putDouble(compression).putInt(means.length)
    means.foreach(bb.putDouble)
    weights.foreach(bb.putDouble)
    bb.array()
  }
}

object TDigest {
  private val BufSize = 512

  def empty(compression: Double = 100.0): TDigest = {
    require(compression >= 20, s"compression $compression too small to bound error")
    new TDigest(compression, Array.empty, Array.empty,
      new Array[Double](BufSize), 0)
  }

  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val compression = bb.getDouble
    val n = bb.getInt
    val means = Array.fill(n)(bb.getDouble)
    val weights = Array.fill(n)(bb.getDouble)
    new TDigest(compression, means, weights, new Array[Double](BufSize), 0)
  }

  /** k₁ scale function: k(q) = δ/(2π)·asin(2q−1). Its derivative blows up
    * at q→0,1, forcing tail centroids to weight ~1 — the tail-accuracy
    * property the quantile use case needs. */
  private def k1(q: Double, compression: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Merge two mean-sorted (means, weights) centroid streams. */
  private def mergeSorted(m1: Array[Double], w1: Array[Double],
      m2: Array[Double], w2: Array[Double]): (Array[Double], Array[Double]) = {
    val n = m1.length + m2.length
    val m = new Array[Double](n); val w = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (i < m1.length && j < m2.length) {
      if (m1(i) <= m2(j)) { m(o) = m1(i); w(o) = w1(i); i += 1 }
      else { m(o) = m2(j); w(o) = w2(j); j += 1 }
      o += 1
    }
    while (i < m1.length) { m(o) = m1(i); w(o) = w1(i); i += 1; o += 1 }
    while (j < m2.length) { m(o) = m2(j); w(o) = w2(j); j += 1; o += 1 }
    (m, w)
  }

  /** One greedy compress pass over a mean-sorted centroid stream: absorb the
    * next centroid while the k₁ size bound allows (k(qRight) − k(qLeft) ≤ 1),
    * else emit. Deterministic; weight-exact (weighted-mean absorption). */
  private def compress(m: Array[Double], w: Array[Double],
      compression: Double): (Array[Double], Array[Double]) = {
    val n = m.length
    if (n == 0) return (m, w)
    val total = w.sum
    val om = Array.newBuilder[Double]; val ow = Array.newBuilder[Double]
    var qLeft = 0.0
    var curM = m(0); var curW = w(0)
    var i = 1
    while (i < n) {
      val qRight = qLeft + (curW + w(i)) / total
      if (k1(qRight, compression) - k1(qLeft, compression) <= 1.0) {
        // absorb: exact weighted mean keeps Σw·mean and Σw invariant
        val nw = curW + w(i)
        curM = (curM * curW + m(i) * w(i)) / nw
        curW = nw
      } else {
        om += curM; ow += curW
        qLeft += curW / total
        curM = m(i); curW = w(i)
      }
      i += 1
    }
    om += curM; ow += curW
    (om.result(), ow.result())
  }

  /** `groupBy(...).agg(tdigestAgg(col))` — sketch a double column.
    * NULL and NaN inputs are SKIPPED, matching SQL `percentile`'s
    * null-skipping semantics — the digest and the exact-percentile oracle
    * agree on dirty data instead of the digest failing the whole query
    * (NaN is unrankable; a boxed input encoder keeps nulls visible). */
  lazy val tdigestAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[java.lang.Double, TDigest, Array[Byte]] {
      def zero: TDigest = TDigest.empty()
      def reduce(b: TDigest, x: java.lang.Double): TDigest = {
        if (x != null && !x.isNaN) b.add(x.doubleValue)
        b
      }
      def merge(a: TDigest, b: TDigest): TDigest = a.mergeWith(b)
      def finish(d: TDigest): Array[Byte] = d.serialize
      def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }, Encoders.DOUBLE)

  /** `agg(tdigestMergeAgg(col))` over STORED sketches — the any-range rollup
    * path: merge per-partition digests without touching raw data. */
  lazy val tdigestMergeAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[Array[Byte], TDigest, Array[Byte]] {
      def zero: TDigest = TDigest.empty()
      def reduce(b: TDigest, bytes: Array[Byte]): TDigest =
        b.mergeWith(TDigest.deserialize(bytes))
      def merge(a: TDigest, b: TDigest): TDigest = a.mergeWith(b)
      def finish(d: TDigest): Array[Byte] = d.serialize
      def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }, Encoders.BINARY)

  /** Quantile extraction from a serialized digest, as a column function. */
  def quantileOf(sketch: Column, q: Double): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (bytes: Array[Byte]) => deserialize(bytes).quantile(q))
    f(sketch)
  }
}
