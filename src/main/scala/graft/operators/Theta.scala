package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** **Theta sketch** (KMV — k minimum values with a threshold θ; Beyer et
  * al., "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD'07; the Apache DataSketches theta family follows the
  * same construction) — the mergeable distinct sketch that closes the one
  * gap HLL leaves: **set-expression estimates**. HLL merges by register max,
  * so it answers unions only; a theta sketch RETAINS its sample of hash
  * values, so two sketches also answer intersection, difference, and
  * Jaccard — without a second pass over raw data.
  *
  * Where that matters in a training-data pipeline: estimating the overlap
  * between two corpora/crawl snapshots (how much would dedup remove?),
  * or between a corpus and a benchmark (how contaminated are we, roughly?)
  * BEFORE paying for the exact join — the estimate routes the decision;
  * the exact operators ([[graft.queries.DedupQueries]],
  * `d_contamination`) run only where it says the work is worth it.
  *
  * Construction: items are hashed UPSTREAM with `xxhash64` (codegen'd,
  * map-side — the UDAF sees only longs), normalized to u ∈ [0,1). The
  * sketch keeps the k smallest distinct u values below its threshold θ
  * (θ = 1 until k+1 values are seen, then the (k+1)-th smallest). Every
  * retained u is a uniform sample of the distinct domain restricted to
  * [0, θ), so:
  *
  *  - estimate(A)   = |S_A| / θ_A            (exact while θ = 1)
  *  - A ∪ B: keep the k smallest of S_A ∪ S_B under min(θ) — IDENTICAL to
  *    sketching the union directly (deterministic, order-independent)
  *  - A ∩ B: |S_A ∩ S_B restricted below θ_∩| / θ_∩, θ_∩ = min(θ_A, θ_B)
  *  - relative standard error ≈ 1 / sqrt(k − 1) (1.6 % at the default
  *    k = 4096, ~32 KB serialized — 16 header bytes + 8 per retained hash)
  *
  * 100 TB shape: one hash-agg per partition/day (map-side partial merge
  * like any Spark agg), a KB-scale sketch per group stored beside the
  * data; any-range overlap questions are answered by merging stored
  * sketches — the same rollup discipline as HLL / CMS / t-digest.
  */
final class ThetaSketch(private var kVar: Int) extends Serializable {
  require(kVar >= 16, s"k must be >= 16, got $kVar")

  def k: Int = kVar

  /** Retained normalized hashes, each < theta; size <= k. */
  private[operators] var retained: java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()
  private[operators] var theta: Double = 1.0

  /** True only for an Aggregator ZERO buffer that has absorbed no input.
    * The merge aggregator must distinguish "nothing yet" (adopt the other
    * side verbatim, k included) from a REAL empty sketch (mergeWith, which
    * correctly downgrades k to the smaller side) — inferring zero-ness from
    * `retained.isEmpty && theta == 1.0` conflates the two and makes a
    * mixed-k merge's result k depend on encounter order. */
  private[operators] var isZeroBuffer: Boolean = false

  /** Map a 64-bit hash to an exact double in [0,1): the top 53 bits as a
    * dyadic fraction — deterministic, uniform, equality-safe. */
  private def norm(h: Long): Double = (h >>> 11) * ThetaSketch.Scale

  def update(hash: Long): Unit = {
    val u = norm(hash)
    if (u < theta && retained.add(Double.box(u)) && retained.size > k) {
      // evict the largest; it becomes the new threshold (the (k+1)-th
      // smallest distinct value seen so far)
      theta = retained.pollLast().doubleValue
    }
  }

  /** Merge; sketches of DIFFERENT k merge to the smaller k (standard KMV
    * downgrade — the result is exactly the min-k sketch of the union), so
    * a small streaming-state sketch and a large batch sketch combine
    * without ceremony. */
  def mergeWith(other: ThetaSketch): ThetaSketch = {
    kVar = math.min(kVar, other.k)
    val t = math.min(theta, other.theta)
    val it = other.retained.iterator()
    while (it.hasNext) {
      val u = it.next()
      if (u < t) retained.add(u)
    }
    // drop own values the tighter threshold excludes, then trim to k
    retained = new java.util.TreeSet(retained.headSet(Double.box(t), false))
    theta = t
    while (retained.size > k) theta = retained.pollLast().doubleValue
    this
  }

  /** Distinct-count estimate; exact while fewer than k+1 distinct values
    * have been seen (θ still 1). */
  def estimate: Double = retained.size / theta

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 4 + 8 * retained.size)
    bb.putInt(k).putDouble(theta).putInt(retained.size)
    retained.forEach(u => { bb.putDouble(u.doubleValue); () })
    bb.array()
  }
}

object ThetaSketch {
  private val Scale = 1.0 / (1L << 53).toDouble
  val DefaultK = 4096

  def empty(k: Int = DefaultK): ThetaSketch = new ThetaSketch(k)

  private def zeroBuffer(): ThetaSketch = {
    val s = new ThetaSketch(DefaultK)
    s.isZeroBuffer = true
    s
  }

  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new ThetaSketch(bb.getInt)
    s.theta = bb.getDouble
    val n = bb.getInt
    var i = 0
    while (i < n) { s.retained.add(Double.box(bb.getDouble)); i += 1 }
    s
  }

  /** Estimated |A ∩ B|: membership intersection of the two retained sets
    * under the tighter threshold. */
  def intersectEstimate(a: ThetaSketch, b: ThetaSketch): Double = {
    val t = math.min(a.theta, b.theta)
    var n = 0
    val it = a.retained.headSet(Double.box(t), false).iterator()
    while (it.hasNext) if (b.retained.contains(it.next())) n += 1
    n / t
  }

  /** Estimated |A \ B|. */
  def aNotBEstimate(a: ThetaSketch, b: ThetaSketch): Double = {
    val t = math.min(a.theta, b.theta)
    var n = 0
    val it = a.retained.headSet(Double.box(t), false).iterator()
    while (it.hasNext) if (!b.retained.contains(it.next())) n += 1
    n / t
  }

  /** Estimated Jaccard |A∩B| / |A∪B| — the restricted samples make this a
    * direct ratio (the 1/θ factors cancel). */
  def jaccardEstimate(a: ThetaSketch, b: ThetaSketch): Double = {
    val t = math.min(a.theta, b.theta)
    var inter = 0
    var union = 0
    val ia = a.retained.headSet(Double.box(t), false).iterator()
    while (ia.hasNext) {
      union += 1
      if (b.retained.contains(ia.next())) inter += 1
    }
    val ib = b.retained.headSet(Double.box(t), false).iterator()
    while (ib.hasNext) { if (!a.retained.contains(ib.next())) union += 1 }
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** NULL-safe upstream hash for [[thetaAgg]]: SQL `xxhash64(NULL)` is NOT
    * null — it returns the SEED (42), so feeding it directly would count
    * every nullable column's NULLs as one shared phantom item (and two
    * disjoint nullable corpora would report nonzero overlap through the
    * common hash 42). This wraps the codegen'd hash so NULL stays NULL and
    * the aggregator skips it — SQL distinct-agg null semantics. */
  def hashCol(c: Column): Column =
    org.apache.spark.sql.functions.when(c.isNotNull,
      org.apache.spark.sql.functions.xxhash64(c))

  /** `groupBy(...).agg(thetaAgg(ThetaSketch.hashCol(col)))` — sketch a
    * pre-hashed LONG column (hashing stays inside whole-stage codegen;
    * NULL inputs are skipped like SQL distinct-agg null semantics — use
    * [[hashCol]], not bare `xxhash64`, on nullable columns). Default k. */
  lazy val thetaAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    thetaAggK(DefaultK)

  def thetaAggK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[java.lang.Long, ThetaSketch, Array[Byte]] {
      def zero: ThetaSketch = ThetaSketch.empty(k)
      def reduce(b: ThetaSketch, h: java.lang.Long): ThetaSketch = {
        if (h != null) b.update(h.longValue)
        b
      }
      def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch = a.mergeWith(b)
      def finish(s: ThetaSketch): Array[Byte] = s.serialize
      def bufferEncoder: Encoder[ThetaSketch] = Encoders.kryo[ThetaSketch]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }, Encoders.LONG)

  /** `agg(thetaMergeAgg(col))` over STORED sketches — the any-range rollup
    * path: merge per-partition sketches without touching raw data. */
  lazy val thetaMergeAgg: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new Aggregator[Array[Byte], ThetaSketch, Array[Byte]] {
      def zero: ThetaSketch = ThetaSketch.zeroBuffer()
      def reduce(b: ThetaSketch, bytes: Array[Byte]): ThetaSketch =
        if (bytes == null) b
        else if (b.isZeroBuffer)
          ThetaSketch.deserialize(bytes) // adopt the first sketch's k
        else b.mergeWith(ThetaSketch.deserialize(bytes))
      def merge(a: ThetaSketch, b: ThetaSketch): ThetaSketch =
        if (a.isZeroBuffer) b
        else if (b.isZeroBuffer) a
        else a.mergeWith(b)
      def finish(s: ThetaSketch): Array[Byte] = s.serialize
      def bufferEncoder: Encoder[ThetaSketch] = Encoders.kryo[ThetaSketch]
      def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }, Encoders.BINARY)

  /** Column functions over serialized sketches (driver/select-side, like
    * [[TDigest.quantileOf]] — no built-in exists for sketch algebra). */
  def estimateOf(sketch: Column): Column =
    org.apache.spark.sql.functions.udf(
      (b: Array[Byte]) => deserialize(b).estimate).apply(sketch)
  def intersectOf(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.udf((x: Array[Byte], y: Array[Byte]) =>
      intersectEstimate(deserialize(x), deserialize(y))).apply(a, b)
  def jaccardOf(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.udf((x: Array[Byte], y: Array[Byte]) =>
      jaccardEstimate(deserialize(x), deserialize(y))).apply(a, b)
}
