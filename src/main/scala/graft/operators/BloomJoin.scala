package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** **Bloom-filter semi-join reduction** — prune a huge probe side BEFORE its
  * shuffle using a compact bitset built from the small side's join keys
  * (Bloom, CACM 1970; the same runtime-filter idea Spark applies internally
  * via `InjectRuntimeFilter`, exposed here as an explicit operator so the
  * reduction also works across stages Catalyst won't bridge — e.g. a probe
  * side that is itself the output of an aggregation, a checkpoint, or a
  * streaming micro-batch).
  *
  * Why this matters at 100 TB: a fact⋈dim-subset join shuffles the ENTIRE
  * fact table even when only 1% of its rows can match. A bloom filter over
  * the dim keys is a narrow, codegen'd map-side filter that drops the other
  * 99% before the exchange — shuffle bytes shrink by ~the selectivity of the
  * dim subset, at the cost of one small-side pass and a bitset broadcast
  * (it rides the task binary, which Spark already broadcasts).
  *
  * False positives only (never false negatives), so `filtered → join`
  * produces EXACTLY the rows of the unfiltered inner/semi join — the join
  * itself removes the false positives. NOT sound for outer joins where
  * pre-filtering the probe side would turn preserved rows into dropped ones.
  *
  * Everything stays in whole-stage codegen on the probe side: the membership
  * test is built-in expressions (`xxhash64` → `pmod` → word lookup via
  * `element_at` on the bitset literal → `shiftright`/`&`) — no UDF, no
  * broadcast-variable closure.
  */
object BloomJoin {

  /** Built bitset. `words` is the bit array packed little-endian into longs;
    * `m` = number of bits; `k` = number of hash probes per key. */
  final case class Bloom(words: Array[Long], m: Long, k: Int) {
    def sizeBytes: Long = words.length.toLong * 8
  }

  /** Bits for target false-positive rate `p` at `n` distinct keys:
    * m = -n·ln p / (ln 2)². Capped at 2^27 bits (16 MiB) — past that the
    * per-task-binary cost outweighs the shuffle savings and a plain
    * shuffled semi-join is the better plan; the cap degrades fpp, never
    * correctness. */
  private[operators] def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0, s"expectedItems must be positive, got $n")
    require(p > 0 && p < 1, s"fpp must be in (0,1), got $p")
    val raw = math.ceil(-n.toDouble * math.log(p) / (math.log(2) * math.log(2))).toLong
    math.min(math.max(raw, 64L), 1L << 27)
  }

  private[operators] def optimalK(n: Long, m: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  /** k positions for `key`, one per seed. `xxhash64(lit(i), key)` chains the
    * seed literal through the hash, giving k independent hash functions from
    * the one built-in. The SAME expression generates build-side positions,
    * so no executor-side reimplementation of the hash exists to drift. */
  private def positions(key: Column, k: Int, m: Long): Column =
    array((0 until k).map(i => pmod(xxhash64(lit(i), key), lit(m))): _*)

  /** Build the filter from the small side's key column. One narrow pass:
    * each partition ORs its positions into a local bitset, `treeAggregate`
    * ORs the bitsets to the driver — no shuffle at any point. NULL keys are
    * excluded (they cannot match an equi-join anyway).
    *
    * `expectedItems < 0` (default) counts the distinct keys first (one extra
    * small-side job — the side is small by the operator's premise). Pass an
    * estimate to skip that job when one is known (e.g. a dim-table row
    * count from table stats). */
  def build(small: DataFrame, key: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): Bloom =
    buildOnCols(small, Seq(key), fpp, expectedItems)

  /** One Column carrying the (possibly composite) key: the column itself for
    * a single key, the struct of the columns otherwise. `xxhash64` hashes a
    * struct by its field VALUES in order (names don't participate), so a
    * probe-side struct matches iff its fields match position-by-position in
    * value AND type — hence [[Joins.routed]] gates the bloom regime on exact
    * per-position type equality. */
  private[operators] def compositeKey(cols: Seq[Column]): Column =
    if (cols.size == 1) cols.head else struct(cols: _*)

  /** Composite-key form of [[build]]: rows with ANY null key component are
    * excluded (they cannot match an equi-join). Probe with [[mightContain]]
    * over [[compositeKey]] of same-typed columns. */
  def buildOnCols(small: DataFrame, keys: Seq[String], fpp: Double = 0.01,
      expectedItems: Long = -1L): Bloom = {
    require(keys.nonEmpty, "bloom build needs at least one key column")
    val keyed = small
      .where(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(compositeKey(keys.map(col)).as("__bloom_key"))
    val n = if (expectedItems >= 0) math.max(expectedItems, 1L)
            else math.max(keyed.distinct().count(), 1L)
    val m = optimalNumBits(n, fpp)
    val k = optimalK(n, m)
    // Primitive build pass (r13): the positions stay an ARRAY column
    // consumed through toRdd's UnsafeRows — no explode into n×k rows and no
    // per-position Long boxing (the previous `.as[Long].rdd.treeAggregate`
    // materialized ~10M boxed longs for a 1.5M-key build). One local bitset
    // per partition, OR-merged up a tree.
    val posDf = keyed.select(positions(col("__bloom_key"), k, m).as("p"))
    val nWords = ((m + 63) / 64).toInt
    val words = posDf.queryExecution.toRdd.mapPartitions { it =>
      val w = new Array[Long](nWords)
      while (it.hasNext) {
        val arr = it.next().getArray(0)
        var i = 0
        val cnt = arr.numElements()
        while (i < cnt) {
          val p = arr.getLong(i)
          w((p >>> 6).toInt) |= 1L << (p & 63)
          i += 1
        }
      }
      Iterator.single(w)
    }.treeAggregate(new Array[Long](nWords))( // tolerates an EMPTY rdd
      (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a },
      (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    Bloom(words, m, k)
  }

  /** Membership test as a codegen'd Column: the SAME `xxhash64`-chained
    * position expressions the build side used, probed through
    * [[graft.functions.BloomBitTest]] — the bitset rides the expression as
    * a referenced object (O(1) plan size), NOT an array literal. The
    * literal form made the driver's optimizer re-traverse k copies of an
    * up-to-2M-element array per Catalyst pass, which at a 1.5M-key filter
    * dominated the whole join (r13 `routed_fixtures` measurement). */
  def mightContain(key: Column, bloom: Bloom): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    (0 until bloom.k).map { i =>
      val pos = pmod(xxhash64(lit(i), key), lit(bloom.m))
      ColumnBridge.column(graft.functions.BloomBitTest(
        bloom.words, ColumnBridge.expression(pos)))
    }.reduce(_ && _)
  }

  /** The probe side reduced to rows that MIGHT join: NULL keys dropped
    * (equi-join semantics), then the bloom test. A narrow filter — no
    * exchange, stays inside the probe side's scan stage. */
  def filtered(big: DataFrame, bigKey: String, bloom: Bloom): DataFrame =
    big.where(col(bigKey).isNotNull && mightContain(col(bigKey), bloom))

  /** Inner equi-join with the probe side bloom-pruned before the shuffle.
    * Result is EXACTLY `big.join(small, bigKey === smallKey, "inner")`. */
  def inner(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val bloom = build(small, smallKey, fpp, expectedItems)
    filtered(big, bigKey, bloom)
      .join(small, col(bigKey) === col(smallKey), "inner")
  }

  /** Left-semi form: `big` rows with at least one small-side match. */
  def semi(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      fpp: Double = 0.01, expectedItems: Long = -1L): DataFrame = {
    val bloom = build(small, smallKey, fpp, expectedItems)
    filtered(big, bigKey, bloom)
      .join(small, col(bigKey) === col(smallKey), "left_semi")
  }
}
