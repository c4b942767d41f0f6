package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable MinHash signature / LSH banding kernel — the operator-layer
  * counterpart of the oracle-paired queries in
  * [[graft.queries.DedupQueries]] (same 5-char shingles, same rolling hash
  * mod 2^31−1, same K=12 permutations from [[a]]/[[b]], same 4 bands of
  * 3), packaged for pipeline composition: batch dedup, the streaming
  * near-dup ingest ([[graft.streaming.StreamingNearDedup]]), and any future
  * consumer share one definition of "signature" so stores stay compatible.
  *
  * Everything here is map-side per document except the one `groupBy(doc)`
  * that folds shingle hashes into the signature — no pair enumeration, no
  * global state; at 100 TB the signature build parallelizes linearly and
  * the band keys are what candidate joins shuffle on.
  */
object MinHash {

  val K = 12 // permutations
  val NBands = 4 // bands of K/NBands rows each
  val ShingleLen = 5 // character shingle width (used by signatures())

  /** Signature-compatibility version: any change to the permutation
    * constants, K, banding, shingle width, or the rolling token hash
    * changes this string. EVERY constant here is DERIVED from the code
    * that computes signatures ([[a]]/[[b]]/[[K]]/[[NBands]]/[[ShingleLen]]
    * and [[graft.functions.RollingHash]]'s sample behavior) — a hardcoded
    * copy would let a future constant change slip past the guard, exactly
    * the silent-re-admission failure this versioning exists to prevent.
    * Persistent band stores record it ([[graft.streaming.StreamingNearDedup]]
    * writes a `_graft_sig_version` marker) and fail LOUDLY on mismatch.
    * The round-4 constant change (small sequential multipliers → spread
    * Knuth multiples) is exactly the migration this guards. */
  val version: String = {
    val perm = (0 until K).map(j => s"${a(j)}:${b(j)}").mkString(",")
    // fingerprint the rolling hash by behavior, not by copying its
    // constants: any change to its fold (multiplier, modulus, iteration)
    // changes these sample values
    val rh = Seq("a", "abcde", "shingle 中")
      .map(s => graft.functions.RollingHash.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).mkString(",")
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$perm|$rh".getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(12)
    s"minhash/1 K=$K nbands=$NBands shingle=$ShingleLen fp=$dig"
  }

  /** Permutation j is h ↦ (h·a(j) + b(j)) mod 2^31−1. The multipliers are
    * SPREAD (Knuth-constant multiples reduced mod the prime), not small
    * sequential integers: with tiny multipliers like 3, 5, 7…, one
    * low-valued shingle hash stays the minimum under most "permutations",
    * the K draws are heavily correlated, and two documents sharing a few
    * common shingles (" and ", " the ") estimate Jaccard ≈ 0.7 when the
    * truth is ≈ 0.01 — false near-dup drops. a(j) < 2^31 keeps h·a within
    * int64 for both Spark and the DuckDB oracle. */
  def a(j: Int): Long = (2654435761L * (2L * j + 1)) % 2147483647L
  def b(j: Int): Long = (2654435761L * 40503L % 2147483647L) * (j + 1) % 2147483647L

  /** (id, sig: array<long> of K minhash components) per document; documents
    * shorter than one shingle (5 chars) produce NO row — callers must treat
    * signature-less docs as unique. Uses the native codegen'd rolling_hash
    * (graft.functions.RollingHash). */
  def signatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      // sequence(1, n) counts DOWN for n < 1 (Spark semantic): a doc shorter
      // than one shingle would explode into nonsense substrings, not zero
      .filter(length(col(textCol)) >= ShingleLen)
      .select(col(idCol),
        explode(array_distinct(expr(
          s"transform(sequence(1, length($textCol) - ${ShingleLen - 1}), " +
            s"i -> substring($textCol, i, $ShingleLen))"))).as("sh"))
      .withColumn("h", expr("rolling_hash(sh)"))
      .groupBy(idCol)
      .agg(array((0 until K).map(j =>
        min((col("h") * a(j) + b(j)) % 2147483647L)): _*).as("sig"))

  /** Explode a signature frame into one row per (id, band, bkey, sig):
    * the LSH candidate key. Map-side. */
  def bands(sigs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val rowsPerBand = K / NBands
    sigs.select(col(idCol), col("sig"),
      explode(array((0 until NBands).map { bd =>
        struct(lit(bd).as("band"),
          concat_ws("_", (0 until rowsPerBand)
            .map(r => col("sig")(bd * rowsPerBand + r)): _*).as("bkey"))
      }: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"), col("sig"))
  }

  /** Band-bucket skew diagnostic: [[Skew.hotKeys]] over the (band, bkey)
    * candidate keys — the keys every LSH pair join and the streaming store
    * check shuffle on. Bucket sizes are bounded by band collision rate for
    * organic corpora, but a mega-bucket (boilerplate shared by millions of
    * docs — license headers, templated pages) makes the bucket-local
    * quadratic explode; run this on a sample first and route offenders to
    * [[Skew.saltedJoin]] or a bucket-size cap. Returns (band, bkey, cnt)
    * descending. */
  def bandHotKeys(docs: DataFrame, topK: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    Skew.hotKeys(bands(signatures(docs, idCol, textCol), idCol),
      Seq("band", "bkey"), topK)

  /** Estimated Jaccard similarity of two K-component signatures: the
    * fraction of agreeing components (sequential fold, no UDF). */
  def estSimilarity(s1: Column, s2: Column): Column =
    aggregate(zip_with(s1, s2,
      (x, y) => when(x === y, 1.0d).otherwise(0.0d)),
      lit(0.0d), (acc, p) => acc + p) / K.toDouble
}
