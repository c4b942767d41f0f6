package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** **Cross-document duplicated-span coverage** — the exact-substring dedup
  * signal of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (ACL 2022): a span of `k` consecutive tokens that appears in two
  * or more DISTINCT documents marks both as carrying boilerplate / mirrored
  * text. Where the paper builds a corpus-wide suffix array, the distributed
  * re-expression is a hashed k-gram inverted index — the standard scale-out
  * approximation (fixed k instead of maximal repeats), and the per-document
  * output (fraction of tokens covered by cross-doc duplicated spans) is the
  * filter signal a 100 TB pipeline thresholds on.
  *
  * Plan shape: token split + k-gram explode are NARROW (no shuffle);
  * shuffle 1 groups by the 8-byte `xxhash64` of the gram (never the string
  * — shuffle bytes stay fixed-width no matter the gram length) to find
  * hashes spanning ≥2 docs; the mark-back join keys on the SAME hash, so
  * Catalyst reuses the partitioning — no second gram shuffle; shuffle 2
  * re-keys marked positions by document for the islands merge (classic
  * gaps-and-islands: break when a span starts past the running `max(end)`
  * — since spans are pos-sorted, `pos <= cummax(end)` proves overlap with
  * some earlier span, so islands are exactly the connected components of
  * the interval union and each island's coverage is `max(end)-min(pos)+1`).
  *
  * Coverage counts every position of a duplicated gram, including its
  * repeats inside one document — but only grams seen in ≥2 distinct
  * documents qualify (within-doc repetition alone is the separate
  * `t_repetition` signal).
  */
object DupSpans {

  /** Per-document duplicated-span coverage: `(doc_id, n_tokens, dup_tokens,
    * dup_frac)`, one row per input document (short and empty docs included
    * with zero coverage). Tokens are `\s+`-split, empties dropped. */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"span length k must be >= 2, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(coalesce(col(textCol), lit("")), "\\s+"),
        t => t =!= "").as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))

    // one row per k-gram start (1-based), gram hashed to 8 bytes. The raw
    // gram string never reaches a shuffle; a 64-bit collision merging two
    // distinct grams is ~n²/2^65 — immaterial against filter-threshold use.
    val grams = toks
      .where(size(col("ts")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("ts")) - (k - 1)),
          i => xxhash64(array_join(slice(col("ts"), i, lit(k)), " ")))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("ng_h"))

    val dup = grams.groupBy("ng_h")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2)
      .select("ng_h")

    val marked = grams.join(dup, "ng_h")
      .select(col("doc_id"), col("pos"), (col("pos") + (k - 1)).as("endpos"))

    val prev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val covered = marked
      .withColumn("brk",
        when(col("pos") > coalesce(max("endpos").over(prev), lit(-1L)), 1)
          .otherwise(0))
      .withColumn("gid", sum("brk").over(upto))
      .groupBy("doc_id", "gid")
      .agg((max("endpos") - min("pos") + 1).as("covered"))
      .groupBy("doc_id")
      .agg(sum("covered").as("dup_tokens"))

    toks.select("doc_id", "n_tokens")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(coalesce(col("dup_tokens"), lit(0L)) /
            col("n_tokens").cast("double")).as("dup_frac"))
  }
}
