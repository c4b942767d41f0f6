package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING — the real merge
  * algorithm (iterative pair-count → pick → merge), not a regex
  * approximation: the first stage of any LLM text pipeline (learn a merge
  * table on the corpus, then tokenize everything with it).
  *
  * Algorithm (Sennrich et al. 2016, arXiv:1508.07909): start from each
  * word as a character sequence plus an end-of-word marker; repeat K times:
  * count all adjacent symbol pairs weighted by word frequency, merge the
  * most frequent pair everywhere (ties broken DETERMINISTICALLY: count
  * desc, then lexicographic on (left, right) — both engines compare ASCII
  * strings identically, so the whole iteration is oracle-able the same way
  * PageRank is: unrolled `AS MATERIALIZED` DuckDB CTEs, hash-exact, no
  * tolerance).
  *
  * Scale shape: the unit of iteration is the DISTINCT-WORD table (vocab ≪
  * corpus — the classic BPE-trainer trick), built with one hash-agg shuffle
  * over the corpus. Each round is then one explode + hash-agg (map-side
  * partial) over the word table for pair counts, a TakeOrdered(1) for the
  * winner, and a map-side fold to apply the merge; `localCheckpoint` every
  * few rounds keeps the plan shallow (PageRank's discipline), and every
  * intermediate cache is released on return. The merge table itself is a
  * MODEL artifact (like KMeans centroids / PQ codebooks): K × 1-row
  * driver fetches, not data movement.
  *
  * Merge semantics: leftmost-first non-overlapping, expressed as a single
  * left-to-right fold — `acc` ends with `left` and the next symbol is
  * `right` → replace the tail with `left+right`. The fold cannot re-trigger
  * on its own output within a round (the merged token ≠ `left` since
  * `right` is non-empty), which is exactly the scan semantics of the
  * reference implementations.
  */
object Bpe {

  /** One learned merge: at `step`, `left`+`right` (weighted occurrence
    * count `pairCount`) became one token. */
  final case class Merge(step: Int, left: String, right: String, pairCount: Long)

  /** `merges` in learned order; `words` = the distinct-word table after all
    * merges: (word, cnt, sym array<string>) — the corpus retokenized. */
  final case class Model(merges: Seq[Merge], words: DataFrame)

  /** Marker appended to every word so merges can't cross word boundaries
    * and word-final tokens are distinct from word-internal ones. */
  val EndOfWord = "</w>"

  /** Lowercased letter-run words with occurrence counts — the corpus
    * pre-tokenization (one shuffle; everything iterative happens on this
    * far smaller frame). */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent-pair counts over the symbol arrays, weighted by word count. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("cnt"), explode(expr(
        """transform(slice(sym, 1, size(sym) - 1),
          |  (x, i) -> struct(x AS l, element_at(sym, i + 2) AS r))"""
          .stripMargin)).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** One merge applied to a symbol-array column: left-to-right fold,
    * leftmost-first non-overlapping (see class doc). `try_element_at`
    * yields NULL (→ no match) on the empty accumulator, so the fold is
    * ANSI-safe without a size guard. */
  def mergeFold(sym: Column, left: String, right: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Train a merge table of (at most) `maxMerges` merges on `docs(textCol)`.
    * Stops early when no adjacent pairs remain (every word one token). */
  def train(docs: DataFrame, textCol: String, maxMerges: Int): Model = {
    require(maxMerges >= 0, s"maxMerges must be >= 0, got $maxMerges")
    // materialize the base word table once: every round's winner job would
    // otherwise re-run the corpus scan + agg
    var words = wordCounts(docs, textCol)
      .withColumn("sym", concat(split(col("word"), ""), array(lit(EndOfWord))))
      .localCheckpoint(true)
    val intermediates = scala.collection.mutable.Buffer(words)
    val merges = scala.collection.mutable.Buffer.empty[Merge]
    var exhausted = false
    while (merges.size < maxMerges && !exhausted) {
      val step = merges.size + 1
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      top.headOption match {
        case None => exhausted = true // no pairs left anywhere
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges += Merge(step, l, r, row.getLong(2))
          words = words.withColumn("sym", mergeFold(col("sym"), l, r))
          // checkpoint cadence: bounds each winner job's re-executed
          // lineage to a few fold projections
          if (step % 4 == 0) {
            words = words.localCheckpoint(true)
            intermediates += words
          }
      }
    }
    val result = words.localCheckpoint(true)
    intermediates.foreach(releaseCheckpoint)
    Model(merges.toSeq, result)
  }

  /** Tokenize text with a learned merge table: per word, chars + EndOfWord,
    * then every merge applied IN LEARNED ORDER (each exhaustively — the
    * same sequential semantics training itself applies, so training-corpus
    * words round-trip to their trained segmentation exactly). Map-side
    * only; the merge table rides as K nested fold expressions. */
  def tokenize(docs: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens"): DataFrame = {
    val ordered = merges.sortBy(_.step)
    docs.withColumn(outCol, flatten(transform(
      filter(split(lower(col(textCol)), "[^a-z]+"), w => w =!= ""),
      w => ordered.foldLeft(concat(split(w, ""), array(lit(EndOfWord)))) {
        (sym, m) => mergeFold(sym, m.left, m.right)
      })))
  }

  /** [[tokenize]] for PRODUCTION merge tables. The expression path embeds
    * one nested fold per merge — perfect at oracle scale (K ≤ a few dozen:
    * codegen'd, plan-visible) but a real tokenizer carries ~32k merges, and
    * a 32k-deep expression tree breaks analysis long before codegen. This
    * path compiles the table to a rank map once on the driver (a few MB —
    * model-artifact sized, broadcast by closure) and applies it per
    * partition: repeatedly merge the LOWEST-RANK adjacent pair, leftmost on
    * ties. Equivalent to applying merges in learned order exhaustively —
    * a merge's left/right symbols are produced only by strictly EARLIER
    * merges, so no later merge can enable an earlier one
    * (`BpeSpec` pins path equality on trained corpora and the overlap
    * cases). A per-partition word→tokens cache (vocab-bounded, capped)
    * exploits the Zipf shape: each distinct word is segmented once.
    * `mapPartitions` is the documented last resort — held here to the same
    * bar as the media codecs: a per-row recurrence over driver-compiled
    * model state.
    */
  def tokenizeCompiled(docs: DataFrame, textCol: String, merges: Seq[Merge],
      outCol: String = "bpe_tokens", cacheCap: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    require(!docs.columns.contains(outCol),
      s"tokenizeCompiled: output column '$outCol' already exists")
    val ranks = merges.map(m => (m.left, m.right) -> m.step).toMap
    val idx = docs.schema.fieldIndex(textCol)
    val schema = docs.schema.add(outCol, ArrayType(StringType, containsNull = false))
    docs.mapPartitions { rows =>
      val cache = new java.util.HashMap[String, Array[String]]()
      rows.map { row =>
        val toks: Seq[String] =
          if (row.isNullAt(idx)) null // match the expression path: null text → null
          else {
            val words = row.getString(idx)
              .toLowerCase(java.util.Locale.ROOT).split("[^a-z]+")
            val out = Seq.newBuilder[String]
            words.foreach { w =>
              if (w.nonEmpty) {
                var segs = cache.get(w)
                if (segs == null) {
                  segs = segmentWord(w, ranks)
                  if (cache.size < cacheCap) cache.put(w, segs)
                }
                out ++= segs
              }
            }
            out.result()
          }
        Row.fromSeq(row.toSeq :+ toks)
      }
    }(Encoders.row(schema))
  }

  /** Greedy lowest-rank-first merge of one word (see [[tokenizeCompiled]]).
    * O(len²·scan) worst case, amortized away by the word cache. */
  private def segmentWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    word.foreach(c => syms += c.toString)
    syms += EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        syms(bestI) = syms(bestI) + syms(bestI + 1)
        syms.remove(bestI + 1)
      }
    }
    syms.toArray
  }

  private def releaseCheckpoint(df: DataFrame): Unit = graft.Checkpoints.release(df)
}
