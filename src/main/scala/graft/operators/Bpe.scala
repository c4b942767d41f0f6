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

  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
