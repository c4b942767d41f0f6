package graft.queries

import graft.operators.Bpe
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING over the `documents` table (see
  * [[graft.operators.Bpe]]) — verified hash-exact against a DuckDB oracle
  * that mirrors the full iteration as UNROLLED `AS MATERIALIZED` CTEs, the
  * `e_pagerank_types` pattern: per round one pair-count CTE, one 1-row
  * winner CTE (ORDER BY count DESC, left, right LIMIT 1 — the same
  * deterministic tie-break the Spark side uses), and one merged word table
  * via `list_reduce` replaying the identical left-to-right fold on
  * chr(31)-joined symbol strings (symbols are corpus characters, so the
  * separator can never collide).
  *
  * Everything compared is strings + exact BIGINT counts — no floats
  * anywhere, so the oracle needs no rounding discipline at any scale
  * factor.
  */
object BpeQueries {

  /** Merge rounds trained/unrolled. The sf corpora (31-word vocab, ~160
    * possible merges) can never exhaust at 16, so Spark's early-stop and
    * the fixed-K oracle agree by construction. */
  private val K = 16

  private val sep = "chr(31)"

  /** words0..wordsK + per-round pairs/win CTEs (DuckDB dialect). */
  private def ctes: String = {
    val base =
      s"""words0 AS MATERIALIZED (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    list_append(list_transform(generate_series(1, length(word)),
         |      i -> substr(word, i, 1)), '${Bpe.EndOfWord}') AS sym
         |  FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
         |        FROM documents)
         |  WHERE word <> '' GROUP BY word)""".stripMargin
    val rounds = (1 to K).map { k =>
      s"""pairs$k AS MATERIALIZED (
         |  SELECT string_split(p, $sep)[1] AS l, string_split(p, $sep)[2] AS r,
         |    CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM (SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
         |          i -> sym[i] || $sep || sym[i + 1])) AS p, cnt
         |        FROM words${k - 1})
         |  GROUP BY 1, 2),
         |win$k AS MATERIALIZED (
         |  SELECT $k AS step, l, r, c FROM pairs$k ORDER BY c DESC, l, r LIMIT 1),
         |words$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    string_split(list_reduce(sym, (acc, x) -> CASE
         |      WHEN (acc = w.l OR ends_with(acc, $sep || w.l)) AND x = w.r
         |      THEN substr(acc, 1, length(acc) - length(w.l)) || w.l || w.r
         |      ELSE acc || $sep || x END), $sep) AS sym
         |  FROM words${k - 1}, win$k w)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  val defs: Seq[QueryDef] = Seq(

    // The learned merge table itself — the model artifact every downstream
    // tokenization consumes. Exact: iteration order, tie-breaks, and counts
    // all hash-match the unrolled oracle.
    QueryDef(
      "t_bpe_train",
      (s, dir) => {
        val model = Bpe.train(Tables.documents(s, dir), "text", K)
        s.createDataFrame(model.merges)
          .select(col("step"), col("left").as("lft"), col("right").as("rgt"),
            col("pairCount").as("pair_cnt"))
          .orderBy("step")
      },
      Some(s"""WITH $ctes
             |SELECT step, l AS lft, r AS rgt, c AS pair_cnt
             |FROM (${(1 to K).map(k => s"SELECT * FROM win$k").mkString(" UNION ALL ")})
             |ORDER BY step""".stripMargin),
      headline = true),

    // The corpus retokenized under the learned merges: the trainer's final
    // word table IS the re-tokenization (space-joined here — tokens never
    // contain spaces).
    QueryDef(
      "t_bpe_retokenize",
      (s, dir) => {
        val model = Bpe.train(Tables.documents(s, dir), "text", K)
        model.words
          .select(col("word"), col("cnt"), array_join(col("sym"), " ").as("toks"))
          .orderBy("word")
      },
      Some(s"""WITH $ctes
             |SELECT word, cnt, array_to_string(sym, ' ') AS toks
             |FROM words$K ORDER BY word""".stripMargin)),

    // End-to-end corpus tokenization through the COMPILED apply path
    // (tokenizeCompiled: driver-compiled rank map, greedy lowest-rank-first
    // — the production route for ~32k-merge tables). The oracle re-derives
    // each document's token stream positionally from the trained word
    // table, so this pins the train→compile→apply loop, not just the fold:
    // a rank-map compilation bug or order-of-application divergence would
    // hash-mismatch here even though t_bpe_train still passed.
    QueryDef(
      "t_bpe_tokenize",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val model = Bpe.train(docs, "text", K)
        Bpe.tokenizeCompiled(docs.select("doc_id", "text"), "text", model.merges)
          .select(col("doc_id"),
            coalesce(array_join(col("bpe_tokens"), " "), lit("")).as("toks"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $ctes,
             |doc_words AS (
             |  SELECT doc_id, ord, word FROM (
             |    SELECT doc_id,
             |      unnest(string_split_regex(lower(text), '[^a-z]+')) AS word,
             |      unnest(range(1, len(string_split_regex(lower(text), '[^a-z]+')) + 1)) AS ord
             |    FROM documents)
             |  WHERE word <> ''),
             |doc_toks AS (
             |  SELECT d.doc_id,
             |    array_to_string(flatten(list(w.sym ORDER BY d.ord)), ' ') AS toks
             |  FROM doc_words d JOIN words$K w USING (word)
             |  GROUP BY d.doc_id)
             |SELECT doc_id, coalesce(t.toks, '') AS toks
             |FROM documents LEFT JOIN doc_toks t USING (doc_id)
             |ORDER BY doc_id""".stripMargin)),
  )
}
