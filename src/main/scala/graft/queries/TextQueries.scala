package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data-pipeline
  * surface: token counting, quality scoring, language-ID heuristics, and document
  * fingerprinting (rolling hash).
  *
  * Everything is pure `Column` expression (whole-stage codegen, no UDFs); the
  * fingerprint uses a polynomial rolling hash over code points that is reproduced
  * verbatim in the DuckDB oracle, so even the sketch ops hash-match exactly.
  *
  * Scale: all map-side; at 100 TB these run as a single scan with column pruning
  * (only `doc_id`/`text` are read).
  */
object TextQueries {

  /** Occurrence count of `kw` in `' '||text||' '` — replace-based, exact integers.
    * Same SQL text runs on both engines (Spark SQL also has literal `replace`). */
  private def hits(kw: String): Column = expr(sqlHits(kw))

  private def sqlHits(kw: String): String =
    s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$kw', ''))) / ${kw.length} AS BIGINT)"

  /** Rolling hash of one token: fold chars c as (acc*31 + code(c)) mod 2^31-1. */
  private val tokHash =
    "aggregate(transform(sequence(1, length(t)), i -> ascii(substring(t, i, 1))), " +
      "0L, (x, c) -> (x * 31 + c) % 2147483647)"

  private val sqlTokHash =
    "list_reduce([CAST(0 AS BIGINT)] || list_transform(generate_series(1, length(t)), " +
      "i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), (x, c) -> (x * 31 + c) % 2147483647)"

  /** Plan builder for `t_bigram_lm` — see the QueryDef comment for the full
    * scale rationale. Exposed with overridable gates so the spec can force
    * the void-premise fallback on real data and assert it matches the pin.
    *
    * The pin gate is count AND bytes: `maxPairs` bounds rows, `maxPinBytes`
    * bounds the ESTIMATED driver footprint of the collected pair buffer —
    * ~160 B of JVM object overhead per (String, String, Long) tuple (tuple
    * + boxed long + 2 string headers, then the IndexedSeq copy and the
    * UnsafeRow LocalRelation) plus ~4 B per key char (UTF-16 in the buffer,
    * UTF-8 again in the relation). Enforcement is a byte-metered
    * `toLocalIterator` over the pair aggregation: ONE executor-side agg
    * pass (no separate probe job re-exploding the corpus — measured +38%
    * cpu, reverted), driver heap bounded by the gate plus one in-flight
    * partition, and a void premise stops FETCHING at the gate instead of
    * paying a 4M-row take to discard it. Worst case at the default gates:
    * ≤ 256 MB estimated ≈ well under half the 8 g driver even with the
    * broadcast copy alongside. */
  private[queries] def bigramLm(s: SparkSession, dir: String,
      maxPairs: Long = 1L << 22, maxPinBytes: Long = 256L << 20): DataFrame = {
    val docs = Tables.documents(s, dir)
    // pair extraction through the COMPILED expressions (r14 verdict #5):
    // whitespace_tokens + token_bigrams are byte-for-byte the old
    // `filter(split(text,' '))` + transform/struct chain, minus the
    // interpreted regex split and the boxed lambda per token — the chain
    // was the registry's worst cpu-per-shuffle-byte (33 cpu_s for 1.8 MB
    // at sf1)
    val bigrams = docs
      .select(col("doc_id"),
        explode(expr("token_bigrams(whitespace_tokens(text))")).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    // The pin pass pads each doc's token array with one trailing NULL, so
    // every doc contributes a sentinel (last_token, NULL) bigram. That folds
    // the vocabulary into THIS aggregation: distinct tokens = pair endpoints
    // ∪ sentinel endpoints (in a ≥2-token doc every token borders a real
    // bigram; a 1-token doc surfaces its only token as its sentinel's `a`).
    // The separate singles corpus scan the vocab used to need — a full
    // tokenize pass per execution, run inside the broadcast build — is gone.
    val cabAgg = docs
      .select(explode(expr(
        "token_bigrams(array_append(whitespace_tokens(text), CAST(NULL AS STRING)))"))
        .as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cab"))
    import s.implicits._
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val vocabSet = new java.util.HashSet[String]()
    var estPinBytes = 0L
    var pinnable = true
    // gram-hash injectivity over the AGGREGATED pair table, checked for
    // free during the pin fetch: when the 64-bit rolling gram hash is
    // injective on these pairs (always, in practice), the per-occurrence
    // scoring join can key on ONE long instead of two strings — exact by
    // construction, since every occurrence's own pair is in the table and
    // maps to a unique hash. A collision (or an unpinnable table) keeps
    // the exact-string join.
    val seenHashes = new java.util.HashSet[java.lang.Long]()
    var hashesInjective = true
    val it = cabAgg.as[(String, String, Long)].toLocalIterator()
    while (pinnable && it.hasNext) {
      val t = it.next()
      if (t._2 == null) {
        // sentinel row: vocabulary contribution only (bounded by |V|, so it
        // is metered but never counts toward the pair gate)
        vocabSet.add(t._1)
        estPinBytes += 160L + 4L * t._1.length
      } else {
        buf += t
        vocabSet.add(t._1); vocabSet.add(t._2)
        if (!seenHashes.add(graft.functions.TokenGramHash.gramHashes(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](
              org.apache.spark.unsafe.types.UTF8String.fromString(t._1),
              org.apache.spark.unsafe.types.UTF8String.fromString(t._2))), 2)
            .getLong(0))) hashesInjective = false
        estPinBytes += 160L + 4L * (t._1.length + t._2.length)
        if (buf.length > maxPairs) pinnable = false
      }
      if (estPinBytes > maxPinBytes) pinnable = false
    }
    val lp =
      if (pinnable) {
        // ctx sums on the driver (exact long adds, order-independent — same
        // values as the sum(cab) groupBy they replace), so lp is ONE
        // LocalRelation and the broadcast build touches no corpus data. The
        // log-probability micro-unit arithmetic stays in Spark expressions,
        // identical to the fallback's, so pinned and distributed paths agree
        // bit-for-bit.
        val ctx = new java.util.HashMap[String, Long]()
        buf.foreach(t => ctx.merge(t._1, t._3, (x, y) => x + y))
        val rows = buf.map(t => (t._1, t._2, t._3, ctx.get(t._1))).toIndexedSeq
        s.createDataset(rows).toDF("a", "b", "cab", "ca")
          .withColumn("v", lit(vocabSet.size.toLong))
          .select(col("a"), col("b"),
            expr("CAST(round(round(ln(cab + 1.0), 6) * 1e6) AS BIGINT)").as("lc_mc"),
            expr("CAST(round(round(ln(CAST(ca + v AS DOUBLE)), 6) * 1e6) AS BIGINT)")
              .as("ctx_mc"))
      } else {
        // premise void: stats-driven plan, full-explode vocabulary; the
        // sentinel groups are dropped before any real pair math
        val cab = cabAgg.filter(col("b").isNotNull)
        val vocab = docs.select(explode(expr("whitespace_tokens(text)")).as("t"))
          .agg(count_distinct(col("t")).as("v"))
        val ctx = cab.groupBy("a").agg(sum("cab").as("ca"))
        cab.join(broadcast(ctx), "a").crossJoin(vocab)
          .select(col("a"), col("b"),
            expr("CAST(round(round(ln(cab + 1.0), 6) * 1e6) AS BIGINT)").as("lc_mc"),
            expr("CAST(round(round(ln(CAST(ca + v AS DOUBLE)), 6) * 1e6) AS BIGINT)")
              .as("ctx_mc"))
      }
    val scored =
      if (pinnable && hashesInjective) {
        // hash-keyed scoring: the corpus pass never materializes pair
        // strings at all — one compiled token+gram-hash scan, longs out,
        // a long-keyed broadcast probe
        val lpH = lp.withColumn("h",
          element_at(expr("token_gram_hash(array(a, b), 2)"), 1))
          .select("h", "lc_mc", "ctx_mc")
        docs.select(col("doc_id"),
          explode(expr("token_gram_hash(whitespace_tokens(text), 2)")).as("h"))
          .join(broadcast(lpH), Seq("h"))
      } else bigrams.join(broadcast(lp), Seq("a", "b"))
    scored
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (round((sum(col("lc_mc")) - sum(col("ctx_mc"))).cast("double")
          / count(lit(1))) / lit(1e6)).as("avg_logprob"))
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens + total token chars (BPE-ish length proxy).
    QueryDef(
      "t_tokens",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            expr("size(filter(split(text, ' '), x -> x != ''))").as("n_tokens"),
            expr("""aggregate(filter(split(text, ' '), x -> x != ''),
                   | 0L, (a, x) -> a + length(x))""".stripMargin).as("tok_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_tokens,
             |  CAST(list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''),
             |       x -> length(x))) AS BIGINT) AS tok_chars
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // BPE-ish token counting: regex classes approximating a byte-pair
    // pre-tokenizer (letter runs / digit runs / single non-alnum) — the
    // pattern keeps to constructs with identical semantics in Java regex and
    // DuckDB's RE2.
    QueryDef(
      "t_tokens_bpe",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)"))
              .as("n_bpe_tokens"),
            size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_digit_runs"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT)
             |    AS n_bpe_tokens,
             |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_digit_runs
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length / alpha ratio / stopword ratio composite (reference
    // analogue: data-quality report cells, BDB_2026.ipynb cell 23).
    QueryDef(
      "t_quality",
      (s, dir) => {
        val n = length(col("text")).cast("double")
        val alpha = length(regexp_replace(col("text"), "[^a-z ]", "")).cast("double")
        val nTok = expr("size(filter(split(text, ' '), x -> x != ''))").cast("double")
        val stops = (hits(" the ") + hits(" a ") + hits(" of ")).cast("double")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            length(col("text")).as("n_chars_obs"),
            round(lit(0.5) * (alpha / n)
              + lit(0.3) * least(lit(1.0), nTok / 100.0)
              + lit(0.2) * least(lit(1.0), stops / 10.0), 6).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, CAST(length(text) AS INT) AS n_chars_obs,
              |  round(
              |    0.5 * (CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
              |           / CAST(length(text) AS DOUBLE))
              |    + 0.3 * least(1.0, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) / 100.0)
              |    + 0.2 * least(1.0, CAST(${sqlHits(" the ")} + ${sqlHits(" a ")} + ${sqlHits(" of ")} AS DOUBLE) / 10.0),
              |    6) AS quality
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: stopword-hit scoring with a fixed tie order. (A real
    // n-gram model is a broadcast-joined lookup table; the operator shape — score →
    // argmax — is identical.)
    QueryDef(
      "t_langid",
      (s, dir) => {
        val sEn = hits(" the ") + hits(" and ")
        val sFr = hits(" le ") + hits(" et ")
        val sEs = hits(" el ") + hits(" que ")
        val sDe = hits(" der ") + hits(" und ")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            sEn.as("s_en"), sFr.as("s_fr"), sEs.as("s_es"), sDe.as("s_de"),
            when(sEn >= greatest(sFr, sEs, sDe), "en")
              .when(sFr >= greatest(sEs, sDe), "fr")
              .when(sEs >= sDe, "es")
              .otherwise("de").as("pred_lang"))
          .orderBy("doc_id")
      },
      Some(s"""WITH sc AS (
              |  SELECT doc_id,
              |    ${sqlHits(" the ")} + ${sqlHits(" and ")} AS s_en,
              |    ${sqlHits(" le ")} + ${sqlHits(" et ")} AS s_fr,
              |    ${sqlHits(" el ")} + ${sqlHits(" que ")} AS s_es,
              |    ${sqlHits(" der ")} + ${sqlHits(" und ")} AS s_de
              |  FROM documents)
              |SELECT doc_id, s_en, s_fr, s_es, s_de,
              |  CASE WHEN s_en >= greatest(s_fr, s_es, s_de) THEN 'en'
              |       WHEN s_fr >= greatest(s_es, s_de) THEN 'fr'
              |       WHEN s_es >= s_de THEN 'es'
              |       ELSE 'de' END AS pred_lang
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // Document fingerprint: two-level polynomial rolling hash (token chars → token
    // hash; token stream → doc hash), mod 2^31-1 — identical arithmetic in DuckDB.
    QueryDef(
      "t_fingerprint",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            expr(s"""aggregate(filter(split(text, ' '), x -> x != ''),
                    | 0L, (acc, t) -> (acc * 131 + $tokHash) % 2147483647)"""
              .stripMargin).as("fp"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  list_reduce(
              |    [CAST(0 AS BIGINT)] || list_transform(
              |      list_filter(string_split(text, ' '), x -> x <> ''),
              |      t -> $sqlTokHash),
              |    (acc, th) -> (acc * 131 + th) % 2147483647) AS fp
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Same fingerprint through the NATIVE Catalyst expression
    // (graft.functions.RollingHash, registered by GraftExtensions): the
    // char-level inner fold runs as one codegen'd pass instead of a nested
    // HOF with per-char allocations. Same oracle — semantics are identical.
    QueryDef(
      "t_fingerprint_native",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            expr("""aggregate(filter(split(text, ' '), x -> x != ''),
                   | 0L, (acc, t) -> (acc * 131 + rolling_hash(t)) % 2147483647)"""
              .stripMargin).as("fp"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  list_reduce(
              |    [CAST(0 AS BIGINT)] || list_transform(
              |      list_filter(string_split(text, ' '), x -> x <> ''),
              |      t -> $sqlTokHash),
              |    (acc, th) -> (acc * 131 + th) % 2147483647) AS fp
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Training-sequence packing (operators.Packing): docs → fixed-capacity
    // token sequences, sharded so the running-sum window distributes
    // (PARTITION BY shard, not one global partition). All-integer arithmetic
    // → bit-exact cross-engine.
    QueryDef(
      "t_pack",
      (s, dir) => {
        import graft.operators.Packing
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            expr("size(filter(split(text, ' '), x -> x != ''))")
              .cast("long").as("n_tok"))
        Packing.pack(toks, "doc_id", "n_tok", capacity = 512, nShards = 8)
          .select("doc_id", "shard", "n_tok", "seq_id", "seq_offset")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
             |    doc_id % 8 AS shard
             |  FROM documents),
             |packed AS (
             |  SELECT doc_id, shard, n_tok,
             |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM toks)
             |SELECT doc_id, shard, n_tok,
             |  ((cum - n_tok) // 512) * 8 + shard AS seq_id,
             |  (cum - n_tok) % 512 AS seq_offset
             |FROM packed ORDER BY doc_id""".stripMargin)),

    // Deterministic mixture sampling (operators.Sampling): weighted blend of
    // sources where each doc's keep/drop is a pure integer-hash function of
    // its id — reproducible across runs, retries, and engines (no RNG, no
    // float thresholds). Verified as per-source kept/total counts.
    QueryDef(
      "t_mixture_sample",
      (s, dir) => {
        import graft.operators.Sampling
        val docs = Tables.documents(s, dir)
        val kept = Sampling.mixture(docs, "doc_id", "source",
          Map("src0" -> 900, "src1" -> 600, "src2" -> 300), defaultRate = 150)
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        docs.groupBy("source").agg(count(lit(1)).as("n_total"))
          .join(kept, Seq("source"), "left")
          .select(col("source"), col("n_total"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("source")
      },
      Some(s"""WITH hashed AS (
              |  SELECT source, ${graft.operators.Sampling.perMilleSql("doc_id")} AS pm
              |  FROM documents)
              |SELECT source,
              |  CAST(COUNT(*) AS BIGINT) AS n_total,
              |  CAST(SUM(CASE WHEN pm < (CASE source WHEN 'src0' THEN 900
              |    WHEN 'src1' THEN 600 WHEN 'src2' THEN 300 ELSE 150 END)
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              |FROM hashed GROUP BY source ORDER BY source""".stripMargin)),

    // Stratified fixed-size sample: exactly k docs per source, chosen by the
    // deterministic per-mille hash order (doc_id tiebreak) — the "balanced
    // subset" op for eval sets. One exchange on source; at scale the
    // row_number window per stratum is bounded by stratum size, and a TopK
    // aggregator replaces it when k << stratum.
    QueryDef(
      "t_stratified_sample",
      (s, dir) => {
        import graft.operators.Sampling
        Sampling.stratified(Tables.documents(s, dir), "source", "doc_id", 10)
          .groupBy("source")
          .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("id_sum"))
          .orderBy("source")
      },
      Some(s"""WITH ranked AS (
              |  SELECT source, doc_id,
              |    ROW_NUMBER() OVER (PARTITION BY source
              |      ORDER BY ${graft.operators.Sampling.perMilleSql("doc_id")}, doc_id) AS rn
              |  FROM documents)
              |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
              |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
              |FROM ranked WHERE rn <= 10
              |GROUP BY source ORDER BY source""".stripMargin)),

    // PII redaction — the scrub pass every training corpus runs before the
    // tokenizer. The source table carries no PII, so the query PLANTS a
    // deterministic email + phone per doc (same construction in the oracle)
    // and must replace every occurrence with typed placeholders. Pure
    // regexp_replace (Spark replaces all matches by default; DuckDB needs
    // the 'g' flag — stated explicitly). Map-side at any scale.
    QueryDef(
      "t_redact_pii",
      (s, dir) => {
        val planted = Tables.documents(s, dir).filter(col("doc_id") < 25)
          .select(col("doc_id"),
            concat(col("text"), lit(" reach user"), col("doc_id"),
              lit("@example.com or call 555-"), col("doc_id") + 1000,
              lit(" today")).as("text"))
        planted
          .withColumn("redacted",
            regexp_replace(
              regexp_replace(col("text"),
                "[a-z0-9]+@[a-z0-9]+\\.[a-z]+", "<EMAIL>"),
              "555-[0-9]+", "<PHONE>"))
          .select(col("doc_id"), col("redacted"),
            expr("CAST((length(redacted) - length(replace(redacted, '<EMAIL>', ''))) / 7 AS BIGINT)")
              .as("n_emails"),
            expr("CAST((length(redacted) - length(replace(redacted, '<PHONE>', ''))) / 7 AS BIGINT)")
              .as("n_phones"))
          .orderBy("doc_id")
      },
      Some("""WITH planted AS (
             |  SELECT doc_id,
             |    text || ' reach user' || doc_id || '@example.com or call 555-'
             |         || (doc_id + 1000) || ' today' AS text
             |  FROM documents WHERE doc_id < 25),
             |red AS (
             |  SELECT doc_id,
             |    regexp_replace(
             |      regexp_replace(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
             |      '555-[0-9]+', '<PHONE>', 'g') AS redacted
             |  FROM planted)
             |SELECT doc_id, redacted,
             |  CAST((length(redacted) - length(replace(redacted, '<EMAIL>', ''))) / 7 AS BIGINT) AS n_emails,
             |  CAST((length(redacted) - length(replace(redacted, '<PHONE>', ''))) / 7 AS BIGINT) AS n_phones
             |FROM red ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination — flag corpus docs sharing any 8-token
    // span with a benchmark set (docs 0-19 here), the standard test-set
    // leakage gate. Contamination is PLANTED: docs 100-119 re-appear at
    // +300000 with the first 8 tokens of benchmark doc (id % 20) appended;
    // exactly those 20 must be flagged.
    //
    // Scale shape (this IS the 100 TB plan, not a sketch of one): the
    // corpus side never materializes gram strings — the native
    // `token_gram_hash` expression rolls a 64-bit hash over every 8-token
    // window in one compiled pass per doc, and the longs broadcast-join
    // against the (tiny) benchmark hash set. Equal windows ⇒ equal hashes,
    // so the prefilter cannot miss; the rare hash-matched (doc, pos)
    // candidates then rebuild their gram STRING and verify against the
    // benchmark grams, keeping the output exactly the oracle's
    // string-equality semantics even under a 64-bit collision. The naive
    // all-grams-as-strings form (8x the corpus bytes through an
    // interpreted lambda) benched 2.4 s at sf0.1; this shape ~3x faster.
    QueryDef(
      "d_contamination",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = "filter(split(text, ' '), x -> x != '')"
        val ghash = s"token_gram_hash($toks, 8)"
        val bench = docs.filter(col("doc_id") < 20)
        val benchHead8 = bench
          .select(col("doc_id").as("b_src"),
            expr(s"array_join(slice($toks, 1, 8), ' ')").as("head8"))
        // NOTE (r19, measured): pinning the planted branch and the bench
        // grams with eager localCheckpoints (to deduplicate their subtrees
        // across the two corpus consumers) was tried and REVERTED. The
        // deduplicated subtrees are fixture-bounded (20 bench docs, 20
        // planted rows — ~50 ms of executor work), while each eager pin
        // added a synchronous driver job plus a ~200 ms re-plan gap on the
        // truncated lineage: StageProfile showed 0.25 s executor CPU vs
        // 0.9 s driver dead time, and the bench read 0.51 → 0.58 s. The
        // lazy single-DAG shape below plans once; the repeated subtrees
        // stay constant-size at any corpus scale.
        val corpus = docs.filter(col("doc_id") >= 20)
          .select(col("doc_id"), col("text"))
          .unionByName(
            docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
              .withColumn("b_src", col("doc_id") % 20)
              .join(benchHead8, Seq("b_src"))
              .select((col("doc_id") + 300000).as("doc_id"),
                concat(col("text"), lit(" "), col("head8")).as("text")))
        // benchmark side: string grams (with source id) AND the hash set
        val benchGrams = bench
          .filter(expr(s"size($toks) >= 8"))
          .select(col("doc_id").as("bench_id"),
            explode(expr(s"transform(sequence(1, size($toks) - 7), " +
              s"i -> array_join(slice($toks, i, 8), ' '))")).as("g"))
          .distinct()
        val benchHashes = bench
          .select(explode(expr(ghash)).as("gh")).distinct()
        // corpus side: (doc_id, pos, hash) ONLY — never the text (a Generate
        // output row materializes every projected child column, so carrying
        // the document through a 10M-row explode would copy each doc once
        // per gram). pos is 0-based → the gram starts at token pos+1.
        val candPos = corpus
          .select(col("doc_id"), posexplode(expr(ghash)))
          .withColumnRenamed("col", "gh")
          .join(broadcast(benchHashes), Seq("gh"))
          .select(col("doc_id"), col("pos"))
        // exact verification: join the (rare) candidate positions back to
        // their docs and rebuild only those gram strings. Explicit broadcast:
        // candidates are hash matches against the benchmark — a tiny set by
        // design (a corpus where they are NOT tiny is wholesale test-set
        // leakage, and this query's output is the alarm)
        corpus
          .join(broadcast(candPos), Seq("doc_id"))
          .select(col("doc_id"),
            expr(s"array_join(slice($toks, pos + 1, 8), ' ')").as("g"))
          .join(broadcast(benchGrams), Seq("g"))
          .groupBy("doc_id")
          .agg(countDistinct(col("g")).as("n_shared"),
            min("bench_id").as("first_bench_hit"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t, text
             |  FROM documents),
             |bench8 AS (
             |  SELECT doc_id AS b_src,
             |    array_to_string(list_slice(t, 1, 8), ' ') AS head8
             |  FROM toks WHERE doc_id < 20),
             |corpus AS (
             |  SELECT doc_id, text FROM documents WHERE doc_id >= 20
             |  UNION ALL
             |  SELECT d.doc_id + 300000 AS doc_id, d.text || ' ' || b.head8 AS text
             |  FROM documents d JOIN bench8 b ON b.b_src = d.doc_id % 20
             |  WHERE d.doc_id >= 100 AND d.doc_id < 120),
             |cg AS (
             |  SELECT c.doc_id,
             |    unnest(list_transform(
             |      generate_series(1, greatest(len(list_filter(string_split(c.text, ' '), x -> x <> '')) - 7, 0)),
             |      i -> array_to_string(list_slice(list_filter(string_split(c.text, ' '), x -> x <> ''), i, i + 7), ' '))) AS g
             |  FROM corpus c),
             |bg AS (
             |  SELECT DISTINCT doc_id AS bench_id,
             |    unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
             |      i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
             |  FROM toks WHERE doc_id < 20)
             |SELECT cg.doc_id, CAST(COUNT(DISTINCT cg.g) AS BIGINT) AS n_shared,
             |       min(bg.bench_id) AS first_bench_hit
             |FROM cg JOIN bg ON bg.g = cg.g
             |GROUP BY cg.doc_id ORDER BY cg.doc_id""".stripMargin)),

    // Repetition quality signal (the Gopher-style duplicate-n-gram gate):
    // per doc, the fraction of token bigrams that are repeats and the share
    // of the single most frequent bigram — high values mark degenerate /
    // boilerplate text a corpus filter drops. Two co-partitioned
    // aggregations (doc_id,gram) → (doc_id): the second groupBy reuses the
    // first's hash partitioning, so one real exchange at any scale.
    QueryDef(
      "t_repetition",
      (s, dir) => {
        val toks = "filter(split(text, ' '), x -> x != '')"
        Tables.documents(s, dir)
          .filter(expr(s"size($toks) >= 2"))
          .select(col("doc_id"),
            explode(expr(s"transform(sequence(1, size($toks) - 1), " +
              s"i -> array_join(slice($toks, i, 2), ' '))")).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_bigrams"),
            sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup"),
            max("c").as("max_c"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("n_dup") / col("n_bigrams"), 6).as("dup_frac"),
            round(col("max_c") / col("n_bigrams"), 6).as("top_share"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
             |  FROM documents),
             |g AS (
             |  SELECT doc_id,
             |    unnest(list_transform(generate_series(1, len(t) - 1),
             |      i -> array_to_string(list_slice(t, i, i + 1), ' '))) AS g
             |  FROM t WHERE len(t) >= 2),
             |c AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
             |      FROM g GROUP BY doc_id, g)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             |  round(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6) AS dup_frac,
             |  round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_share
             |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Distribution-drift gate (quality.Checks.psi): PSI of the doc-length
    // distribution, src0 as baseline vs src1 as current, fixed bin edges.
    // Integer bin counts, identical double division, ln rounded via the
    // 6-dp final round (libm vs JVM last-ulp).
    QueryDef(
      "t_drift_psi",
      (s, dir) => {
        import graft.quality.Checks
        val docs = Tables.documents(s, dir)
        Checks.psi(
          docs.filter(col("source") === "src0"),
          docs.filter(col("source") === "src1"),
          "n_chars", edges = Seq(150.0, 250.0, 350.0, 450.0))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    (CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END
             |   + CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END
             |   + CASE WHEN n_chars >= 350 THEN 1 ELSE 0 END
             |   + CASE WHEN n_chars >= 450 THEN 1 ELSE 0 END) AS bin
             |  FROM documents WHERE source IN ('src0', 'src1')),
             |c AS (
             |  SELECT bin,
             |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS nc
             |  FROM d GROUP BY bin),
             |t AS (SELECT CAST(SUM(nb) AS BIGINT) AS tb, CAST(SUM(nc) AS BIGINT) AS tc FROM c),
             |p AS (
             |  SELECT greatest(nb / CAST(tb AS DOUBLE), 1e-6) AS pb,
             |         greatest(nc / CAST(tc AS DOUBLE), 1e-6) AS pc
             |  FROM c, t)
             |SELECT round(SUM((pc - pb) * ln(pc / pb)), 6) AS psi,
             |  (SELECT tb FROM t) AS n_base, (SELECT tc FROM t) AS n_cur
             |FROM p""".stripMargin)),

    // Keyword extraction: top-3 terms per doc by tf-idf (smoothed idf =
    // ln((N+1)/(df+1)) + 1, the scikit-style formula). Cross-engine exact by
    // computing ln ONCE PER TERM and rounding idf to 6 dp BEFORE the tf
    // multiply + ranking, so both engines rank identical doubles (ties break
    // on the term). Scale: two hash aggs + a broadcast of the per-term idf
    // table; the per-doc window partitions on doc_id (never global).
    QueryDef(
      "t_tfidf",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = "filter(split(text, ' '), x -> x != '')"
        val terms = docs.select(col("doc_id"), explode(expr(toks)).as("t"))
        val tf = terms.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val idf = tf.groupBy("t").agg(count(lit(1)).as("df"))
          .crossJoin(docs.agg(count(lit(1)).as("n_docs"))) // 1-row broadcast
          .select(col("t"),
            expr("round(ln((n_docs + 1.0) / (df + 1.0)) + 1.0, 6)").as("idf_r"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("tfidf").desc, col("t"))
        tf.join(idf, Seq("t"))
          .select(col("doc_id"), col("t"),
            expr("round(tf * idf_r, 6)").as("tfidf"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk").cast("int").as("rk"),
            col("t"), col("tfidf"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |  FROM documents),
             |tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
             |       FROM terms GROUP BY doc_id, t),
             |idf AS (
             |  SELECT t, round(ln(((SELECT COUNT(*) FROM documents) + 1.0)
             |    / (COUNT(*) + 1.0)) + 1.0, 6) AS idf_r
             |  FROM tf GROUP BY t),
             |ranked AS (
             |  SELECT tf.doc_id, tf.t, round(tf.tf * idf.idf_r, 6) AS tfidf,
             |    row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY round(tf.tf * idf.idf_r, 6) DESC, tf.t) AS rk
             |  FROM tf JOIN idf USING (t))
             |SELECT doc_id, CAST(rk AS INT) AS rk, t, tfidf
             |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // Unigram language-model quality score: mean token log-probability under
    // the corpus unigram distribution with add-1 smoothing — low scores mark
    // gibberish / OOV-heavy text, the classic cheap LM quality gate.
    // Cross-engine exact: ln(p) is DECOMPOSED as ln(c+1) − ln(T+V) so every
    // transcendental input is a small integer — the distinct-input count
    // (and with it the libm-vs-JVM last-ulp straddle exposure of the 6-dp
    // round) drops from |vocab| ratios to a few hundred count values. The
    // 6-dp per-term values then become exact BIGINT micro-units, and the
    // per-doc mean is an INTEGER division rounded in micro-space: a true
    // tie (the sf1 sweep hit Σ/n ending exactly in …5 — Spark's
    // decimal-string HALF_UP and DuckDB's multiply-then-std::round disagreed
    // on the same double) is a small-denominator rational, hence an EXACT
    // dyadic .5 double that both engines round away from zero identically;
    // non-ties sit ≥1/(2n) micro-units from any boundary, dwarfing double
    // error. Scale: term-count agg + broadcast of the per-term table; one
    // exchange per agg.
    QueryDef(
      "t_unigram_lm",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = "filter(split(text, ' '), x -> x != '')"
        val terms = docs.select(col("doc_id"), explode(expr(toks)).as("t"))
        val tc = terms.groupBy("t").agg(count(lit(1)).as("c"))
        val lp = tc
          .crossJoin(tc.agg(sum("c").as("tot"), count(lit(1)).as("vocab")))
          .select(col("t"),
            expr("CAST(round(round(ln(c + 1.0), 6) * 1e6) AS BIGINT)").as("lc_mc"),
            expr("CAST(round(round(ln(CAST(tot + vocab AS DOUBLE)), 6) * 1e6) AS BIGINT)")
              .as("norm_mc"))
        terms.join(broadcast(lp), Seq("t"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            (round((sum(col("lc_mc")) - count(lit(1)) * first(col("norm_mc")))
              .cast("double") / count(lit(1))) / lit(1e6)).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |  FROM documents),
             |tc AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM terms GROUP BY t),
             |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot,
             |               CAST(COUNT(*) AS BIGINT) AS vocab FROM tc),
             |lp AS (SELECT t,
             |         CAST(round(round(ln(c + 1.0), 6) * 1e6) AS BIGINT) AS lc_mc,
             |         CAST(round(round(ln(CAST(tot + vocab AS DOUBLE)), 6) * 1e6) AS BIGINT)
             |           AS norm_mc
             |       FROM tc, tot)
             |SELECT terms.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             |  round(CAST(SUM(lc_mc) - COUNT(*) * first(norm_mc) AS DOUBLE)
             |    / COUNT(*)) / 1e6 AS avg_logprob
             |FROM terms JOIN lp USING (t)
             |GROUP BY terms.doc_id ORDER BY terms.doc_id""".stripMargin)),

    // Bigram language-model quality score: mean conditional log-probability
    // ln p(b|a) = ln(c(a,b)+1) − ln(c(a·)+V) with add-1 smoothing over the
    // unigram vocab — the next step up from t_unigram_lm's bag-of-words
    // gate, sensitive to word ORDER (shuffled gibberish scores low even
    // when its unigram mix is normal). Same cross-engine discipline as
    // t_unigram_lm: transcendental inputs are small integers, 6-dp values
    // become exact BIGINT micro-units, and the per-doc mean rounds in
    // micro-space where true ties are exact dyadic .5 doubles.
    //
    // Scale (rebuilt after the r12 bench caught AQE occasionally planning
    // the scoring join as a full-stream string-pair sort-merge — a 25× cpu
    // blowup at sf1): the exploded bigram stream feeds exactly ONE
    // aggregation per job. Its distinct-pair result is bounded by |V|² and
    // must be broadcast-sized for the scoring probe anyway, so it is pinned
    // as a LocalRelation and ctx / vocab / lp all derive from the pin —
    // without it, inner-join null filters push asymmetrically into each
    // consumer and AQE exchange reuse cannot dedupe the subtrees (measured:
    // 5 Generate nodes, 0 ReusedExchange). The pin is DOUBLE-gated (r13
    // ADVICE): rows AND estimated driver bytes, enforced by a byte-metered
    // toLocalIterator over the aggregation — one executor-side pass, driver
    // heap bounded by the gate plus one in-flight partition, and a void
    // premise stops FETCHING at the gate (never a 4M-tuple take discarded;
    // wide-token corpora can't sneak hundreds of MB past a row-only gate).
    // The scoring pass then re-derives bigrams as a pipelined map
    // (recompute-over-materialize: a second tokenize pass is cheaper at
    // 100 TB than caching or shuffling a stream-sized intermediate) and
    // probes lp as an EXPLICIT broadcast — the hint, not stats, decides.
    // The vocabulary needs no full-corpus explode OR separate scan: the pin
    // pass pads each doc with one trailing-NULL sentinel bigram, so distinct
    // tokens = pair endpoints ∪ sentinel endpoints, counted on the driver
    // during the pin fetch. Net on the pin path: 2 corpus scans (pin,
    // scoring — both exploding), zero stream-sized exchanges, and the
    // broadcast build reads only a LocalRelation (ctx summed on the driver —
    // exact long adds; the micro-unit ln/round math stays in the SAME Spark
    // expressions both paths share). Past either gate the
    // broadcastable-lp premise is void and the plan degrades to
    // stats-driven shuffle joins with the full-explode vocabulary. Docs
    // with fewer than 2 tokens carry no bigrams and drop out (documented).
    QueryDef(
      "t_bigram_lm",
      (s, dir) => bigramLm(s, dir),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
             |  FROM documents),
             |bigrams AS (
             |  SELECT doc_id, tk[i - 1] AS a, tk[i] AS b
             |  FROM toks, LATERAL (SELECT unnest(generate_series(2, len(tk))) AS i)
             |  WHERE len(tk) >= 2),
             |cab AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab
             |        FROM bigrams GROUP BY a, b),
             |ctx AS (SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM cab GROUP BY a),
             |vocab AS (
             |  SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM (
             |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |    FROM documents)),
             |lp AS (SELECT a, b,
             |         CAST(round(round(ln(cab + 1.0), 6) * 1e6) AS BIGINT) AS lc_mc,
             |         CAST(round(round(ln(CAST(ca + v AS DOUBLE)), 6) * 1e6) AS BIGINT)
             |           AS ctx_mc
             |       FROM cab JOIN ctx USING (a), vocab)
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             |  round(CAST(SUM(lc_mc) - SUM(ctx_mc) AS DOUBLE) / COUNT(*)) / 1e6
             |    AS avg_logprob
             |FROM bigrams JOIN lp USING (a, b)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // URL parsing (web-corpus metadata extraction): host / path / query-param
    // decomposition with Spark's native parse_url over URLs constructed from
    // document columns; the oracle states the equivalent regex extractions.
    QueryDef(
      "t_url_parse",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("url", concat(lit("https://"), col("source"),
            lit(".example.com/docs/"), col("doc_id"),
            lit("?lang="), col("lang")))
          .select(col("doc_id"),
            expr("parse_url(url, 'HOST')").as("host"),
            expr("parse_url(url, 'PATH')").as("path"),
            expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
             |  regexp_extract(url, 'lang=([a-z]+)', 1) AS q_lang
             |FROM (
             |  SELECT doc_id,
             |    'https://' || source || '.example.com/docs/' || doc_id
             |      || '?lang=' || lang AS url
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Vocabulary induction: rank tokens by corpus frequency and assign dense
    // ids — the tokenizer-vocab build step. One explode + one hash agg +
    // a global rank over the (small) distinct-token table; at scale the
    // global window runs over the aggregated vocab, never the corpus.
    QueryDef(
      "t_vocab",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("t"))
        Tables.documents(s, dir)
          .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
          .withColumn("vocab_id", row_number().over(w).cast("long"))
          .filter(col("vocab_id") <= 200)
          .orderBy("vocab_id")
      },
      Some("""WITH toks AS (
             |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |  FROM documents),
             |vocab AS (
             |  SELECT t, CAST(COUNT(*) AS BIGINT) AS c,
             |    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS BIGINT)
             |      AS vocab_id
             |  FROM toks GROUP BY t)
             |SELECT t, c, vocab_id FROM vocab
             |WHERE vocab_id <= 200 ORDER BY vocab_id""".stripMargin)),

    // OOV rate per document against the top-50 vocabulary — the coverage
    // check run before committing to a tokenizer. The vocab is broadcast
    // (it is by construction tiny). The tokenized corpus is consumed twice
    // (vocab build + membership join) — inherent to a global vocab; a real
    // pipeline persists the vocab table from the t_vocab step instead.
    QueryDef(
      "t_oov",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("t"))
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(expr("filter(split(text, ' '), x -> x <> '')")).as("t"))
        val vocab = toks.groupBy("t").agg(count(lit(1)).as("c"))
          .withColumn("r", row_number().over(w))
          .filter(col("r") <= 50)
          .select("t")
        toks.join(broadcast(vocab.withColumn("iv", lit(1L))), Seq("t"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            (count(lit(1)) - sum(coalesce(col("iv"), lit(0L)))).as("n_oov"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
             |  FROM documents),
             |vocab AS (
             |  SELECT t FROM (
             |    SELECT t, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t) AS r
             |    FROM toks GROUP BY t) WHERE r <= 50)
             |SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             |  CAST(COUNT(*) - SUM(CASE WHEN v.t IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_oov
             |FROM toks LEFT JOIN vocab v ON toks.t = v.t
             |GROUP BY toks.doc_id ORDER BY toks.doc_id""".stripMargin)),

    // RAG-style chunking: overlapping 64-token windows at stride 48 per
    // document (16-token overlap keeps retrieval context across boundaries).
    // Entirely map-side HOFs — tokenize once, generate window starts with a
    // strided sequence, slice — so at corpus scale this is a single pass with
    // zero exchanges before the sink.
    QueryDef(
      "t_chunk",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("toks", expr("filter(split(text, ' '), x -> x <> '')"))
          .withColumn("n", size(col("toks")))
          .filter(col("n") > 0)
          .select(col("doc_id"), col("n"),
            posexplode(expr(
              "transform(sequence(0, n - 1, 48), s -> struct(" +
                "least(64, n - s) AS n_tok, " +
                "array_join(slice(toks, s + 1, 64), ' ') AS chunk_text))"))
              .as(Seq("chunk_idx", "ch")))
          .select(col("doc_id"), col("chunk_idx"),
            col("ch.n_tok").cast("long").as("n_tok"),
            col("ch.chunk_text").as("chunk_text"))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
             |  FROM documents),
             |ex AS (
             |  SELECT doc_id, toks,
             |    unnest(generate_series(0, len(toks) - 1, 48)) AS s
             |  FROM toks WHERE len(toks) > 0)
             |SELECT doc_id, CAST(s // 48 AS INT) AS chunk_idx,
             |  CAST(least(64, len(toks) - s) AS BIGINT) AS n_tok,
             |  array_to_string(list_slice(toks, s + 1, s + 64), ' ') AS chunk_text
             |FROM ex ORDER BY doc_id, chunk_idx""".stripMargin)),

    // The training-data pipeline COMPOSED end-to-end from the oracled
    // building blocks: quality-score filter → exact fingerprint dedup (keep
    // lowest doc_id) → fixed-capacity sequence packing. One declarative
    // plan, so Catalyst fuses scoring+filter into the scan stage; total
    // shuffle cost at any scale is the dedup window (hash by fp) plus the
    // packing window (hash by shard) — no collect, no staging tables.
    QueryDef(
      "t_pipeline_e2e",
      (s, dir) => {
        import graft.operators.Packing
        val n = length(col("text")).cast("double")
        val alpha = length(regexp_replace(col("text"), "[^a-z ]", "")).cast("double")
        val nTokD = expr("size(filter(split(text, ' '), x -> x != ''))").cast("double")
        val stops = (hits(" the ") + hits(" a ") + hits(" of ")).cast("double")
        val scored = Tables.documents(s, dir).select(
          col("doc_id"),
          expr("size(filter(split(text, ' '), x -> x != ''))")
            .cast("long").as("n_tok"),
          expr(s"""aggregate(filter(split(text, ' '), x -> x != ''),
                  | 0L, (acc, t) -> (acc * 131 + $tokHash) % 2147483647)"""
            .stripMargin).as("fp"),
          round(lit(0.5) * (alpha / n) + lit(0.3) * least(lit(1.0), nTokD / 100.0)
            + lit(0.2) * least(lit(1.0), stops / 10.0), 6).as("quality"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("doc_id")
        val deduped = scored.where(col("quality") >= 0.5)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1).drop("rn")
        Packing.pack(deduped, "doc_id", "n_tok", capacity = 512, nShards = 8)
          .select("doc_id", "quality", "fp", "n_tok", "seq_id", "seq_offset")
          .orderBy("doc_id")
      },
      Some(s"""WITH scored AS (
              |  SELECT doc_id,
              |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok,
              |    list_reduce(
              |      [CAST(0 AS BIGINT)] || list_transform(
              |        list_filter(string_split(text, ' '), x -> x <> ''),
              |        t -> $sqlTokHash),
              |      (acc, th) -> (acc * 131 + th) % 2147483647) AS fp,
              |    round(
              |      0.5 * (CAST(length(regexp_replace(text, '[^a-z ]', '', 'g')) AS DOUBLE)
              |             / CAST(length(text) AS DOUBLE))
              |      + 0.3 * least(1.0, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) / 100.0)
              |      + 0.2 * least(1.0, CAST(${sqlHits(" the ")} + ${sqlHits(" a ")} + ${sqlHits(" of ")} AS DOUBLE) / 10.0),
              |      6) AS quality
              |  FROM documents),
              |dedup AS (
              |  SELECT * FROM (
              |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              |    FROM scored WHERE quality >= 0.5)
              |  WHERE rn = 1),
              |sharded AS (
              |  SELECT doc_id, quality, fp, n_tok, doc_id % 8 AS shard FROM dedup),
              |packed AS (
              |  SELECT doc_id, quality, fp, n_tok, shard,
              |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              |  FROM sharded)
              |SELECT doc_id, quality, fp, n_tok,
              |  ((cum - n_tok) // 512) * 8 + shard AS seq_id,
              |  (cum - n_tok) % 512 AS seq_offset
              |FROM packed ORDER BY doc_id""".stripMargin)),
  )
}
