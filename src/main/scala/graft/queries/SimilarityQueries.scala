package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d):
  * brute-force cosine top-k (the correctness baseline) and a random-hyperplane
  * LSH-bucketed variant (the scale path).
  *
  * Exactness strategy: dot products and norms are sequential left-folds over
  * the array (`aggregate(zip_with(...))` in Spark, `list_reduce` with a
  * prepended zero in DuckDB) — identical accumulation order, so every double
  * is bit-identical cross-engine with no decimal detour. Everything is
  * map-side per pair; the pair set itself is a broadcast-size cross join of
  * the query set against the candidate shard.
  *
  * Scale: brute-force is O(Q×N) map-side work after broadcasting Q — each
  * partition scores its shard and a top-k merge finishes; no shuffle of the
  * corpus. The LSH variant buckets the corpus once (map-side signature) and
  * only scores within the query's bucket — the 100 TB path. The id-range caps
  * bound the sf0.01 oracle; the plan shape is scale-free.
  */
object SimilarityQueries {

  private val D = 64 // embedding dimensionality
  private val QN = 5 // query vectors: vec_id < QN
  private val CN = 400 // candidate corpus: vec_id < CN

  /** Sequential-fold sum of an array<double> expression (bit-exact mirror of
    * the DuckDB list_reduce with prepended 0.0). */
  private def foldSum(arr: String): String =
    s"aggregate($arr, 0.0D, (acc, p) -> acc + p)"

  private def sqlFoldSum(arr: String): String =
    s"list_reduce([CAST(0.0 AS DOUBLE)] || $arr, (acc, p) -> acc + p)"

  // NATIVE codegen'd sequential fold (graft.functions.FloatDot) — identical
  // accumulation order to the HOF form the oracle states, one fused loop
  // instead of a zipped intermediate array + two lambdas per element.
  private val dotExpr = "float_dot(e1, e2)"

  private val sqlDotExpr = sqlFoldSum(
    "list_transform(list_zip(a.embedding, b.embedding), " +
      "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))")

  /** Per-vector squared norm, folded in array order. */
  private def norms(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < CN)
      .select(col("vec_id"),
        expr("float_dot(embedding, embedding)").as("nrm2"))

  private val sqlNorms =
    s"""nrm AS (
       |  SELECT vec_id,
       |    ${sqlFoldSum("list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")} AS nrm2
       |  FROM embeddings WHERE vec_id < $CN)""".stripMargin

  /** Pairwise cosine between query vecs (d1 < QN) and candidates (d1 < d2):
    * broadcast the query set, fold per pair — no corpus shuffle. */
  private def cosines(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).filter(col("vec_id") < CN)
    val q = e.filter(col("vec_id") < QN)
      .select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val c = e.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    val n = norms(s, dir)
    broadcast(q).join(c, col("d1") < col("d2"))
      .withColumn("dot", expr(dotExpr))
      .join(broadcast(n.select(col("vec_id").as("d1"), col("nrm2").as("nrm1"))), Seq("d1"))
      .join(n.select(col("vec_id").as("d2"), col("nrm2").as("nrm2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        (col("dot") / (sqrt(col("nrm1")) * sqrt(col("nrm2")))).as("cos"))
  }

  private val sqlCosines =
    s"""$sqlNorms,
       |cosines AS (
       |  SELECT a.vec_id AS d1, b.vec_id AS d2,
       |    $sqlDotExpr / (sqrt(n1.nrm2) * sqrt(n2.nrm2)) AS cos
       |  FROM embeddings a
       |  JOIN embeddings b ON a.vec_id < b.vec_id
       |  JOIN nrm n1 ON n1.vec_id = a.vec_id
       |  JOIN nrm n2 ON n2.vec_id = b.vec_id
       |  WHERE a.vec_id < $QN AND b.vec_id < $CN)""".stripMargin

  /** Append the LSH bucket id MAP-SIDE (no join, no shuffle): 8 sign bits of
    * dots with integer pseudo-random hyperplanes
    * w(dim, j) = ((dim*31 + j*17) % 7) - 3, dim 1-based. Keeping the
    * embedding alongside the bucket is what lets the search equi-join on
    * `bucket` and score in place — the corpus is never enumerated pairwise.
    */
  private def withBucket(e: DataFrame): DataFrame = {
    val dots = (0 until 8).map { j =>
      expr(foldSum(s"zip_with(embedding, sequence(1, $D), " +
        s"(x, i) -> CAST(x AS DOUBLE) * CAST((i * 31 + $j * 17) % 7 - 3 AS DOUBLE))"))
        .as(s"dot_$j")
    }
    e.select(col("vec_id") +: col("embedding") +: dots: _*)
      .select(col("vec_id"), col("embedding"),
        (0 until 8).map(j => when(col(s"dot_$j") >= 0.0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("bucket"),
        // squared norm computed ONCE per vector here (same fold as the nrm
        // oracle CTE) — scoring must not re-fold it per candidate pair
        expr("float_dot(embedding, embedding)").as("nrm2"))
  }

  private def buckets(s: SparkSession, dir: String): DataFrame =
    withBucket(Tables.embeddings(s, dir).filter(col("vec_id") < CN))
      .select("vec_id", "bucket")

  /** Shared bucket-first ANN body: equi-join a (broadcast-size) probe frame
    * (d1, e1, nrm1, bucket) against the bucketed corpus ON `bucket`, score
    * in-bucket candidates, rank top-k per query. Single-probe and
    * multiprobe differ ONLY in how many probe rows each query contributes.
    */
  private def bucketTopK(s: SparkSession, dir: String,
      probes: DataFrame => DataFrame, k: Int): DataFrame = {
    val eb = withBucket(Tables.embeddings(s, dir).filter(col("vec_id") < CN))
    val q = probes(eb.filter(col("vec_id") < QN))
    val c = eb.select(col("vec_id").as("d2"), col("embedding").as("e2"),
      col("bucket"), col("nrm2"))
    val w = Window.partitionBy("d1").orderBy(col("cos").desc, col("d2"))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .withColumn("dot", expr(dotExpr))
      .select(col("d1"), col("d2"),
        (col("dot") / (sqrt(col("nrm1")) * sqrt(col("nrm2")))).as("cos"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("d1", "rnk", "d2", "cos")
      .orderBy("d1", "rnk")
  }

  private val sqlBuckets =
    s"""pd AS (
       |  SELECT vec_id,
       |${(0 until 8).map(j =>
          s"    ${sqlFoldSum(s"list_transform(list_zip(embedding, generate_series(1, $D)), " +
            s"p -> CAST(p[1] AS DOUBLE) * CAST((p[2] * 31 + $j * 17) % 7 - 3 AS DOUBLE))")} AS dot_$j")
          .mkString(",\n")}
       |  FROM embeddings WHERE vec_id < $CN),
       |buckets AS (
       |  SELECT vec_id,
       |    ${(0 until 8).map(j => s"(CASE WHEN dot_$j >= 0.0 THEN ${1L << j} ELSE 0 END)")
            .mkString(" + ")} AS bucket
       |  FROM pd)""".stripMargin

  /** Brute-force L2 top-10 for query vecs (vec_id < QN) over the FULL
    * embeddings table — the oracle for the exact-degradation ANN entries.
    * Distance is the same sequential fold [[graft.operators.Ivf]] scores
    * with (prepended-zero list_reduce ≡ `aggregate(zip_with(...))`), so
    * every double is bit-identical cross-engine. */
  private val sqlBruteL2 =
    s"""WITH l2 AS (
       |  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
       |    ${sqlFoldSum("list_transform(list_zip(a.embedding, b.embedding), " +
           "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
           "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))")} AS l2_dist
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id < $QN)
       |SELECT q_id, CAST(rnk AS INT) AS "rank", vec_id, l2_dist FROM (
       |  SELECT q_id, vec_id, l2_dist,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY l2_dist, vec_id) AS rnk
       |  FROM l2) WHERE rnk <= 10
       |ORDER BY q_id, "rank"""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-k per query vector — the ANN correctness baseline.
    QueryDef(
      "s_knn_brute",
      (s, dir) => {
        val w = Window.partitionBy("d1").orderBy(col("cos").desc, col("d2"))
        cosines(s, dir)
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 10)
          .select("d1", "rnk", "d2", "cos")
          .orderBy("d1", "rnk")
      },
      Some(s"""WITH $sqlCosines
              |SELECT d1, CAST(rnk AS INT) AS rnk, d2, cos FROM (
              |  SELECT d1, d2, cos,
              |    ROW_NUMBER() OVER (PARTITION BY d1 ORDER BY cos DESC, d2) AS rnk
              |  FROM cosines) WHERE rnk <= 10
              |ORDER BY d1, rnk""".stripMargin),
      headline = true),

    // Embedding near-duplicate pairs: top-20 most-cosine-similar pairs among
    // the query set — the embedding-cosine dedup operator.
    QueryDef(
      "s_embedding_neardup",
      (s, dir) =>
        cosines(s, dir)
          .orderBy(col("cos").desc, col("d1"), col("d2"))
          .limit(20),
      Some(s"""WITH $sqlCosines
              |SELECT d1, d2, cos FROM cosines
              |ORDER BY cos DESC, d1, d2 LIMIT 20""".stripMargin)),

    // Random-hyperplane LSH bucket assignment — the map-side half of scalable ANN.
    QueryDef(
      "s_lsh_buckets",
      (s, dir) =>
        buckets(s, dir)
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_vecs"), min("vec_id").as("min_vec"))
          .orderBy("bucket"),
      Some(s"""WITH $sqlBuckets
              |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs,
              |       min(vec_id) AS min_vec
              |FROM buckets GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Bucketed ANN, bucket-FIRST (the 100 TB search path): bucket ids are
    // computed map-side on both sides, the broadcast query set equi-joins the
    // corpus ON the bucket key (the Ivf.search shape), and the exact cosine
    // is computed only for in-bucket candidates. Unlike s_knn_brute, no Q×N
    // pair is ever enumerated — per-query cost is its bucket's population.
    // PlanAuditSpec asserts the equi-join-on-bucket / no-nested-loop shape.
    QueryDef(
      "s_lsh_knn",
      (s, dir) => bucketTopK(s, dir, q => q.select(
        col("vec_id").as("d1"), col("embedding").as("e1"),
        col("nrm2").as("nrm1"), col("bucket")), k = 5),
      Some(s"""WITH $sqlCosines,
              |$sqlBuckets
              |SELECT d1, CAST(rnk AS INT) AS rnk, d2, cos FROM (
              |  SELECT c.d1, c.d2, c.cos,
              |    ROW_NUMBER() OVER (PARTITION BY c.d1 ORDER BY c.cos DESC, c.d2) AS rnk
              |  FROM cosines c
              |  JOIN buckets b1 ON b1.vec_id = c.d1
              |  JOIN buckets b2 ON b2.vec_id = c.d2
              |  WHERE b1.bucket = b2.bucket) WHERE rnk <= 5
              |ORDER BY d1, rnk""".stripMargin)),

    // MULTIPROBE bucketed ANN: the recall dial on the bucket-first plan.
    // Each query probes its own bucket plus the 8 Hamming-1 neighbors —
    // a map-side explode on the (broadcast-size) QUERY side only; the
    // corpus side is untouched and still reached by an equi-join on the
    // bucket key. A sign-bit near a hyperplane is the dominant LSH miss
    // mode; flipping one bit at a time recovers those neighbors at 9× the
    // probe count, not 9× the corpus cost. The oracle states the
    // plan-agnostic equivalent: candidates are pairs whose bucket codes
    // differ in at most one bit.
    QueryDef(
      "s_lsh_knn_multiprobe",
      (s, dir) => {
        val masks = array((Seq(0L) ++ (0 until 8).map(j => 1L << j)).map(lit): _*)
        bucketTopK(s, dir, q => q.select(
          col("vec_id").as("d1"), col("embedding").as("e1"),
          col("nrm2").as("nrm1"), col("bucket").as("qb"),
          explode(masks).as("mask"))
          .select(col("d1"), col("e1"), col("nrm1"),
            col("qb").bitwiseXOR(col("mask")).as("bucket")), k = 5)
      },
      Some(s"""WITH $sqlCosines,
              |$sqlBuckets
              |SELECT d1, CAST(rnk AS INT) AS rnk, d2, cos FROM (
              |  SELECT c.d1, c.d2, c.cos,
              |    ROW_NUMBER() OVER (PARTITION BY c.d1 ORDER BY c.cos DESC, c.d2) AS rnk
              |  FROM cosines c
              |  JOIN buckets b1 ON b1.vec_id = c.d1
              |  JOIN buckets b2 ON b2.vec_id = c.d2
              |  WHERE bit_count(xor(b1.bucket, b2.bucket)) <= 1) WHERE rnk <= 5
              |ORDER BY d1, rnk""".stripMargin)),

    // Product-quantized ANN (graft.operators.Pq): codebook-compressed codes,
    // ADC shortlist, exact re-rank. No oracle — KMeans codebooks are not
    // SQL-expressible; correctness (recall vs brute force, exact re-ranked
    // distances, nearest-centroid assignment) is pinned by PqSpec. Registered
    // rows-only so the driver sees it and Bench can trend its cost.
    QueryDef(
      "s_pq_knn",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding")
        val cb = graft.operators.Pq.train(vecs, dim = 64, m = 16, k = 16,
          sampleFraction = 0.5)
        val enc = graft.operators.Pq.encode(vecs, cb)
        val queries = vecs.filter(col("vec_id") < 20)
        graft.operators.Pq.search(enc, queries, cb, k = 5, shortlist = 64)
          .orderBy("q_id", "rank")
      },
      None),

    // IVF-PQ composed ANN (graft.operators.IvfPq): coarse cells prune WHICH
    // vectors are scored (equi-join on cell), residual product codes shrink
    // WHAT is scored. No oracle (KMeans); IvfPqSpec pins exact degradation
    // (probe-all ≡ brute force), pruned recall, exact re-rank, and the
    // equi-join plan shape.
    QueryDef(
      "s_ivfpq_knn",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding")
        val idx = graft.operators.IvfPq.build(vecs, dim = 64)
        // One-shot query: pin the tiny (queries × k rows) result eagerly,
        // then free the cached code table build() left in executor storage
        // (round-5 ADVICE). localCheckpoint blocks are ContextCleaner-managed
        // — unlike a cache, they vanish when the frame is GC'd.
        val res = graft.operators.IvfPq.search(idx,
            vecs.filter(col("vec_id") < 20), kNN = 5, nProbe = 4)
          .orderBy("q_id", "rank")
          .localCheckpoint(true)
        idx.unpersist()
        res
      },
      None),

    // PQ / IVF-PQ re-rank layer, ORACLE-GATED through exact degradation
    // (r12 VERDICT #6 — the same move a_heavy_hitters made for MG): with an
    // uncapped shortlist (and, for IVF, every cell probed) the composed
    // index path — coarse assignment, cell equi-join, ADC table build and
    // decode, shortlist window, exact re-rank — must produce EXACTLY the
    // brute-force L2 top-k, INDEPENDENT of the trained codebooks: the
    // sketch only orders what the full shortlist keeps anyway, so KMeans
    // randomness cannot reach the output. DuckDB recomputes brute force
    // with the same sequential-fold distance, so a green row hash-gates
    // every deterministic layer of the ANN pipeline; the pruning benefit
    // itself (what the capped twins exercise) stays spec-verified via the
    // recall gates in PqSpec / IvfPqSpec.
    QueryDef(
      "s_pq_knn_exact",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding")
        val cb = graft.operators.Pq.train(vecs, dim = 64, m = 16, k = 16,
          sampleFraction = 0.5)
        val enc = graft.operators.Pq.encode(vecs, cb)
        val queries = vecs.filter(col("vec_id") < QN)
        graft.operators.Pq.search(enc, queries, cb, k = 10,
            shortlist = Int.MaxValue)
          .orderBy("q_id", "rank")
      },
      Some(sqlBruteL2)),

    QueryDef(
      "s_ivfpq_knn_exact",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding")
        val idx = graft.operators.IvfPq.build(vecs, dim = 64, nLists = 16)
        val res = graft.operators.IvfPq.search(idx,
            vecs.filter(col("vec_id") < QN), kNN = 10, nProbe = 16,
            shortlist = Int.MaxValue)
          .orderBy("q_id", "rank")
          .localCheckpoint(true) // same pin-then-free as s_ivfpq_knn
        idx.unpersist()
        res
      },
      Some(sqlBruteL2)),

    // Semantic dedup THROUGH the IVF-PQ index (round-6 VERDICT #3): near-dup
    // candidate generation cell-pruned by the coarse quantizer instead of
    // LSH buckets or brute pairs — the documented 100 TB ANN architecture
    // feeding the dedup pipeline. No oracle (KMeans); ScalableDedupSpec pins
    // planted-pair recall ≥ the LSH path and the equi-join-on-cell plan.
    QueryDef(
      "d_semantic_ivfpq",
      (s, dir) =>
        graft.operators.ScalableDedup.embeddingNearDupsIvfPq(
            graft.sources.Tables.embeddings(s, dir).select("vec_id", "embedding"),
            dim = 64, maxSqDistance = 1.25)
          .orderBy("v1", "v2"),
      None,
      scaleNote = Some("OUTPUT_BOUND: candidate generation is linear " +
        "(measured exponent 0.54 sf3->sf10), but the PAIR OUTPUT is the " +
        "same quadratic planted set as the exact twin — ScaleGen replicates " +
        "embeddings as exact copies (NOTES_r16 §5); smaller segments can " +
        "read super-linear from output growth alone")),

    // Semantic dedup ORACLE-GATED through exact degradation (r13 VERDICT
    // #5 — the same move the ANN entries made): with nProbe = nLists every
    // vector probes every cell, so the cell equi-join's candidate set is
    // ALL pairs and the operator's output — probes, cell join, exact
    // in-cell L2, least/greatest normalization, cross-direction dedup —
    // must equal the brute-force threshold pairs INDEPENDENT of the
    // trained coarse/PQ codebooks. DuckDB recomputes the pairs with the
    // bit-identical sequential fold. Corpus bounded to vec_id < CN (the
    // ORIGINAL vectors at every SF — ScaleGen shifts replica ids) so the
    // all-pairs oracle stays cheap while the full pipeline is exercised;
    // the full-corpus capped twin above stays rows-only, its pruning
    // benefit spec-gated (ScalableDedupSpec recall ≥ the LSH path).
    QueryDef(
      "d_semantic_ivfpq_exact",
      (s, dir) =>
        graft.operators.ScalableDedup.embeddingNearDupsIvfPq(
            graft.sources.Tables.embeddings(s, dir)
              .select("vec_id", "embedding").filter(col("vec_id") < CN),
            dim = 64, maxSqDistance = 1.25, nLists = 16, nProbe = 16)
          .orderBy("v1", "v2"),
      Some(s"""WITH sub AS (
              |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $CN),
              |l2 AS (
              |  SELECT a.vec_id AS v1, b.vec_id AS v2,
              |    ${sqlFoldSum("list_transform(list_zip(a.embedding, b.embedding), " +
                   "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
                   "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))")} AS dist
              |  FROM sub a JOIN sub b ON a.vec_id < b.vec_id)
              |SELECT v1, v2, dist FROM l2 WHERE dist <= 1.25
              |ORDER BY v1, v2""".stripMargin),
      scaleNote = Some("OUTPUT_BOUND: exact all-pairs twin of the semantic " +
        "dedup (the oracle for the IVF-PQ path) — planted near-dup pairs " +
        "grow quadratically because ScaleGen replicates embeddings as " +
        "exact copies (NOTES_r16 §5); the output IS that pair set")),

    // CONTAINMENT audit for the capped semantic twin (r14 VERDICT #6): the
    // production-config run (default nProbe — the pruning the rows-only
    // d_semantic_ivfpq exercises) restricted to the CN corpus must be a
    // SUBSET of the exact threshold pairs: the operator verifies every
    // candidate with exact in-cell L2, so codebook randomness may lose
    // pairs but can never invent one. The row hash-gates BOTH the subset
    // invariant (n_subset_violations = 0) and a quantity DuckDB derives
    // independently (n_exact_pairs via the bit-identical sequential fold)
    // so the audit cannot go green by accident. The capped twin's own
    // estimate columns stay rows-only.
    QueryDef(
      "d_semantic_subset_audit",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding").filter(col("vec_id") < CN)
        val capped = graft.operators.ScalableDedup.embeddingNearDupsIvfPq(
          vecs, dim = 64, maxSqDistance = 1.25) // default (capped) nProbe
        val l2 = foldSum("zip_with(e1, e2, (x, y) -> " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
          "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))")
        val a = vecs.select(col("vec_id").as("v1"), col("embedding").as("e1"))
        val b = vecs.select(col("vec_id").as("v2"), col("embedding").as("e2"))
        val exact = broadcast(a).join(b, col("v1") < col("v2"))
          .withColumn("dist", expr(l2))
          .filter(col("dist") <= 1.25)
          .select("v1", "v2")
        val violations = capped.select("v1", "v2")
          .join(exact, Seq("v1", "v2"), "left_anti")
        exact.agg(count(lit(1)).as("n_exact_pairs")).crossJoin(
          violations.agg(count(lit(1)).as("n_subset_violations")))
      },
      Some(s"""WITH sub AS (
              |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $CN),
              |l2 AS (
              |  SELECT a.vec_id AS v1, b.vec_id AS v2,
              |    ${sqlFoldSum("list_transform(list_zip(a.embedding, b.embedding), " +
                   "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
                   "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))")} AS dist
              |  FROM sub a JOIN sub b ON a.vec_id < b.vec_id)
              |SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
              |       CAST(0 AS BIGINT) AS n_subset_violations
              |FROM l2 WHERE dist <= 1.25""".stripMargin),
      scaleNote = Some("OUTPUT_BOUND: subset audit — re-verifies the " +
        "quadratic planted pair set of d_semantic_ivfpq_exact (its exact " +
        "all-pairs reference join is the cost), so its exponent tracks " +
        "that output growth by construction")),

    // RECALL-FLOOR audit for the capped ANN twin (r14 VERDICT #6): per
    // query vector, the production-config IVF-PQ search (kNN=5, nProbe=4 —
    // the rows-only s_ivfpq_knn's exact shape) must recover at least
    // RecallFloorHits of the brute-force L2 top-5 (Ivf.bruteForce — the
    // same ranking rule, self excluded). The oracle derives the gated
    // row set (one row per query, meets_floor TRUE) independently, so a
    // single query dipping below the floor at ANY scale factor turns the
    // row red. The recall VALUE itself stays a rows-only estimate on the
    // capped twin; this row pins the guarantee.
    QueryDef(
      "s_ivfpq_recall",
      (s, dir) => {
        val vecs = graft.sources.Tables.embeddings(s, dir)
          .select("vec_id", "embedding")
        val queries = vecs.filter(col("vec_id") < 20)
        val idx = graft.operators.IvfPq.build(vecs, dim = 64)
        val ann = graft.operators.IvfPq.search(idx, queries, kNN = 5,
            nProbe = 4)
          .select("q_id", "vec_id")
          .localCheckpoint(true) // pin-then-free, as s_ivfpq_knn
        idx.unpersist()
        val brute = graft.operators.Ivf.bruteForce(vecs, queries, k = 5)
          .select("q_id", "vec_id")
        val hits = ann.join(brute, Seq("q_id", "vec_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
        queries.select(col("vec_id").as("q_id")).join(hits, Seq("q_id"), "left")
          .select(col("q_id"),
            (coalesce(col("n_hits"), lit(0L)) >= RecallFloorHits).as("meets_floor"))
          .orderBy("q_id")
      },
      Some("""SELECT vec_id AS q_id, TRUE AS meets_floor
             |FROM embeddings WHERE vec_id < 20 ORDER BY q_id""".stripMargin)),
  )

  /** Per-query recall floor for [[s_ivfpq_recall]]: hits of 5 the capped
    * search must recover from the brute top-5. Pinned at the MEASURED
    * worst case — sf0.01 per-query hits are {2..5} (mean recall 0.77,
    * min exactly 2; sf1 is 5/5 across the board because ScaleGen replicas
    * sharpen the cells) — so any future recall regression on any single
    * query turns the row red while the audit stays deterministic
    * (seeded KMeans). */
  private val RecallFloorHits = 2L
}
