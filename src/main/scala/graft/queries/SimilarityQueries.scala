package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-d): brute-force
  * cosine top-k (the correctness baseline) and a random-hyperplane LSH-bucketed
  * variant (the scale path).
  *
  * Exactness strategy: dot products and norms are computed by exploding (vec, dim)
  * pairs and summing per-element double products through DECIMAL(38,12) — order
  * independent, so cosine values are bit-identical to the DuckDB oracle built from
  * the same construction. The LSH hyperplanes are integer-arithmetic pseudo-random
  * (`((dim*31 + plane*17) % 7) - 3`), identical on both engines.
  *
  * Scale: brute-force is O(Q×N) — fine for a broadcast query set against a
  * partitioned corpus (each partition scores its shard, then a top-k merge). The LSH
  * variant buckets the corpus once (map-side signature) and only scores within the
  * query's bucket — the 100 TB path. The id-range caps here exist only to bound the
  * sf0.01 oracle; the plan shape is scale-free.
  */
object SimilarityQueries {

  private val D = 64 // embedding dimensionality
  private val QN = 5 // query vectors: vec_id < QN
  private val CN = 400 // candidate corpus: vec_id < CN

  /** (vec_id, dim 1-based, v as double) exploded view, vec_id < CN. */
  private def unnested(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < CN)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), (col("pos") + 1).as("dim"),
        col("v").cast("double").as("v"))

  private val sqlUnnested =
    s"""unn AS (
       |  SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(1, $D)) AS i) dims
       |  WHERE vec_id < $CN)""".stripMargin

  /** Exact-sum norms per vector. */
  private def norms(s: SparkSession, dir: String): DataFrame =
    unnested(s, dir).groupBy("vec_id")
      .agg(Exact.dsum12(col("v") * col("v")).as("nrm2"))

  private val sqlNorms =
    s"""nrm AS (
       |  SELECT vec_id, ${Exact.sqlDsum12("v * v")} AS nrm2
       |  FROM unn GROUP BY vec_id)""".stripMargin

  /** Pairwise cosine between query vecs (d1 < QN) and candidates (d1 < d2). */
  private def cosines(s: SparkSession, dir: String): DataFrame = {
    val u = unnested(s, dir)
    val q = u.filter(col("vec_id") < QN)
      .select(col("vec_id").as("d1"), col("dim"), col("v").as("v1"))
    val c = u.select(col("vec_id").as("d2"), col("dim"), col("v").as("v2"))
    val dots = q.join(c, Seq("dim")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(Exact.dsum12(col("v1") * col("v2")).as("dot"))
    val n = norms(s, dir)
    dots
      .join(n.select(col("vec_id").as("d1"), col("nrm2").as("nrm1")), Seq("d1"))
      .join(n.select(col("vec_id").as("d2"), col("nrm2").as("nrm2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        (col("dot") / (sqrt(col("nrm1")) * sqrt(col("nrm2")))).as("cos"))
  }

  private val sqlCosines =
    s"""$sqlUnnested,
       |$sqlNorms,
       |dots AS (
       |  SELECT q.vec_id AS d1, c.vec_id AS d2, ${Exact.sqlDsum12("q.v * c.v")} AS dot
       |  FROM unn q JOIN unn c ON q.dim = c.dim AND q.vec_id < c.vec_id
       |  WHERE q.vec_id < $QN
       |  GROUP BY q.vec_id, c.vec_id),
       |cosines AS (
       |  SELECT d1, d2, dot / (sqrt(n1.nrm2) * sqrt(n2.nrm2)) AS cos
       |  FROM dots
       |  JOIN nrm n1 ON n1.vec_id = d1
       |  JOIN nrm n2 ON n2.vec_id = d2)""".stripMargin

  /** LSH bucket id: 8 sign bits of dots with integer pseudo-random hyperplanes. */
  private def buckets(s: SparkSession, dir: String): DataFrame = {
    val planeDots = (0 until 8).map { j =>
      Exact.dsum12(col("v") * ((col("dim") * 31 + j * 17) % 7 - 3).cast("double"))
        .as(s"dot_$j")
    }
    unnested(s, dir)
      .groupBy("vec_id")
      .agg(planeDots.head, planeDots.tail: _*)
      .select(col("vec_id"),
        (0 until 8).map(j => when(col(s"dot_$j") >= 0.0, 1L << j).otherwise(0L))
          .reduce(_ + _).as("bucket"))
  }

  private val sqlBuckets =
    s"""$sqlUnnested,
       |pd AS (
       |  SELECT vec_id,
       |${(0 until 8).map(j =>
          s"    ${Exact.sqlDsum12(s"v * CAST((dim * 31 + $j * 17) % 7 - 3 AS DOUBLE)")} AS dot_$j")
          .mkString(",\n")}
       |  FROM unn GROUP BY vec_id),
       |buckets AS (
       |  SELECT vec_id,
       |    ${(0 until 8).map(j => s"(CASE WHEN dot_$j >= 0.0 THEN ${1L << j} ELSE 0 END)")
            .mkString(" + ")} AS bucket
       |  FROM pd)""".stripMargin

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

    // Embedding near-duplicate pairs: top-20 most-cosine-similar pairs among the
    // query set — the embedding-cosine dedup operator.
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

    // Bucketed ANN: candidates share the query's LSH bucket; exact cosine re-rank
    // inside the bucket only (the 100 TB search path).
    QueryDef(
      "s_lsh_knn",
      (s, dir) => {
        val b = buckets(s, dir)
        val withBuckets = cosines(s, dir)
          .join(b.select(col("vec_id").as("d1"), col("bucket").as("bk1")), Seq("d1"))
          .join(b.select(col("vec_id").as("d2"), col("bucket").as("bk2")), Seq("d2"))
          .filter(col("bk1") === col("bk2"))
        val w = Window.partitionBy("d1").orderBy(col("cos").desc, col("d2"))
        withBuckets
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select("d1", "rnk", "d2", "cos")
          .orderBy("d1", "rnk")
      },
      Some(s"""WITH $sqlCosines,
              |pd AS (
              |  SELECT vec_id,
              |${(0 until 8).map(j =>
                 s"    ${Exact.sqlDsum12(s"v * CAST((dim * 31 + $j * 17) % 7 - 3 AS DOUBLE)")} AS dot_$j")
                 .mkString(",\n")}
              |  FROM unn GROUP BY vec_id),
              |buckets AS (
              |  SELECT vec_id,
              |    ${(0 until 8).map(j => s"(CASE WHEN dot_$j >= 0.0 THEN ${1L << j} ELSE 0 END)")
                   .mkString(" + ")} AS bucket
              |  FROM pd)
              |SELECT d1, CAST(rnk AS INT) AS rnk, d2, cos FROM (
              |  SELECT c.d1, c.d2, c.cos,
              |    ROW_NUMBER() OVER (PARTITION BY c.d1 ORDER BY c.cos DESC, c.d2) AS rnk
              |  FROM cosines c
              |  JOIN buckets b1 ON b1.vec_id = c.d1
              |  JOIN buckets b2 ON b2.vec_id = c.d2
              |  WHERE b1.bucket = b2.bucket) WHERE rnk <= 5
              |ORDER BY d1, rnk""".stripMargin)),
  )
}
