package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val vecs = Tables.embeddings(spark, dir).select("vec_id", "embedding").cache()
  private lazy val cb = Pq.train(vecs, dim = 64, m = 16, k = 16)

  test("codebooks have the declared shape") {
    assert(cb.cents.size === 16)
    assert(cb.cents.forall(_.size === 16))
    assert(cb.cents.forall(_.forall(_.size === 4)))
  }

  test("encode emits one code per subspace, all within [0, k)") {
    val enc = Pq.encode(vecs, cb)
    val stats = enc.select(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      min(array_min(col("codes"))).as("lo"), max(array_max(col("codes"))).as("hi"))
      .head()
    assert(stats.getInt(0) === 16 && stats.getInt(1) === 16)
    assert(stats.getInt(2) >= 0 && stats.getInt(3) < 16)
  }

  test("encode assigns each subvector to its nearest centroid") {
    // independent check on one row: recompute argmin in Scala
    val row = Pq.encode(vecs, cb).select("embedding", "codes")
      .filter(col("vec_id") === 7).head()
    val emb = row.getSeq[Float](0).map(_.toDouble)
    val codes = row.getSeq[Int](1)
    for (j <- 0 until 16) {
      val sub = emb.slice(j * 4, j * 4 + 4)
      val dists = cb.cents(j).map(c =>
        sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(codes(j) === dists.indexOf(dists.min))
    }
  }

  test("encode fails loudly on a dim-mismatched vector") {
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.encode(bad, cb).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("PQ encode")),
      s"expected the dim-mismatch error, got: ${ex.getMessage}")
  }

  test("search fails loudly on a dim-mismatched query vector") {
    import spark.implicits._
    val enc = Pq.encode(vecs, cb)
    val badQ = Seq((9999L, Seq.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pq.search(enc, badQ, cb, k = 3, shortlist = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("PQ query")),
      s"expected the query-dim error, got: ${ex.getMessage}")
  }

  test("ADC + exact re-rank reaches high recall vs brute force") {
    val queries = vecs.filter(col("vec_id") < 10)
    val enc = Pq.encode(vecs, cb)
    val got = Pq.search(enc, queries, cb, k = 10, shortlist = 64)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = Ivf.bruteForce(vecs, queries, k = 10)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 $mean below 0.8 (per-query: $recalls)")
    // re-ranked distances are exact: every returned distance must equal the
    // brute-force distance for that (q, vec) pair
    val bf = Ivf.bruteForce(vecs, queries, k = 10)
      .select(col("q_id"), col("vec_id"), col("l2_dist").as("bf_dist"))
    val joined = Pq.search(enc, queries, cb, k = 10, shortlist = 64)
      .join(bf, Seq("q_id", "vec_id"))
      .filter(abs(col("l2_dist") - col("bf_dist")) > 1e-12)
    assert(joined.count() === 0)
  }

  test("search plan: ADC scan sees codes only, full vectors enter post-shortlist") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val enc = Pq.encode(vecs, cb).cache()
    enc.count()
    val df = Pq.search(enc, vecs.filter(col("vec_id") < 3), cb, k = 5, shortlist = 16)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // the only theta-shaped join is the ADC scan (broadcast queries × codes);
    // its corpus (streamed) side must project exactly (vec_id, codes) — a
    // full `embedding` column here would reintroduce per-corpus-row D-float
    // work, the regression this operator exists to avoid
    val bnl = plan.collectWithSubqueries { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnl.size === 1, s"expected exactly the ADC join, got ${bnl.size}")
    val j = bnl.head
    val streamedSide = (j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
    }).output.map(_.name).toSet
    assert(streamedSide === Set("vec_id", "codes"),
      s"ADC corpus side must be code-only, saw $streamedSide")
  }
}
