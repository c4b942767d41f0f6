package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val vecs =
    Tables.embeddings(spark, dir).select("vec_id", "embedding").cache()
  private lazy val idx = IvfPq.build(vecs, dim = 64, nLists = 16, m = 16, k = 16)

  test("every vector is encoded exactly once, with its cell and m codes") {
    val n = vecs.count()
    assert(idx.encoded.count() === n)
    assert(idx.encoded.select("vec_id").distinct().count() === n)
    val shape = idx.encoded.select(
      min(size(col("codes"))).as("mn"), max(size(col("codes"))).as("mx"),
      min("cell").as("cmin"), max("cell").as("cmax")).head()
    assert(shape.getInt(0) === 16 && shape.getInt(1) === 16)
    assert(shape.getInt(2) >= 0 && shape.getInt(3) < 16)
  }

  test("probing ALL cells with a huge shortlist reproduces brute force exactly") {
    // with no pruning and full re-rank coverage the composed index must
    // degrade to exact search — the correctness anchor for the whole path
    val queries = vecs.filter(col("vec_id") < 5)
    val got = IvfPq.search(idx, queries, kNN = 10, nProbe = 16, shortlist = 499)
      .select("q_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val bf = Ivf.bruteForce(vecs, queries, k = 10)
      .select("q_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === bf)
  }

  test("nProbe=4 pruned search keeps high recall vs brute force") {
    val queries = vecs.filter(col("vec_id") < 10)
    val got = IvfPq.search(idx, queries, kNN = 10, nProbe = 4, shortlist = 64)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val truth = Ivf.bruteForce(vecs, queries, k = 10)
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@10 $mean below 0.6 (per-query: $recalls)")
  }

  test("returned distances are exact (re-ranked), not ADC approximations") {
    val queries = vecs.filter(col("vec_id") < 5)
    val bf = Ivf.bruteForce(vecs, queries, k = 10)
      .select(col("q_id"), col("vec_id"), col("l2_dist").as("bf_dist"))
    val bad = IvfPq.search(idx, queries, kNN = 10, nProbe = 4, shortlist = 64)
      .join(bf, Seq("q_id", "vec_id"))
      .filter(abs(col("l2_dist") - col("bf_dist")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("search fails loudly on a dim-mismatched query (zip_with pads, guard must not)") {
    import spark.implicits._
    val badQ = Seq((9999L, Seq.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      IvfPq.search(idx, badQ, kNN = 3, nProbe = 2, shortlist = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("PQ query")),
      s"expected the query-dim error, got: ${ex.getMessage}")
  }

  test("plan: corpus codes reached by an equi-join on cell, never a cross join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = IvfPq.search(idx, vecs.filter(col("vec_id") < 3), kNN = 5,
      nProbe = 4, shortlist = 16)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    // the only allowed theta shape is the broadcast query×centroid probe
    // (bounded: |Q|×nLists); the CODE scan itself must be an equi-join
    val onCodes = bad.filter(_.output.exists(_.name == "codes"))
    assert(onCodes.isEmpty,
      s"code scan must be an equi-join on cell, found: ${onCodes.map(_.nodeName)}")
  }
}
