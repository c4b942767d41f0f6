package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalableDedupSpec extends SparkSpec {

  test("minhashNearDups finds planted text near-duplicates") {
    import spark.implicits._
    // each base doc is a mostly-unique token stream (low cross-doc Jaccard)
    val base = (0 until 20).map(i =>
      (i.toLong, (0 until 15).map(j => s"tok${i}x$j").mkString(" ")))
    // plant: 100 and 101 are near-copies of docs 0 and 1
    val docs = (base ++ Seq(
      (100L, base(0)._2 + " extra"),
      (101L, base(1)._2 + " tail"))).toDF("doc_id", "text")
    val pairs = ScalableDedup.minhashNearDups(docs, maxDistance = 0.5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)))
    assert(pairs.contains((1L, 101L)))
    // unrelated docs don't pair up
    assert(!pairs.contains((2L, 3L)))
  }

  test("embeddingNearDups finds close vectors, skips far ones") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f, 0.0f, 0.0f)),   // close to 0
      (2L, Array(10.0f, 10.0f, 10.0f, 10.0f)),
      (3L, Array(10.0f, 10.1f, 10.0f, 10.0f)) // close to 2
    ).toDF("vec_id", "embedding")
    val pairs = ScalableDedup.embeddingNearDups(vecs, maxDistance = 1.0)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L), (2L, 3L)))
  }

  /** Planted near-dup corpus: 48 seeded base vectors in 8-dim, the last 8
    * duplicated with tiny noise. Returns (vecs, plantedPairs). */
  private def planted: (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 48).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 8).map { j =>
      val (origId, v) = base(40 + j)
      (100L + j, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat), origId)
    }
    val vecs = (base ++ dups.map(d => (d._1, d._2))).toDF("vec_id", "embedding")
    (vecs, dups.map(d => (d._3, d._1)).toSet)
  }

  test("embeddingNearDupsIvfPq: cell-pruned candidates reach recall >= the LSH path") {
    import spark.implicits._
    val (vecs, plantedPairs) = planted
    // same effective threshold: IVF-PQ path takes L2 SQUARED, LSH takes L2
    val ivf = ScalableDedup.embeddingNearDupsIvfPq(vecs, dim = 8,
        maxSqDistance = 0.25, nLists = 4, nProbe = 2, m = 4, k = 4)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val lsh = ScalableDedup.embeddingNearDups(vecs, maxDistance = 0.5)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val ivfRecall = plantedPairs.count(ivf.contains).toDouble / plantedPairs.size
    val lshRecall = plantedPairs.count(lsh.contains).toDouble / plantedPairs.size
    assert(ivfRecall >= lshRecall,
      s"IVF-PQ recall $ivfRecall below LSH recall $lshRecall")
    assert(ivfRecall >= 0.9, s"planted near-dups missed: recall $ivfRecall")
    // near-identical vectors are the ONLY pairs within the threshold here
    assert(ivf.forall(p => plantedPairs.contains(p)),
      s"false pairs: ${ivf.diff(plantedPairs)}")
  }

  test("embeddingNearDupsIvfPq plan: candidates via cell equi-join, not cross join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val (vecs, _) = planted
    val idx = IvfPq.build(vecs, dim = 8, nLists = 4, m = 4, k = 4)
    val df = ScalableDedup.ivfPqCandidatePairs(vecs, idx, nProbe = 2,
      maxSqDistance = 0.25)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    // only the bounded query×centroid probe pick may be non-equi; the
    // candidate scan (the side carrying corpus vec_id + embedding) must be
    // reached by the equi-join on cell
    val onCorpus = bad.filter(_.output.exists(_.name == "dist"))
    assert(onCorpus.isEmpty,
      s"candidate scan must be an equi-join on cell, found: ${onCorpus.map(_.nodeName)}")
    idx.unpersist()
  }
}
