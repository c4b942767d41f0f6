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

  /** larger planted corpus for the scale-tier recall gate (r15 ADVICE #4):
    * 480 base vectors + 80 near-copies, enough for the hierarchical route's
    * codebooks to be non-degenerate when forced on */
  private def plantedLarge: (org.apache.spark.sql.DataFrame, Set[(Long, Long)]) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = (0 until 480).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 80).map { j =>
      val (origId, v) = base(400 + j)
      (1000L + j, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat), origId)
    }
    val vecs = (base ++ dups.map(d => (d._1, d._2))).toDF("vec_id", "embedding")
    (vecs, dups.map(d => (d._3, d._1)).toSet)
  }

  test("hierarchical route: recall gate holds at a scaled tier (r15 ADVICE)") {
    import spark.implicits._
    val (vecs, plantedPairs) = plantedLarge
    // force the IMI route on this corpus (production threshold is 8192)
    val imi = ScalableDedup.embeddingNearDupsIvfPq(vecs, dim = 8,
        maxSqDistance = 0.25, hierarchicalMin = 1L)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val recall = plantedPairs.count(imi.contains).toDouble / plantedPairs.size
    assert(recall >= 0.9, s"planted near-dups missed at scale: recall $recall")
    // subset-exactness is structural (every candidate verified) — no false pair
    assert(imi.forall(p => plantedPairs.contains(p)),
      s"false pairs: ${imi.diff(plantedPairs)}")
    // and the small-corpus auto route (flat) finds the same planted pairs
    val flat = ScalableDedup.embeddingNearDupsIvfPq(vecs, dim = 8,
        maxSqDistance = 0.25, m = 4, k = 4)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val flatRecall = plantedPairs.count(flat.contains).toDouble / plantedPairs.size
    assert(recall >= flatRecall - 0.1,
      s"hierarchical recall $recall collapsed vs flat $flatRecall")
  }

  test("hierarchical route plan: candidates via cell equi-join, not cross join") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val (vecs, _) = plantedLarge
    val model = Imi.train(vecs, dim = 8, targetCells = 16)
    val withProbes = vecs.select(col("vec_id"), col("embedding"),
      Imi.probesUdf(model, 2)(col("embedding")).as("probes"))
    val df = ScalableDedup.imiPairs(withProbes, maxSqDistance = 0.25)
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bad.isEmpty,
      s"IMI candidates must be an equi-join on cell, found: ${bad.map(_.nodeName)}")
  }

  test("Imi.probesUdf: exact product-centroid ranking, assignment first") {
    import spark.implicits._
    val (vecs, _) = planted
    val model = Imi.train(vecs, dim = 8, targetCells = 9)
    val got = vecs.select(col("vec_id"),
        Imi.probesUdf(model, 3)(col("embedding")).as("probes"))
      .as[(Long, Seq[Long])].collect()
    val emb = vecs.as[(Long, Array[Float])].collect().toMap
    got.foreach { case (id, probes) =>
      val x = emb(id)
      val s = model.split
      // brute-force ranking over ALL k1×k2 product centroids in float math
      def d2(v: Array[Float], c: Array[Float], off: Int): Float = {
        var d = 0f
        c.indices.foreach { i => val t = v(off + i) - c(i); d += t * t }
        d
      }
      val all = (for {
        i <- model.cb1.indices
        j <- model.cb2.indices
      } yield (d2(x, model.cb1(i), 0) + d2(x, model.cb2(j), s),
        i.toLong * model.k2 + j)).sortBy(c => (c._1, c._2))
      assert(probes == all.take(3).map(_._2),
        s"vec $id: probes $probes != brute ${all.take(3)}")
    }
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
