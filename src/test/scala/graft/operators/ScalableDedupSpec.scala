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
}
