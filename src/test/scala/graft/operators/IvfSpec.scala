package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .filter(col("vec_id") < 300)

  test("probing ALL cells reproduces brute force exactly") {
    val idx = Ivf.build(corpus, nLists = 8)
    val queries = corpus.filter(col("vec_id") < 3)
    val ivf = Ivf.search(idx, queries, k = 5, nProbe = 8)
    val brute = Ivf.bruteForce(corpus, queries, k = 5)
    assert(ivf.count() === brute.count())
    assert(ivf.except(brute).count() === 0)
  }

  test("nProbe=2 keeps high recall on clustered data and bounds the work") {
    val idx = Ivf.build(corpus, nLists = 8)
    val queries = corpus.filter(col("vec_id") < 10)
    val ivf = Ivf.search(idx, queries, k = 5, nProbe = 2)
      .select("q_id", "vec_id")
    val brute = Ivf.bruteForce(corpus, queries, k = 5)
      .select("q_id", "vec_id")
    val hit = ivf.intersect(brute).count().toDouble
    val recall = hit / brute.count()
    assert(ivf.groupBy("q_id").count().agg(max("count")).head().getLong(0) <= 5)
    assert(recall >= 0.5, s"recall $recall too low for clustered corpus")
  }

  test("every vector lands in exactly one cell") {
    val idx = Ivf.build(corpus, nLists = 8)
    assert(idx.assigned.count() === corpus.count())
    assert(idx.assigned.select("cell").distinct().count() <= 8)
    assert(idx.assigned.filter(col("cell").isNull).count() === 0)
  }
}
