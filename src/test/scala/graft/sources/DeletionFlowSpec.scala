package graft.sources

import graft.SparkSpec
import graft.operators.{Ivf, IvfPq, MinHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** **Deletion propagation end-to-end** (the right-to-be-forgotten path a
  * training-data pipeline owes its corpus): one delete request must leave
  * EVERY derived artifact — the lake table, the ANN index, the dedup
  * fingerprint store, and the maintained view — with nothing stale served:
  *
  *  - corpus:     [[Lake.deleteByKey]] (staged-swap rewrite)
  *  - ANN index:  [[IvfPq.deleteVectors]] (tombstones now, purge at compact)
  *  - dedup store: [[Lake.deleteByKey]] on the persisted signature table
  *  - view:       [[MaterializedAgg.rebase]] (refresh correctly REFUSES a
  *                rewritten base — the rebase is the documented repair)
  */
class DeletionFlowSpec extends SparkSpec {

  private def emb(i: Long): Array[Float] =
    (0 until 8).map(j => (((i * 31 + j * 17) % 97).toFloat / 97.0f)).toArray

  test("one delete sweeps corpus, ANN index, dedup store, and view — nothing stale") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("delflow").toString
    val corpus = s"$root/corpus"
    val ixPath = s"$root/ann"
    val store = s"$root/sigs"
    val view = s"$root/view"

    // 60 docs over 4 categories, texts long enough to shingle
    val docs = (0L until 60L).map(i =>
      (i, s"document number $i keeps some shared boilerplate text alive " +
        s"plus unique tail ${i * 7919}", s"cat${i % 4}", i * 0.25))
      .toDF("doc_id", "text", "cat", "score")
    docs.write.parquet(corpus)

    // derived artifacts
    val vecs = (0L until 60L).map(i => (i, emb(i)))
      .toDF("vec_id", "embedding")
    IvfPq.writeIndex(IvfPq.build(vecs, dim = 8, nLists = 4, m = 4, k = 4),
      ixPath)
    MinHash.signatures(spark.read.parquet(corpus)).write.parquet(store)
    MaterializedAgg.create(spark, corpus, view,
      MaterializedAgg.Spec(Seq("cat"), sumCols = Seq("score")))

    // ---- the delete request -------------------------------------------
    val gone = Seq(3L, 17L, 42L)
    val deletes = gone.toDF("doc_id")

    Lake.deleteByKey(spark, corpus, deletes, Seq("doc_id"))
    IvfPq.deleteVectors(spark, ixPath, deletes.select(col("doc_id").as("vec_id")))
    Lake.deleteByKey(spark, store, deletes, Seq("doc_id"))
    // the view's base was rewritten: incremental refresh must refuse, and
    // rebase is the repair that recomputes under the view's identity
    intercept[Exception] { MaterializedAgg.refresh(spark, view) }
    MaterializedAgg.rebase(spark, view)

    // ---- nothing stale anywhere ---------------------------------------
    // corpus
    val liveDocs = spark.read.parquet(corpus)
    assert(liveDocs.filter(col("doc_id").isInCollection(gone)).count() === 0)
    assert(liveDocs.count() === 57)

    // ANN: full-probe search from the reopened index equals brute force on
    // the SURVIVING vectors, and never serves a deleted id
    val survivors = vecs.filter(!col("vec_id").isInCollection(gone))
    val queries = vecs.filter(col("vec_id").isin(0L, 20L, 55L))
    val got = IvfPq.search(IvfPq.readIndex(spark, ixPath), queries,
        kNN = 5, nProbe = 4, shortlist = 499, pruneCellScan = true)
      .select("q_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val bf = Ivf.bruteForce(survivors, queries, k = 5)
      .select("q_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === bf, "post-delete ANN must equal brute force on survivors")
    assert(!got.values.exists(gone.contains))

    // dedup store: the fingerprints are gone, so no LSH candidate pair can
    // ever resurface a deleted doc
    val liveSigs = spark.read.parquet(store)
    assert(liveSigs.filter(col("doc_id").isInCollection(gone)).count() === 0)
    assert(MinHash.bands(liveSigs)
      .filter(col("doc_id").isInCollection(gone)).count() === 0)

    // view: rebased state equals a one-shot recompute over survivors
    val want = liveDocs.groupBy("cat").agg(
      count(lit(1)).as("cnt"),
      sum(col("score").cast(graft.queries.Exact.dt)).cast("double")
        .as("sum_score"),
      (sum(col("score").cast(graft.queries.Exact.dt)).cast("double") /
        count(col("score"))).as("avg_score"))
    assert(MaterializedAgg.read(spark, view).collect().map(_.toString).toSet ===
      want.collect().map(_.toString).toSet,
      "rebased view must aggregate exactly the surviving corpus")

    // and maintenance RESUMES incrementally after the repair
    Seq((100L, "fresh appended document body with plenty of text",
      "cat0", 9.0)).toDF("doc_id", "text", "cat", "score")
      .write.mode("append").parquet(corpus)
    MaterializedAgg.refresh(spark, view)
    assert(MaterializedAgg.read(spark, view)
      .filter(col("cat") === "cat0").head().getAs[Long]("cnt") === 16L)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
