package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingNearDedupSpec extends SparkSpec {

  import StreamingNearDedup.Doc

  // long enough to shingle richly; the suffix perturbs only a small fraction
  private val baseA = "the quick brown fox jumps over the lazy dog while the " +
    "band plays a slow waltz under bright paper lanterns in the old town square"
  private val baseD = "seven silver ships sail slowly past the sleeping harbor " +
    "carrying crates of oranges tea and woven baskets toward the northern delta"

  test("ingestBatch releases its checkpoints — block count is flat across batches") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_leak").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    // settle once (first batch also creates the store), then measure
    StreamingNearDedup.ingestBatch(Seq(Doc(0L, baseA)).toDF(), store, corpus)
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 5).foreach { i =>
      StreamingNearDedup.ingestBatch(
        Seq(Doc(i.toLong * 10, s"$baseD round $i unique suffix tokens " +
          s"alpha$i beta$i gamma$i")).toDF(), store, corpus)
    }
    // a long-lived stream checkpoints 4 frames per micro-batch; without the
    // per-batch release the count would grow by ~4×5 here and unboundedly in
    // production (ContextCleaner only runs on driver GC)
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "ingestBatch leaked localCheckpoint blocks across batches")
  }

  test("stream drops near-duplicates within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("sneardup").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"

    val input = MemoryStream[Doc]
    val q = StreamingNearDedup.start(input.toDF(), store, corpus, s"$base/ckpt")
    input.addData(
      Doc(1L, baseA),
      Doc(2L, "completely different text about compilers and parser theory " +
        "with long chains of tokens that share nothing with the others"))
    q.processAllAvailable()
    input.addData(
      Doc(3L, baseA + " zz11 zz22"), // near-dup of doc 1 (NOT exact) → drop
      Doc(4L, "fresh document on tidal pools limpets and barnacles clinging " +
        "to wet granite while gulls wheel overhead in the salt wind"), // keep
      Doc(5L, baseD), // keep (first of the in-batch pair)
      Doc(6L, baseD + " yy88 yy99")) // in-batch near-dup of 5 → drop
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(corpus)
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L, 5L),
      s"near-dups 3 (cross-batch) and 6 (in-batch) must be dropped, got $ids")
    // the store holds one band row per band per survivor
    assert(spark.read.parquet(store).count() ===
      4L * graft.operators.MinHash.NBands)

    // batch backfill shares the store: another near-dup of doc 1 is dropped,
    // a genuinely new doc is kept
    StreamingNearDedup.ingestBatch(
      Seq(Doc(7L, baseA + " ww77"),
        Doc(8L, "unrelated closing chapter where the detective finally " +
          "names the culprit over lukewarm coffee at the station")).toDF(),
      store, corpus)
    val ids2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids2 === Seq(1L, 2L, 4L, 5L, 8L))
  }

  test("exact duplicates are still dropped (signature similarity 1.0)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_ex").toString
    StreamingNearDedup.ingestBatch(
      Seq(Doc(1L, baseA), Doc(2L, baseA)).toDF(), // in-batch exact
      s"$base/store", s"$base/corpus")
    StreamingNearDedup.ingestBatch(
      Seq(Doc(3L, baseA)).toDF(), // cross-batch exact
      s"$base/store", s"$base/corpus")
    assert(spark.read.parquet(s"$base/corpus").count() === 1)
  }

  test("unshingleable short docs pass the near-dup gate but not the exact one") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_sh").toString
    StreamingNearDedup.ingestBatch(
      Seq(Doc(1L, "ab"), Doc(2L, "ab"), Doc(3L, "cd")).toDF(),
      s"$base/store", s"$base/corpus")
    val ids = spark.read.parquet(s"$base/corpus")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 3L))
    assert(spark.read.parquet(s"$base/store").count() === 0) // no signatures
  }

  test("a doc similar only to a store-dropped batch-mate is kept") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_tr").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    val x = "granite cliffs rise over the cold green bay where fishing boats " +
      "rock gently at anchor beneath wheeling white gulls"
    val a = x + " and the keeper waits"
    val b = a + " while the foghorn moans qq77 and nets dry on long racks by the shed"
    // measured: sim(a,x)=0.75 with 2 shared bands (a drops against the
    // store); sim(b,a)=0.58 with 1 shared band (b pairs with a in-batch);
    // sim(b,x)=0.33, 0 shared bands — b is similar ONLY to a, a batch-mate
    // that was itself dropped, not to anything actually ingested. b must be
    // kept: dropping it would leave it with no similar representative in
    // the corpus. (Texts are chosen so the qualifying pairs actually share
    // a full 3-component band — LSH candidates need a band collision, not
    // just high component agreement.)
    StreamingNearDedup.ingestBatch(Seq(Doc(1L, x)).toDF(), store, corpus)
    StreamingNearDedup.ingestBatch(
      Seq(Doc(2L, a), Doc(3L, b)).toDF(), store, corpus)
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(ids === Seq(1L, 3L),
      s"a (≈ stored x) drops, b (≈ only a) survives; got $ids")
  }

  test("in-batch transitive chain: A~B, B~C, A≁C keeps A and C (greedy keep-first)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_ch").toString
    val x = "granite cliffs rise over the cold green bay where fishing boats " +
      "rock gently at anchor beneath wheeling white gulls"
    val a = x + " and the keeper waits"
    val b = a + " while the foghorn moans qq77 and nets dry on long racks by the shed"
    // same measured similarities as the store-drop test: sim(x,a)=0.75,
    // sim(a,b)=0.58, sim(x,b)=0.33 — but here all three arrive in ONE batch
    // with an empty store. Greedy keep-first: 1 kept; 2 similar to kept 1 →
    // dropped; 3 similar only to DROPPED 2 → kept. Drop-d2-of-every-pair
    // would cascade pair (2,3) into dropping 3 despite 3 having no kept
    // similar representative.
    StreamingNearDedup.ingestBatch(
      Seq(Doc(1L, x), Doc(2L, a), Doc(3L, b)).toDF(),
      s"$base/store", s"$base/corpus")
    val ids = spark.read.parquet(s"$base/corpus").select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(ids === Seq(1L, 3L),
      s"chain must keep non-adjacent tail 3, drop only 2; got $ids")
  }

  test("crash between corpus and store writes loses nothing on replay") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_cr").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    val batch = Seq(Doc(1L, baseA)).toDF()

    // corpus append committed, store append lost — the only partial state
    // the corpus-first ordering allows
    StreamingNearDedup.ingestBatch(batch, store, corpus)
    val p = new org.apache.hadoop.fs.Path(store)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    // replay: the doc must re-append (recoverable duplicate), never vanish
    StreamingNearDedup.ingestBatch(batch, store, corpus)
    assert(spark.read.parquet(corpus).count() === 2)

    // crash-window duplicates are exact → the exact-hash compaction closes
    // the loop (store is rebuilt separately; corpus is what matters).
    // compactCorpus swaps the store via safeReplace, which needs the
    // target to exist — seed an empty one as a fresh pipeline would have.
    Seq.empty[String].toDF("h").write.parquet(s"$base/exact_store")
    val dropped = StreamingDedup.compactCorpus(spark, s"$base/exact_store", corpus)
    assert(dropped === 1)
    assert(spark.read.parquet(corpus).count() === 1)
  }

  test("band store records signature version; mismatch and absence fail loudly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sneardup_ver").toString
    val store = s"$base/store"
    val corpus = s"$base/corpus"
    StreamingNearDedup.ingestBatch(Seq(Doc(1L, baseA)).toDF(), store, corpus)

    // marker written beside the band rows, holding the current constants
    val markerPath = new org.apache.hadoop.fs.Path(store, "_graft_sig_version")
    val fs = markerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(markerPath))
    val in = fs.open(markerPath)
    val recorded = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
    assert(recorded === graft.operators.MinHash.version)

    // same-version re-ingest works (the normal path)
    StreamingNearDedup.ingestBatch(Seq(Doc(2L, baseD)).toDF(), store, corpus)
    assert(spark.read.parquet(corpus).count() === 2)

    // a store written under OTHER constants must be rejected, not silently
    // mismatched (old signatures never equal new ones → near-dups re-admitted)
    val out = fs.create(markerPath, true)
    out.write("minhash/0 K=12 nbands=4 shingle=5 mod=2147483647 perm=deadbeef0000"
      .getBytes("UTF-8")); out.close()
    val eMismatch = intercept[IllegalStateException] {
      StreamingNearDedup.ingestBatch(Seq(Doc(3L, baseA + " xx")).toDF(), store, corpus)
    }
    assert(eMismatch.getMessage.contains("rebuild the store"))

    // an unmarked store (pre-versioning, or torn first append) is also fatal
    fs.delete(markerPath, false)
    val eMissing = intercept[IllegalStateException] {
      StreamingNearDedup.ingestBatch(Seq(Doc(4L, baseD + " yy")).toDF(), store, corpus)
    }
    assert(eMissing.getMessage.contains("_graft_sig_version"))

    // neither failed attempt may have touched the corpus
    assert(spark.read.parquet(corpus).count() === 2)
  }
}
