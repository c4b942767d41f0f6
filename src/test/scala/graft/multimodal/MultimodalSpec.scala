package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("extractFeatures: schema, determinism, per-partition batching") {
    val assets = Multimodal.synthAssets(spark, 30)
    val feats = Multimodal.extractFeatures(assets, dims = 4)
    val rows = feats.orderBy("asset_id").collect()
    assert(rows.length === 30)
    assert(rows.forall(_.feature_vec.length === 4))
    assert(rows.forall(r => r.n_bytes > 0))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(assets, dims = 4)
      .orderBy("asset_id").collect()
    assert(rows.map(_.sha_prefix).toSeq === again.map(_.sha_prefix).toSeq)
    assert(rows.map(_.feature_vec.toSeq).toSeq === again.map(_.feature_vec.toSeq).toSeq)
  }

  test("withBlobMetadata: byte length and md5 via built-ins") {
    val df = Multimodal.synthAssets(spark, 5).toDF()
    val meta = Multimodal.withBlobMetadata(df).orderBy("asset_id").collect()
    assert(meta.forall(r => r.getAs[Long]("n_bytes") > 0))
    assert(meta.forall(r => r.getAs[String]("content_md5").length === 32))
    // n_bytes must equal the actual payload size
    val first = meta.head
    assert(first.getAs[Long]("n_bytes") ===
      first.getAs[Array[Byte]]("content").length.toLong)
  }

  test("resize: aspect-preserving metadata, no-op below bounds, smaller payload") {
    val assets = Multimodal.synthAssets(spark, 20)
    val resized = Multimodal.resize(assets, maxW = 32, maxH = 32)
      .orderBy("asset_id").collect()
    val orig = assets.orderBy("asset_id").collect()
    resized.zip(orig).foreach { case (r, o) =>
      assert(r.width <= 32 && r.height <= 32)
      if (o.width <= 32 && o.height <= 32) {
        assert(r.width === o.width && r.content.length === o.content.length)
      } else {
        // aspect ratio preserved within integer rounding
        val ar0 = o.width.toDouble / o.height
        val ar1 = r.width.toDouble / r.height
        assert(math.abs(ar0 - ar1) < 0.2, s"aspect $ar0 -> $ar1")
        assert(r.content.length <= o.content.length)
      }
    }
  }

  test("sampleFrames: one row per timestamp step, videos only") {
    val frames = Multimodal.sampleFrames(
      Multimodal.synthAssets(spark, 30), everyMs = 5000L)
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val videos = Multimodal.synthAssets(spark, 30)
      .filter(col("kind") === "video").collect()
    assert(byAsset.keySet === videos.map(_.asset_id).toSet)
    videos.foreach { v =>
      assert(byAsset(v.asset_id) === v.duration_ms / 5000L + 1)
    }
    // frame numbers are dense 0..n-1 with aligned timestamps
    val f0 = frames.filter(col("asset_id") === videos.head.asset_id)
      .orderBy("frame_no").collect()
    assert(f0.map(_.frame_no).toSeq === (0 until f0.length))
    assert(f0.forall(r => r.ts_ms === r.frame_no * 5000L))
  }

  test("blob tables round-trip parquet with binary columns intact") {
    val path = java.nio.file.Files.createTempDirectory("mmtest").toString + "/assets"
    Multimodal.synthAssets(spark, 10).write.parquet(path)
    val back = spark.read.schema(Multimodal.assetSchema).parquet(path)
    assert(back.count() === 10)
    val joined = back.select(col("asset_id"), md5(col("content")).as("h"))
      .join(Multimodal.withBlobMetadata(Multimodal.synthAssets(spark, 10).toDF())
        .select(col("asset_id"), col("content_md5")), Seq("asset_id"))
    assert(joined.filter(col("h") =!= col("content_md5")).count() === 0)
  }
}
