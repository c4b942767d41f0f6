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
