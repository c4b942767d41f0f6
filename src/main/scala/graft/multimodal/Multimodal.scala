package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode→feature-extract stage whose Spark-side
  * plumbing (schema, batching, partitioning) is real while the codec itself is
  * a deterministic stub (no image/audio libraries in this container — the stub
  * derives pseudo-features from the bytes so the pipeline is testable
  * end-to-end; swap `StubCodec.decode` for a real decoder binding).
  *
  * Scale notes: media blobs ride in the same parquet row group as their
  * metadata (self-describing shards, no sidecar fetch); feature extraction is
  * `mapPartitions` so a real decoder amortizes model/codec init once per
  * partition, the same shape a Pandas-UDF/`mapInPandas` stage has in PySpark.
  * Blob-heavy tables should set a smaller `spark.sql.files.maxPartitionBytes`
  * so one task's batch fits executor memory.
  */
object Multimodal {

  /** Typed media asset row: the schema contract for multimodal tables. */
  final case class Asset(
      asset_id: Long, kind: String, mime: String, width: Int, height: Int,
      duration_ms: Long, content: Array[Byte])

  final case class MediaFeatures(
      asset_id: Long, kind: String, n_bytes: Long, sha_prefix: String,
      mean_byte: Double, feature_vec: Array[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("content", BinaryType)))

  /** Deterministic stand-in for the real decode step (STUB — see class doc).
    * A real implementation decodes pixels/samples here; everything around it
    * (batching, schema, shuffle shape) is unchanged when it lands. */
  object StubCodec {
    def decode(content: Array[Byte], dims: Int = 8): Array[Float] = {
      val out = new Array[Float](dims)
      var i = 0
      while (i < content.length) {
        out(i % dims) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      out.map(v => if (content.isEmpty) 0.0f else v / content.length * dims)
    }
  }

  /** Decode + feature-extract via mapPartitions (codec init once per
    * partition, not per row). */
  def extractFeatures(assets: Dataset[Asset], dims: Int = 8): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      // real codecs initialize here (per-partition), e.g. decoder contexts
      rows.map { a =>
        val bytes = if (a.content == null) Array.empty[Byte] else a.content
        MediaFeatures(
          a.asset_id, a.kind, bytes.length.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).take(4).map("%02x".format(_)).mkString,
          if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length,
          StubCodec.decode(bytes, dims))
      }
    }
  }

  /** Column-level variants for DataFrame pipelines: byte length, MD5, and a
    * truncated preview — pure built-ins, no UDF. */
  def withBlobMetadata(df: DataFrame, blobCol: String = "content"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(blobCol)).cast("long"))
      .withColumn("content_md5", md5(col(blobCol)))
      .withColumn("head_hex", hex(expr(s"substring($blobCol, 1, 8)")))

  /** Resize: metadata transforms are real (new dims, aspect-preserving
    * option); the pixel work is the stub (a real impl decodes, scales, and
    * re-encodes `content` here — same row shape in, same out). */
  def resize(assets: Dataset[Asset], maxW: Int, maxH: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      rows.map { a =>
        if (a.width <= maxW && a.height <= maxH) a
        else {
          val scale = math.min(maxW.toDouble / a.width, maxH.toDouble / a.height)
          val (w, h) = (math.max(1, (a.width * scale).toInt),
            math.max(1, (a.height * scale).toInt))
          // STUB pixel path: truncate bytes proportionally to the area ratio
          val keep = math.max(1,
            (a.content.length * (w.toLong * h) / (a.width.toLong * a.height)).toInt)
          a.copy(width = w, height = h, content = a.content.take(keep))
        }
      }
    }
  }

  final case class Frame(asset_id: Long, frame_no: Int, ts_ms: Long,
      frame: Array[Byte])

  /** Frame sampling: one output row per sampled timestamp — the UDTF-shaped
    * (1 → N rows) expansion done relationally: `sequence` + `explode` build
    * the timestamp grid, so Catalyst controls the expansion and the only
    * per-frame custom work is the (stubbed) frame grab. Partitioning follows
    * the parent rows; a real decoder seeks per `ts_ms` inside mapPartitions.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    val exploded = assets.filter(col("kind") === "video")
      .filter(col("duration_ms") >= 0)
      .select(col("asset_id"), col("content"),
        posexplode(sequence(lit(0L), col("duration_ms"), lit(everyMs)))
          .as(Seq("frame_no", "ts_ms")))
    exploded.as[(Long, Array[Byte], Int, Long)].map { case (id, content, no, ts) =>
      // STUB frame grab: a real codec seeks to ts and decodes one frame
      val start = if (content.isEmpty) 0 else (no * 7) % content.length
      Frame(id, no, ts, content.slice(start, math.min(start + 16, content.length)))
    }
  }

  /** Synthetic asset table (text bytes as stand-in blobs) — deterministic. */
  def synthAssets(spark: SparkSession, n: Int = 100): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].map { i =>
      val kind = Seq("image", "audio", "video")(math.abs(i % 3).toInt)
      val payload = (s"blob-$i-" * (math.abs(i % 7).toInt + 1)).getBytes("UTF-8")
      Asset(i, kind, s"application/x-$kind", 64 + (i % 9).toInt, 64,
        1000L * (i % 30), payload)
    }
  }
}
