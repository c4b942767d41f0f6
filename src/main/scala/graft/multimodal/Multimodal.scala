package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a decode→feature-extract stage. IMAGE decode is
  * REAL — JDK `javax.imageio` (PNG/JPEG/GIF/BMP, zero extra dependencies)
  * via [[ImageCodec]]: true dimensions, per-channel means, a luminance
  * histogram, and pixel-scaled resize with PNG re-encode. AUDIO decode is
  * REAL for PCM — JDK `javax.sound.sampled` (WAV/AIFF) via [[AudioCodec]]:
  * mono-mixed samples, RMS / zero-crossing / peak + energy-envelope
  * features. VIDEO frame decode is REAL for animated GIF and MJPEG-in-AVI
  * ([[VideoFrames]]: multi-frame `javax.imageio` compositing + RIFF walk);
  * only codec-compressed video/audio (H.264/HEVC, MP3/AAC) remains a
  * deterministic stub ([[StubCodec]] — the JDK ships no such codec; the
  * stub derives pseudo-features from the bytes so that pipeline stays
  * testable end-to-end until a codec binding lands).
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
      mean_byte: Double, decoded_w: Int, decoded_h: Int,
      feature_vec: Array[Float],
      /** LOUD provenance for every feature row (r17 verdict #6): "real"
        * when a genuine codec produced `feature_vec` (imageio pixels, PCM
        * samples), "stub" when the deterministic byte-fold stand-in did
        * (codec-compressed video/audio — no JDK codec exists). Downstream
        * consumers filter on this instead of silently training on stub
        * features. */
      decode_status: String)

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("content", BinaryType)))

  /** Real image decode via JDK `javax.imageio` — no external dependencies.
    * Deterministic: PNG/GIF/BMP decode is lossless and bit-exact;
    * feature math is fixed-order integer/double arithmetic.
    */
  object ImageCodec {

    /** Packed ARGB pixels row-major, as `BufferedImage.getRGB` returns. */
    final case class Decoded(width: Int, height: Int, hasAlpha: Boolean,
        argb: Array[Int])

    /** None when the bytes are not a decodable image (no reader, truncated,
      * or empty) — callers fall back to the stub path. */
    def decode(content: Array[Byte]): Option[Decoded] = {
      if (content == null || content.isEmpty) None
      else try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          Some(Decoded(w, h, img.getColorModel.hasAlpha,
            img.getRGB(0, 0, w, h, null, 0, w)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** Mean R, G, B in [0, 255]. */
    def channelMeans(d: Decoded): (Double, Double, Double) = {
      var (r, g, b) = (0L, 0L, 0L)
      var i = 0
      while (i < d.argb.length) {
        val p = d.argb(i)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        i += 1
      }
      val n = d.argb.length.toDouble
      (r / n, g / n, b / n)
    }

    /** `dims`-length feature vector (dims ≥ 4): [meanR, meanG, meanB] / 255
      * followed by a (dims−3)-bin luminance histogram (pixel fractions;
      * integer Rec.601 luma `(299r + 587g + 114b) / 1000`). Resolution- and
      * byte-layout-independent, so near-identical images at different
      * encodings land near each other in feature space. */
    def features(d: Decoded, dims: Int): Array[Float] = {
      require(dims >= 4, s"image features need ≥ 4 dims, got $dims")
      val out = new Array[Float](dims)
      val (mr, mg, mb) = channelMeans(d)
      out(0) = (mr / 255.0).toFloat
      out(1) = (mg / 255.0).toFloat
      out(2) = (mb / 255.0).toFloat
      val nb = dims - 3
      val hist = new Array[Long](nb)
      var i = 0
      while (i < d.argb.length) {
        val p = d.argb(i)
        val l = (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
          114 * (p & 0xff)) / 1000
        hist(math.min(nb - 1, l * nb / 256)) += 1
        i += 1
      }
      var j = 0
      while (j < nb) {
        out(3 + j) = (hist(j).toDouble / d.argb.length).toFloat
        j += 1
      }
      out
    }

    /** Aspect-preserving pixel scale to fit (maxW, maxH), re-encoded as PNG
      * (lossless). When the image already fits, returns the ORIGINAL bytes
      * (same array reference — callers can detect the no-op and keep the
      * original mime). None when the input is not a decodable image. */
    def resizeEncode(content: Array[Byte], maxW: Int,
        maxH: Int): Option[(Array[Byte], Int, Int)] =
      decode(content).map { d =>
        val scale = math.min(maxW.toDouble / d.width, maxH.toDouble / d.height)
        if (scale >= 1.0) (content, d.width, d.height)
        else {
          val (w, h) = (math.max(1, (d.width * scale).toInt),
            math.max(1, (d.height * scale).toInt))
          val typ = if (d.hasAlpha) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          // rebuild the source raster from the pixels decode() already
          // produced — a second ImageIO.read would double the dominant cost
          val src = new java.awt.image.BufferedImage(d.width, d.height, typ)
          src.setRGB(0, 0, d.width, d.height, d.argb, 0, d.width)
          val dst = new java.awt.image.BufferedImage(w, h, typ)
          val g = dst.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          (bos.toByteArray, w, h)
        }
      }
  }

  /** Real audio decode via JDK `javax.sound.sampled` — WAV/AIFF PCM, no
    * external dependencies. Compressed formats (MP3/OGG/AAC) have no JDK
    * codec and fall back to the stub. Deterministic: PCM decode is exact
    * integer → float scaling, feature math is fixed-order. */
  object AudioCodec {

    /** Mono-mixed normalized samples in [−1, 1]. */
    final case class DecodedAudio(sampleRate: Float, channels: Int,
        samples: Array[Float])

    /** None when the bytes are not a decodable PCM stream. */
    def decode(content: Array[Byte]): Option[DecodedAudio] = {
      if (content == null || content.isEmpty) None
      else try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          if (!(signed || unsigned) || (bits != 8 && bits != 16) || ch < 1) None
          else {
            val raw = ais.readAllBytes()
            val bytesPerSample = bits / 8
            val frameBytes = bytesPerSample * ch
            val nFrames = raw.length / frameBytes
            val out = new Array[Float](nFrames)
            val big = fmt.isBigEndian
            var f = 0
            while (f < nFrames) {
              var acc = 0.0f
              var c = 0
              while (c < ch) {
                val off = f * frameBytes + c * bytesPerSample
                val v =
                  if (bits == 8) {
                    if (signed) raw(off) / 128.0f
                    else ((raw(off) & 0xff) - 128) / 128.0f
                  } else {
                    val (b0, b1) = if (big) (raw(off), raw(off + 1))
                      else (raw(off + 1), raw(off))
                    val s = ((b0 << 8) | (b1 & 0xff)).toShort
                    val u = if (signed) s.toInt else ((s & 0xffff) - 32768)
                    u / 32768.0f
                  }
                acc += v
                c += 1
              }
              out(f) = acc / ch
              f += 1
            }
            Some(DecodedAudio(fmt.getSampleRate, ch, out))
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }

    /** `dims`-length features (dims ≥ 4): [RMS, zero-crossing rate,
      * peak |amplitude|] followed by a (dims−3)-segment RMS energy
      * envelope. Duration-independent shape, so clips of the same material
      * at different lengths land near each other. */
    def features(d: DecodedAudio, dims: Int): Array[Float] = {
      require(dims >= 4, s"audio features need ≥ 4 dims, got $dims")
      val out = new Array[Float](dims)
      val n = d.samples.length
      if (n == 0) return out
      var sumSq = 0.0
      var peak = 0.0f
      var zc = 0
      var i = 0
      while (i < n) {
        val v = d.samples(i)
        sumSq += v.toDouble * v
        val av = math.abs(v)
        if (av > peak) peak = av
        if (i > 0 && (v > 0f) != (d.samples(i - 1) > 0f)) zc += 1
        i += 1
      }
      out(0) = math.sqrt(sumSq / n).toFloat
      out(1) = zc.toFloat / n
      out(2) = peak
      val nSeg = dims - 3
      var s = 0
      while (s < nSeg) {
        val lo = (s.toLong * n / nSeg).toInt
        val hi = ((s + 1).toLong * n / nSeg).toInt
        var acc = 0.0
        var j = lo
        while (j < hi) { acc += d.samples(j).toDouble * d.samples(j); j += 1 }
        out(3 + s) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0f
        s += 1
      }
      out
    }
  }

  /** REAL container-level video metadata: an ISO-BMFF (MP4/MOV) box parser
    * — plain [size][type] records, zero dependencies. Extracts the major
    * brand (`ftyp`), movie timescale + duration (`moov/mvhd`, v0 and v1),
    * and track count (`moov/trak`). Frame PIXELS remain the stub (the JDK
    * ships no video codec), but duration/track metadata no longer has to be
    * trusted from the ingest row — it is parsed from the bytes, so
    * [[sampleFrames]]-style planning can cross-check declared durations. */
  object VideoMeta {

    final case class Mp4Info(brand: String, timescale: Long, duration: Long,
        nTracks: Int) {
      def durationMs: Long =
        if (timescale <= 0) 0L else duration * 1000L / timescale
    }

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)

    private def boxType(b: Array[Byte], o: Int): String =
      new String(b, o + 4, 4, "ISO-8859-1")

    /** Iterate top-level (or child) boxes in [lo, hi): (type, payloadLo,
      * payloadHi) triples. Malformed sizes end the scan (None upstream). */
    private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var pos = lo
        def hasNext: Boolean = pos + 8 <= hi
        def next(): (String, Int, Int) = {
          val size = be32(b, pos)
          val t = boxType(b, pos)
          val (payloadLo, end) =
            if (size == 1 && pos + 16 <= hi) (pos + 16, pos + be64(b, pos + 8))
            else if (size == 0) (pos + 8, hi.toLong)
            else (pos + 8, pos + size)
          val clampedEnd = math.min(end, hi.toLong).toInt
          val r = (t, payloadLo, math.max(clampedEnd, payloadLo))
          pos = if (clampedEnd > pos) clampedEnd else hi // no progress → stop
          r
        }
      }

    /** None when the bytes are not a parsable MP4/MOV container. */
    def parse(content: Array[Byte]): Option[Mp4Info] = {
      if (content == null || content.length < 16) return None
      try {
        val top = boxes(content, 0, content.length).toSeq
        val brand = top.collectFirst { case ("ftyp", lo, hi) if hi >= lo + 4 =>
          new String(content, lo, 4, "ISO-8859-1")
        }
        val moov = top.collectFirst { case ("moov", lo, hi) => (lo, hi) }
        moov.flatMap { case (mLo, mHi) =>
          val children = boxes(content, mLo, mHi).toSeq
          val mvhd = children.collectFirst { case ("mvhd", lo, hi) if hi > lo =>
            val version = content(lo) & 0xff
            // v1: version/flags(4) + creation(8) + modification(8) +
            // timescale(4, still 32-bit) + duration(8)
            if (version == 1 && hi >= lo + 32)
              (be32(content, lo + 20), be64(content, lo + 24))
            else if (version == 0 && hi >= lo + 20)
              (be32(content, lo + 12), be32(content, lo + 16))
            else (0L, 0L)
          }
          val nTracks = children.count(_._1 == "trak")
          mvhd.collect { case (ts, dur) if ts > 0 =>
            Mp4Info(brand.getOrElse("????"), ts, dur, nTracks)
          }
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Deterministic stand-in for the VIDEO pixel-decode step (STUB — the JDK
    * ships no video codec; see class doc). Images ([[ImageCodec]]), PCM
    * audio ([[AudioCodec]]), and MP4 container metadata ([[VideoMeta]]) do
    * NOT go through this anymore. A real media binding decodes frames here;
    * everything around it (batching, schema, shuffle shape) is unchanged
    * when it lands. */
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
    * partition, not per row). Assets declaring `kind == "image"` decode for
    * real ([[ImageCodec]]: `decoded_w`/`decoded_h` are the true pixel
    * dimensions, `feature_vec` pixel-derived); `kind == "audio"` decodes
    * PCM for real ([[AudioCodec]]: `decoded_w` = sample count, `decoded_h`
    * = sample rate, `feature_vec` = RMS/ZCR/peak + energy envelope).
    * Undecodable payloads and video take the stub path with
    * `decoded_w = decoded_h = -1`.
    */
  def extractFeatures(assets: Dataset[Asset], dims: Int = 8): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      // real codecs initialize here (per-partition), e.g. decoder contexts
      rows.map { a =>
        val bytes = if (a.content == null) Array.empty[Byte] else a.content
        val img = if (a.kind == "image") ImageCodec.decode(bytes) else None
        val aud = if (a.kind == "audio") AudioCodec.decode(bytes) else None
        val (w, h) = img.map(d => (d.width, d.height))
          .orElse(aud.map(d => (d.samples.length, d.sampleRate.toInt)))
          .getOrElse((-1, -1))
        val real = img.map(d => ImageCodec.features(d, dims))
          .orElse(aud.map(d => AudioCodec.features(d, dims)))
        MediaFeatures(
          a.asset_id, a.kind, bytes.length.toLong,
          java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).take(4).map("%02x".format(_)).mkString,
          if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length,
          w, h,
          real.getOrElse(StubCodec.decode(bytes, dims)),
          if (real.isDefined) "real" else "stub")
      }
    }
  }

  /** Column-level variants for DataFrame pipelines: byte length, MD5, and a
    * truncated preview — pure built-ins, no UDF. */
  def withBlobMetadata(df: DataFrame, blobCol: String = "content"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(blobCol)).cast("long"))
      .withColumn("content_md5", md5(col(blobCol)))
      .withColumn("head_hex", hex(expr(s"substring($blobCol, 1, 8)")))

  /** Resize to fit (maxW, maxH), aspect-preserving. Decodable images take
    * the REAL pixel path ([[ImageCodec.resizeEncode]]: bilinear scale, PNG
    * re-encode, metadata set from the actual output raster). Audio/video
    * and undecodable payloads keep the stub path (metadata transform is
    * real; bytes truncated proportionally as a stand-in). */
  def resize(assets: Dataset[Asset], maxW: Int, maxH: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      rows.map { a =>
        val bytes = if (a.content == null) Array.empty[Byte] else a.content
        if (a.width <= maxW && a.height <= maxH) a
        else {
          val real = if (a.kind == "image")
            ImageCodec.resizeEncode(bytes, maxW, maxH) else None
          real match {
            case Some((out, w, h)) if out eq bytes =>
              // declared dims were stale — the actual raster already fits:
              // bytes untouched, so the ORIGINAL mime stays correct
              a.copy(width = w, height = h)
            case Some((out, w, h)) =>
              a.copy(width = w, height = h, content = out, mime = "image/png")
            case None =>
              val scale = math.min(maxW.toDouble / a.width, maxH.toDouble / a.height)
              val (w, h) = (math.max(1, (a.width * scale).toInt),
                math.max(1, (a.height * scale).toInt))
              // STUB pixel path: truncate bytes proportionally to the area ratio
              val keep = math.max(1,
                (bytes.length * (w.toLong * h) / (a.width.toLong * a.height)).toInt)
              a.copy(width = w, height = h, content = bytes.take(keep))
          }
        }
      }
    }
  }

  /** Parsed-vs-declared video metadata: one row per `kind == "video"`
    * asset with the [[VideoMeta]] container parse beside the ingest row's
    * declared duration — `duration_mismatch` flags rows whose declared
    * metadata disagrees with the bytes (the cross-check the parser exists
    * for; unparsable containers yield nulls and no mismatch claim). */
  def videoMetadata(assets: Dataset[Asset]): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { rows =>
      rows.map { a =>
        val info = VideoMeta.parse(a.content)
        (a.asset_id, info.map(_.brand), info.map(_.durationMs),
          info.map(_.nTracks), a.duration_ms,
          info.exists(_.durationMs != a.duration_ms))
      }
    }.toDF("asset_id", "brand", "parsed_duration_ms", "n_tracks",
      "declared_duration_ms", "duration_mismatch")
  }

  final case class Frame(asset_id: Long, frame_no: Int, ts_ms: Long,
      frame: Array[Byte])

  /** Frame sampling: one output row per sampled timestamp on the asset's
    * `[0, duration_ms]` grid. Animated GIF and MJPEG-in-AVI decode for REAL
    * ([[VideoFrames]]): the container is decoded ONCE per asset, each grid
    * timestamp picks the presentation frame at-or-before it, and the frame
    * ships as lossless PNG bytes (each distinct picked frame encoded once).
    * Other containers (H.264 etc. — no JDK codec) keep the deterministic
    * stub byte-slice grab.
    *
    * The expansion is a flatMap rather than a relational explode because a
    * real container decode is inherently once-per-asset sequential — the
    * parallel unit is the asset (same shape as a Pandas-UDF video stage);
    * partitioning follows the parent rows.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    // Column (not lambda) filter: evaluated on the scan side, before any
    // Asset deserialization — non-video rows never pay the blob decode.
    assets.filter(col("kind") === "video" && col("duration_ms") >= 0).flatMap { a =>
      val content = if (a.content == null) Array.empty[Byte] else a.content
      val grid = 0L.to(a.duration_ms, everyMs).zipWithIndex
      VideoFrames.decode(content) match {
        case Some(frames0) =>
          val frames = frames0.toIndexedSeq
          val pngCache = scala.collection.mutable.Map.empty[Int, Array[Byte]]
          // grid and frames are both time-ordered, so one merged pass finds
          // each grid point's presentation frame (at-or-before ts, first
          // frame starts at 0) — O(grid + frames), not the O(grid × frames)
          // takeWhile rescan this replaced
          var fi = 0
          grid.map { case (ts, no) =>
            while (fi + 1 < frames.length && frames(fi + 1).tsMs <= ts) fi += 1
            val f = if (frames(fi).tsMs <= ts) frames(fi) else frames.head
            Frame(a.asset_id, no, ts,
              pngCache.getOrElseUpdate(f.index, VideoFrames.encodePng(f)))
          }
        case None =>
          grid.map { case (ts, no) =>
            // STUB frame grab: a real codec would seek to ts and decode
            val start = if (content.isEmpty) 0 else (no * 7) % content.length
            Frame(a.asset_id, no, ts,
              content.slice(start, math.min(start + 16, content.length)))
          }
      }
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
