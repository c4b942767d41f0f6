package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** Committed 4x2 RGB PNG fixture. Pixels, row-major:
    * row 0: (255,0,0) (0,255,0) (0,0,255) (255,255,255)
    * row 1: (0,0,0) (128,128,128) (255,255,0) (0,255,255)
    */
  private def fixturePng: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/rgb_4x2.png")
    try in.readAllBytes() finally in.close()
  }

  private val fixturePixels: Seq[(Int, Int, Int)] = Seq(
    (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255),
    (0, 0, 0), (128, 128, 128), (255, 255, 0), (0, 255, 255))

  test("ImageCodec.decode: exact pixels from a committed PNG") {
    val d = Multimodal.ImageCodec.decode(fixturePng).get
    assert(d.width === 4 && d.height === 2)
    val expectedArgb = fixturePixels.map { case (r, g, b) =>
      0xff000000 | (r << 16) | (g << 8) | b
    }
    assert(d.argb.toSeq === expectedArgb)

    val (mr, mg, mb) = Multimodal.ImageCodec.channelMeans(d)
    assert(mr === 111.625) // (255+0+0+255+0+128+255+0)/8
    assert(mg === 143.5)   // (0+255+0+255+0+128+255+255)/8
    assert(mb === 111.625)

    // dims=7 → 3 channel means + 4-bin luma histogram.
    // Integer Rec.601 lumas: 76,149,29,255,0,128,225,178 → bins 1,2,0,3,0,2,3,2
    val f = Multimodal.ImageCodec.features(d, 7)
    assert(f(0) === (111.625 / 255.0).toFloat)
    assert(f(1) === (143.5 / 255.0).toFloat)
    assert(f(2) === (111.625 / 255.0).toFloat)
    assert(f.slice(3, 7).toSeq === Seq(0.25f, 0.125f, 0.375f, 0.25f))
    assert(math.abs(f.slice(3, 7).map(_.toDouble).sum - 1.0) < 1e-9)
  }

  test("ImageCodec decodes JPEG too (lossy: exact dims, close features)") {
    // encode the fixture pixels as JPEG via the same JDK codec stack a real
    // ingest would produce, then decode through the production path
    val d = Multimodal.ImageCodec.decode(fixturePng).get
    val img = new java.awt.image.BufferedImage(
      d.width, d.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, d.width, d.height, d.argb, 0, d.width)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray

    val jd = Multimodal.ImageCodec.decode(jpeg).get
    assert(jd.width === 4 && jd.height === 2)
    val fPng = Multimodal.ImageCodec.features(d, 7)
    val fJpg = Multimodal.ImageCodec.features(jd, 7)
    // channel means survive JPEG quantization to within a few percent
    (0 until 3).foreach { k =>
      assert(math.abs(fPng(k) - fJpg(k)) < 0.1,
        s"channel $k: png ${fPng(k)} vs jpeg ${fJpg(k)}")
    }
    assert(math.abs(fJpg.slice(3, 7).map(_.toDouble).sum - 1.0) < 1e-6)
  }

  /** 16-bit mono PCM WAV of a 1 kHz sine at amplitude 0.5, 8000 Hz, 0.1 s. */
  private def sineWav(freqHz: Double = 1000.0, amp: Double = 0.5,
      rate: Float = 8000f, n: Int = 800): Array[Byte] = {
    val samples = (0 until n).map(i =>
      (amp * math.sin(2 * math.Pi * freqHz * i / rate) * 32767).toInt.toShort)
    val bytes = new Array[Byte](n * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(2 * i) = (s & 0xff).toByte; bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioCodec decodes PCM WAV: sample count, rate, and sine-wave features") {
    val wav = sineWav()
    val d = Multimodal.AudioCodec.decode(wav).get
    assert(d.sampleRate === 8000f && d.channels === 1)
    assert(d.samples.length === 800)
    val f = Multimodal.AudioCodec.features(d, 8)
    // sine RMS = A/sqrt(2) ≈ 0.3536; ZCR ≈ 2·f/rate = 0.25; peak ≈ A
    assert(math.abs(f(0) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(0)}")
    assert(math.abs(f(1) - 0.25) < 0.01, s"zcr ${f(1)}")
    assert(math.abs(f(2) - 0.5) < 0.01, s"peak ${f(2)}")
    // constant-amplitude sine → flat 5-segment energy envelope
    val env = f.slice(3, 8)
    assert(env.forall(e => math.abs(e - f(0)) < 0.02), env.toSeq.toString)

    // non-audio bytes fall through
    assert(Multimodal.AudioCodec.decode("not audio".getBytes).isEmpty)
  }

  test("extractFeatures: audio assets take the real PCM path") {
    import spark.implicits._
    val wav = sineWav()
    val assets = Seq(
      Multimodal.Asset(1L, "audio", "audio/wav", 0, 0, 100L, wav),
      Multimodal.Asset(2L, "audio", "audio/mp3", 0, 0, 100L,
        Array[Byte](1, 2, 3)) // no JDK codec → stub
    ).toDS()
    val feats = Multimodal.extractFeatures(assets, dims = 8)
      .collect().sortBy(_.asset_id)
    // decoded_w carries the sample count, decoded_h the sample rate
    assert(feats(0).decoded_w === 800 && feats(0).decoded_h === 8000)
    val d = Multimodal.AudioCodec.decode(wav).get
    assert(feats(0).feature_vec.toSeq ===
      Multimodal.AudioCodec.features(d, 8).toSeq)
    assert(feats(1).decoded_w === -1 && feats(1).decoded_h === -1)
  }

  /** Minimal valid ISO-BMFF: ftyp(isom) + moov[mvhd v0 (timescale 1000,
    * duration 7500) + 2 empty trak boxes]. */
  private def miniMp4(v1: Boolean = false): Array[Byte] = {
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ t.getBytes("ISO-8859-1") ++ payload
    val mvhd =
      if (v1) box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
        be32(1000) ++ be64(7500) ++ new Array[Byte](80))
      else box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(1000) ++ be32(7500) ++ new Array[Byte](76))
    val trak = box("trak", Array.empty[Byte])
    box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(512)) ++
      box("moov", mvhd ++ trak ++ trak)
  }

  test("VideoMeta parses MP4 container metadata (mvhd v0 and v1)") {
    for (v1 <- Seq(false, true)) {
      val info = Multimodal.VideoMeta.parse(miniMp4(v1)).get
      assert(info.brand === "isom")
      assert(info.timescale === 1000L && info.duration === 7500L, s"v1=$v1")
      assert(info.durationMs === 7500L)
      assert(info.nTracks === 2)
    }
    // non-container bytes and truncated boxes return None
    assert(Multimodal.VideoMeta.parse("mpeg stream?".getBytes).isEmpty)
    assert(Multimodal.VideoMeta.parse(miniMp4().take(20)).isEmpty)
    assert(Multimodal.VideoMeta.parse(Array.empty[Byte]).isEmpty)
  }

  test("videoMetadata cross-checks parsed container duration vs declared") {
    import spark.implicits._
    val mp4 = miniMp4() // mvhd duration 7500 ms
    val assets = Seq(
      Multimodal.Asset(1L, "video", "video/mp4", 640, 480, 7500L, mp4),
      Multimodal.Asset(2L, "video", "video/mp4", 640, 480, 9999L, mp4),
      Multimodal.Asset(3L, "video", "video/mp4", 640, 480, 1000L,
        "not a container".getBytes),
      Multimodal.Asset(4L, "image", "image/png", 4, 2, 0L, fixturePng)
    ).toDS()
    val meta = Multimodal.videoMetadata(assets).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(meta.keySet === Set(1L, 2L, 3L), "videos only")
    assert(meta(1L).getAs[String]("brand") === "isom")
    assert(meta(1L).getAs[Long]("parsed_duration_ms") === 7500L)
    assert(meta(1L).getAs[Int]("n_tracks") === 2)
    assert(!meta(1L).getAs[Boolean]("duration_mismatch"))
    assert(meta(2L).getAs[Boolean]("duration_mismatch"),
      "declared 9999 vs parsed 7500 must flag")
    assert(meta(3L).isNullAt(meta(3L).fieldIndex("parsed_duration_ms")))
    assert(!meta(3L).getAs[Boolean]("duration_mismatch"),
      "unparsable container makes no mismatch claim")
  }

  test("resize: stale declared dims with an already-fitting raster keep the " +
    "original bytes AND mime; null content survives the stub path") {
    import spark.implicits._
    val png = fixturePng // actual raster 4x2
    val assets = Seq(
      // declared 100x100 (stale) but the real pixels already fit 8x8
      Multimodal.Asset(1L, "image", "image/gif", 100, 100, 0L, png),
      Multimodal.Asset(2L, "video", "video/mp4", 100, 100, 0L, null)
    ).toDS()
    val out = Multimodal.resize(assets, maxW = 8, maxH = 8)
      .collect().sortBy(_.asset_id)
    assert(out(0).width === 4 && out(0).height === 2)
    assert(out(0).mime === "image/gif", "no re-encode happened: mime must not lie")
    assert(out(0).content.toSeq === png.toSeq)
    // null content: no NPE, stub metadata transform still applies
    assert(out(1).width <= 8 && out(1).height <= 8)
    assert(out(1).content.isEmpty)
  }

  test("ImageCodec.decode: non-image and empty bytes return None") {
    assert(Multimodal.ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(Multimodal.ImageCodec.decode(null).isEmpty)
  }

  test("extractFeatures: real pixel features for decodable images, stub fallback otherwise") {
    import spark.implicits._
    val png = fixturePng
    val junk = "definitely-not-a-png".getBytes("UTF-8")
    val assets = Seq(
      Multimodal.Asset(1L, "image", "image/png", 4, 2, 0L, png),
      Multimodal.Asset(2L, "image", "image/png", 8, 8, 0L, junk),
      Multimodal.Asset(3L, "audio", "audio/wav", 0, 0, 1000L, Array[Byte](1, 2, 3))
    ).toDS()
    val feats = Multimodal.extractFeatures(assets, dims = 7)
      .collect().sortBy(_.asset_id)

    // real decode: true pixel dimensions + pixel-derived features
    assert(feats(0).decoded_w === 4 && feats(0).decoded_h === 2)
    val d = Multimodal.ImageCodec.decode(png).get
    assert(feats(0).feature_vec.toSeq ===
      Multimodal.ImageCodec.features(d, 7).toSeq)

    // undecodable image → stub path, sentinel dims
    assert(feats(1).decoded_w === -1 && feats(1).decoded_h === -1)
    assert(feats(1).feature_vec.toSeq === Multimodal.StubCodec.decode(junk, 7).toSeq)

    // audio never hits the image codec
    assert(feats(2).decoded_w === -1 && feats(2).decoded_h === -1)
  }

  test("resize: real pixel path scales, re-encodes PNG, stays decodable") {
    import spark.implicits._
    val png = fixturePng
    val assets = Seq(
      Multimodal.Asset(1L, "image", "image/png", 4, 2, 0L, png)).toDS()
    val out = Multimodal.resize(assets, maxW = 2, maxH = 2).collect().head
    // scale = min(2/4, 2/2) = 0.5 → 2x1
    assert(out.width === 2 && out.height === 1)
    assert(out.mime === "image/png")
    val redec = Multimodal.ImageCodec.decode(out.content).get
    assert(redec.width === 2 && redec.height === 1)

    // below-bounds: byte-identical no-op
    val same = Multimodal.resize(assets, maxW = 4, maxH = 2).collect().head
    assert(same.content.toSeq === png.toSeq)

    // direct resizeEncode no-op keeps the original encoding when scale >= 1
    val noop = Multimodal.ImageCodec.resizeEncode(png, 100, 100).get
    assert(noop._1.toSeq === png.toSeq && noop._2 === 4 && noop._3 === 2)
  }

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

  test("decode_status is a loud real-vs-stub provenance column (r17 verdict #6)") {
    import spark.implicits._
    // a truly decodable image + PCM wav beside codec-compressed stand-ins
    val assets = Seq(
      Multimodal.Asset(1L, "image", "image/png", 4, 2, 0L, fixturePng),
      Multimodal.Asset(2L, "audio", "audio/wav", 0, 0, 100L, sineWav()),
      Multimodal.Asset(3L, "audio", "audio/mp3", 0, 0, 100L,
        Array[Byte](1, 2, 3)), // no JDK MP3 codec → stub
      Multimodal.Asset(4L, "video", "video/mp4", 64, 64, 1000L,
        "fake-h264-payload".getBytes("UTF-8"))).toDS()
    val rows = Multimodal.extractFeatures(assets, dims = 4).collect()
    assert(rows.map(_.decode_status).toSet.subsetOf(Set("real", "stub")))
    // a real decode reports true dimensions; the stub reports -1/-1 — the
    // status column and the dimension sentinel must agree row-by-row
    rows.foreach { r =>
      if (r.decode_status == "real")
        assert(r.decoded_w >= 0 && r.decoded_h >= 0, s"asset ${r.asset_id}")
      else
        assert(r.decoded_w == -1 && r.decoded_h == -1, s"asset ${r.asset_id}")
    }
    // the synthetic corpus mixes decodable images/PCM with stub-only video:
    // both statuses must actually occur, or the column proves nothing
    assert(rows.exists(_.decode_status == "real"))
    assert(rows.exists(_.decode_status == "stub"))
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

  /** Committed animated GIF fixture: three solid 4x2 frames (red, green,
    * blue), 100 ms delay each, no disposal. */
  private def fixtureGif: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/fixtures/anim_4x2.gif")
    try in.readAllBytes() finally in.close()
  }

  test("VideoFrames.decodeGif: committed animated GIF, exact per-frame pixels") {
    val frames = VideoFrames.decodeGif(fixtureGif).get
    assert(frames.map(f => (f.index, f.tsMs, f.width, f.height)) ===
      Seq((0, 0L, 4, 2), (1, 100L, 4, 2), (2, 200L, 4, 2)))
    val solids = Seq(0xffff0000, 0xff00ff00, 0xff0000ff)
    frames.zip(solids).foreach { case (f, argb) =>
      assert(f.argb.toSeq === Seq.fill(8)(argb), s"frame ${f.index}")
    }
    // non-GIF bytes refuse
    assert(VideoFrames.decodeGif(fixturePng).isEmpty)
    assert(VideoFrames.decodeGif("plain text".getBytes).isEmpty)
  }

  test("VideoFrames: decoded-pixel budget refuses oversized containers") {
    // fixture needs 4·2·3 = 24 pixels of canvas; a budget of 23 refuses it
    // (→ stub fallback) instead of holding the composited frames in memory
    assert(VideoFrames.decodeGif(fixtureGif, maxPixels = 23L).isEmpty)
    assert(VideoFrames.decodeGif(fixtureGif, maxPixels = 24L).nonEmpty)
    // two 4x2 JPEG frames = 16 decoded pixels total
    val avi = miniAvi(Seq(jpegOf(0x804020), jpegOf(0x2060a0)), usPerFrame = 40000L)
    assert(VideoFrames.decodeMjpegAvi(avi, maxPixels = 15L).isEmpty)
    assert(VideoFrames.decodeMjpegAvi(avi, maxPixels = 16L).nonEmpty)
  }

  /** Minimal RIFF AVI wrapping the given frame payloads as MJPEG chunks:
    * LIST(hdrl){avih(usPerFrame, totalFrames)} + LIST(movi){00dc...}. */
  private def miniAvi(frames: Seq[Array[Byte]], usPerFrame: Long): Array[Byte] = {
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++ pad
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("ISO-8859-1") ++ children)
    val avih = chunk("avih",
      le32(usPerFrame) ++ new Array[Byte](12) ++ le32(frames.size) ++
        new Array[Byte](36))
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ list("hdrl", avih) ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body
  }

  private def jpegOf(argbSolid: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(y => (0 until 4).foreach(x => img.setRGB(x, y, argbSolid)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("VideoFrames.decodeMjpegAvi: frame clock from avih, pixels from the JPEG codec") {
    val jpegs = Seq(jpegOf(0x804020), jpegOf(0x2060a0))
    val avi = miniAvi(jpegs, usPerFrame = 40000L) // 25 fps
    val frames = VideoFrames.decodeMjpegAvi(avi).get
    assert(frames.map(f => (f.index, f.tsMs, f.width, f.height)) ===
      Seq((0, 0L, 4, 2), (1, 40L, 4, 2)))
    // pixel-exact vs the same JPEG through the image codec (deterministic
    // decoder-to-decoder equality; JPEG itself is lossy vs the source)
    frames.zip(jpegs).foreach { case (f, j) =>
      assert(f.argb.toSeq === Multimodal.ImageCodec.decode(j).get.argb.toSeq)
    }
    // one non-JPEG frame chunk fails the WHOLE container (no partial pixels)
    val bad = miniAvi(Seq(jpegs.head, "junk frame".getBytes), 40000L)
    assert(VideoFrames.decodeMjpegAvi(bad).isEmpty)
    assert(VideoFrames.decodeMjpegAvi(fixtureGif).isEmpty)
    // a crafted blob nesting 'LIST rec ' headers very deep must return None
    // (bounded walk), not blow the task stack with a fatal StackOverflow
    val depth = 100000
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("ISO-8859-1")); bos.write(Array[Byte](0, 0, 0, 127))
    bos.write("AVI ".getBytes("ISO-8859-1"))
    bos.write("LIST".getBytes("ISO-8859-1")); bos.write(Array[Byte](-1, -1, -1, 126))
    bos.write("movi".getBytes("ISO-8859-1"))
    (1 to depth).foreach { _ =>
      bos.write("LIST".getBytes("ISO-8859-1"))
      bos.write(Array[Byte](-1, -1, -1, 126)) // huge size, clamped to hi
      bos.write("rec ".getBytes("ISO-8859-1"))
    }
    assert(VideoFrames.decodeMjpegAvi(bos.toByteArray).isEmpty)
    // decode() dispatches both containers
    assert(VideoFrames.decode(avi).get.size === 2)
    assert(VideoFrames.decode(fixtureGif).get.size === 3)
  }

  test("VideoFrames.decodeMjpegAvi: frames inside interleaved 'LIST rec ' sublists decode") {
    // the interleaved AVI form many muxers emit: movi wraps each frame
    // chunk in a 'rec ' LIST instead of holding 00dc chunks directly
    def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("ISO-8859-1") ++ le32(payload.length) ++ payload ++ pad
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("ISO-8859-1") ++ children)
    val jpegs = Seq(jpegOf(0x804020), jpegOf(0x2060a0))
    val avih = chunk("avih", le32(40000L) ++ new Array[Byte](12) ++ le32(2) ++
      new Array[Byte](36))
    val movi = list("movi",
      jpegs.map(j => list("rec ", chunk("00dc", j))).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ list("hdrl", avih) ++ movi
    val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body

    val frames = VideoFrames.decodeMjpegAvi(avi).get
    assert(frames.map(f => (f.index, f.tsMs)) === Seq((0, 0L), (1, 40L)))
    frames.zip(jpegs).foreach { case (f, j) =>
      assert(f.argb.toSeq === Multimodal.ImageCodec.decode(j).get.argb.toSeq)
    }
  }

  test("sampleFrames: GIF assets decode for REAL — exact pixels per sampled ts") {
    import spark.implicits._
    val gif = fixtureGif // frames at ts 0/100/200
    val assets = Seq(
      Multimodal.Asset(1L, "video", "image/gif", 4, 2, 300L, gif)).toDS()
    val frames = Multimodal.sampleFrames(assets, everyMs = 100L)
      .orderBy("frame_no").collect()
    assert(frames.map(f => (f.frame_no, f.ts_ms)).toSeq ===
      Seq((0, 0L), (1, 100L), (2, 200L), (3, 300L)))
    // ts 300 is past the last presentation start → still the blue frame
    val expect = Seq(0xffff0000, 0xff00ff00, 0xff0000ff, 0xff0000ff)
    frames.zip(expect).foreach { case (f, argb) =>
      val d = Multimodal.ImageCodec.decode(f.frame).get // PNG bytes, lossless
      assert(d.width === 4 && d.height === 2)
      assert(d.argb.toSeq === Seq.fill(8)(argb), s"frame_no ${f.frame_no}")
    }
    // the two identical blue frames share one PNG encode → identical bytes
    assert(frames(2).frame.toSeq === frames(3).frame.toSeq)
  }

  test("sampleFrames: MJPEG-AVI assets decode for real; junk falls back to stub") {
    import spark.implicits._
    val jpegs = Seq(jpegOf(0x804020), jpegOf(0x2060a0))
    val avi = miniAvi(jpegs, usPerFrame = 100000L) // frames at ts 0/100
    val junk = "not media at all, definitely not RIFF".getBytes
    val assets = Seq(
      Multimodal.Asset(1L, "video", "video/avi", 4, 2, 200L, avi),
      Multimodal.Asset(2L, "video", "video/mp4", 4, 2, 200L, junk)).toDS()
    val byAsset = Multimodal.sampleFrames(assets, everyMs = 100L).collect()
      .groupBy(_.asset_id)
    val real = byAsset(1L).sortBy(_.frame_no)
    assert(real.map(_.ts_ms).toSeq === Seq(0L, 100L, 200L))
    assert(Multimodal.ImageCodec.decode(real(0).frame).get.argb.toSeq ===
      Multimodal.ImageCodec.decode(jpegs(0)).get.argb.toSeq)
    assert(Multimodal.ImageCodec.decode(real(1).frame).get.argb.toSeq ===
      Multimodal.ImageCodec.decode(jpegs(1)).get.argb.toSeq)
    // undecodable container: stub byte-slice path, same row-count contract
    val stub = byAsset(2L).sortBy(_.frame_no)
    assert(stub.map(_.ts_ms).toSeq === Seq(0L, 100L, 200L))
    assert(stub.forall(f => Multimodal.ImageCodec.decode(f.frame).isEmpty))
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
