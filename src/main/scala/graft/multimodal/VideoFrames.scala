package graft.multimodal

import java.awt.image.BufferedImage

/** REAL video-frame decode for the two containers the JDK can actually
  * handle — no external dependencies:
  *
  *  - **Animated GIF** via `javax.imageio`'s multi-frame GIF reader:
  *    frames composite onto the logical-screen canvas honoring per-frame
  *    offsets and the GIF disposal methods (`doNotDispose`,
  *    `restoreToBackgroundColor`, `restoreToPrevious`), with timestamps
  *    accumulated from each frame's delay.
  *  - **MJPEG-in-AVI** via a RIFF chunk walk (`LIST hdrl`/`avih` for the
  *    frame clock, `LIST movi` for `..dc`/`..db` frame chunks), each frame
  *    payload being a plain JPEG that [[Multimodal.ImageCodec]] decodes.
  *
  * H.264/HEVC/VP9 (and MP3/AAC audio) remain [[Multimodal.StubCodec]]'s
  * honest stub — the JDK genuinely ships no such codec.
  *
  * Decode is per-asset sequential by nature (both containers interleave
  * frames in one byte stream), so callers run it inside the partition
  * ([[Multimodal.sampleFrames]]) — the parallel unit is the asset, the same
  * shape a Pandas-UDF video stage has.
  */
object VideoFrames {

  /** One composited frame: `tsMs` is its presentation start. */
  final case class DecodedFrame(index: Int, tsMs: Long, width: Int,
      height: Int, argb: Array[Int])

  /** Default decoded-pixel budget per container: 64M ARGB pixels = 256 MB.
    * Decoding holds every composited frame in task memory (w·h·4·nFrames
    * bytes — a 1080p GIF with hundreds of frames is multi-GB), so a
    * container whose frame count × canvas area exceeds the budget is
    * refused up front and the caller falls back to the stub instead of
    * OOMing the executor. */
  val DefaultMaxPixels: Long = 64L << 20

  /** Try GIF, then MJPEG-AVI; None → caller falls back to the stub. */
  def decode(content: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Seq[DecodedFrame]] =
    decodeGif(content, maxPixels).orElse(decodeMjpegAvi(content, maxPixels))

  // ---------------------------------------------------------------- GIF --

  private def gifAttr(node: org.w3c.dom.Node, elem: String,
      attr: String): Option[String] = {
    var c = node.getFirstChild
    while (c != null) {
      if (c.getNodeName == elem) {
        val a = c.getAttributes.getNamedItem(attr)
        return Option(a).map(_.getNodeValue)
      }
      c = c.getNextSibling
    }
    None
  }

  /** None unless the bytes are a GIF with ≥ 1 decodable frame whose total
    * composited output fits `maxPixels`. */
  def decodeGif(content: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Seq[DecodedFrame]] = {
    if (content == null || content.length < 6 ||
      !(content(0) == 'G' && content(1) == 'I' && content(2) == 'F')) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n < 1) return None
        // canvas = logical screen; fall back to frame 0's size
        val streamMeta = reader.getStreamMetadata
        val streamTree = streamMeta.getAsTree(streamMeta.getNativeMetadataFormatName)
        val screen = gifAttr(streamTree,
          "LogicalScreenDescriptor", "logicalScreenWidth").map(_.toInt)
          .zip(gifAttr(streamTree,
            "LogicalScreenDescriptor", "logicalScreenHeight").map(_.toInt))
        val (cw, ch) = screen.getOrElse((reader.getWidth(0), reader.getHeight(0)))
        // budget check BEFORE any frame decode: canvas area × frame count is
        // exactly the memory the composited output will hold
        if (cw.toLong * ch * n > maxPixels) return None
        val canvas = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_ARGB)
        val g = canvas.createGraphics()
        var ts = 0L
        val out = Seq.newBuilder[DecodedFrame]
        for (i <- 0 until n) {
          val frame = reader.read(i)
          val imgMeta = reader.getImageMetadata(i)
          val meta = imgMeta.getAsTree(imgMeta.getNativeMetadataFormatName)
          val x = gifAttr(meta, "ImageDescriptor", "imageLeftPosition")
            .map(_.toInt).getOrElse(0)
          val y = gifAttr(meta, "ImageDescriptor", "imageTopPosition")
            .map(_.toInt).getOrElse(0)
          val disposal = gifAttr(meta, "GraphicControlExtension", "disposalMethod")
            .getOrElse("none")
          val delayCs = gifAttr(meta, "GraphicControlExtension", "delayTime")
            .map(_.toInt).getOrElse(0)
          val before =
            if (disposal == "restoreToPrevious")
              canvas.getRGB(0, 0, cw, ch, null, 0, cw)
            else null
          g.drawImage(frame, x, y, null)
          out += DecodedFrame(i, ts, cw, ch,
            canvas.getRGB(0, 0, cw, ch, null, 0, cw))
          // a 0 delay means "as fast as possible"; players settle on 100 ms
          ts += (if (delayCs <= 0) 100L else delayCs * 10L)
          disposal match {
            case "restoreToBackgroundColor" =>
              // background renders as transparent in every modern player
              val clear = new Array[Int](frame.getWidth * frame.getHeight)
              canvas.setRGB(x, y,
                math.min(frame.getWidth, cw - x), math.min(frame.getHeight, ch - y),
                clear, 0, frame.getWidth)
            case "restoreToPrevious" =>
              canvas.setRGB(0, 0, cw, ch, before, 0, cw)
            case _ => ()
          }
        }
        g.dispose()
        Some(out.result())
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  // -------------------------------------------------------- MJPEG / AVI --

  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** RIFF chunks in [lo, hi): (fourcc, payloadLo, payloadHi). Chunks are
    * word-aligned; malformed sizes end the scan. */
  private def chunks(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = lo
      def hasNext: Boolean = pos + 8 <= hi
      def next(): (String, Int, Int) = {
        val id = fourcc(b, pos)
        val size = le32(b, pos + 4)
        val payloadLo = pos + 8
        val end = math.min(payloadLo + size, hi.toLong).toInt
        val r = (id, payloadLo, math.max(end, payloadLo))
        val advanced = end + (size & 1L).toInt // pad byte on odd sizes
        pos = if (advanced > pos) advanced else hi
        r
      }
    }

  /** None unless the bytes are a RIFF AVI whose video chunks all decode as
    * JPEG (a single undecodable frame fails the whole container — partial
    * pixel output would be silently wrong data) and whose total decoded
    * output fits `maxPixels`. */
  def decodeMjpegAvi(content: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Seq[DecodedFrame]] = {
    if (content == null || content.length < 12 ||
      fourcc(content, 0) != "RIFF" || fourcc(content, 8) != "AVI ") return None
    try {
      val top = chunks(content, 12, content.length).toSeq
      def list(kind: String): Option[(Int, Int)] =
        top.collectFirst {
          case ("LIST", lo, hi) if hi >= lo + 4 && fourcc(content, lo) == kind =>
            (lo + 4, hi)
        }
      // avih dwMicroSecPerFrame is the frame clock; 0 → 30 fps fallback
      val usPerFrame = list("hdrl").flatMap { case (lo, hi) =>
        chunks(content, lo, hi).collectFirst {
          case ("avih", alo, ahi) if ahi >= alo + 4 => le32(content, alo)
        }
      }.filter(_ > 0).getOrElse(33333L)
      list("movi").flatMap { case (lo, hi) =>
        // interleaved AVIs group frame chunks inside 'LIST rec ' sublists —
        // flatten those transparently. Depth is BOUNDED: the spec'd shape is
        // one level, and a crafted blob nesting 'LIST rec ' headers tens of
        // thousands deep (12 bytes/level) would otherwise StackOverflow —
        // which is fatal, NOT caught by the NonFatal fallback below.
        def walk(clo: Int, chi: Int, depth: Int): Iterator[(String, Int, Int)] =
          chunks(content, clo, chi).flatMap {
            case ("LIST", llo, lhi) if depth < 16 && lhi >= llo + 4 &&
                fourcc(content, llo) == "rec " => walk(llo + 4, lhi, depth + 1)
            case other => Iterator.single(other)
          }
        val frames = walk(lo, hi, 0).collect {
          case (id, flo, fhi) if id.endsWith("dc") || id.endsWith("db") =>
            java.util.Arrays.copyOfRange(content, flo, fhi)
        }.toSeq
        // budget check on the FIRST frame's dims × frame count (MJPEG frames
        // share dimensions in any real AVI) before decoding the rest
        val first = frames.headOption.flatMap(Multimodal.ImageCodec.decode)
        if (first.exists(f => f.width.toLong * f.height * frames.size > maxPixels))
          None
        else {
          val decoded = frames.map(Multimodal.ImageCodec.decode)
          if (decoded.isEmpty || decoded.exists(_.isEmpty)) None
          else Some(decoded.flatten.zipWithIndex.map { case (d, i) =>
            DecodedFrame(i, i * usPerFrame / 1000L, d.width, d.height, d.argb)
          })
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** PNG-encode one decoded frame (lossless, so spec-level pixel equality
    * survives the bytes round-trip). */
  def encodePng(f: DecodedFrame): Array[Byte] = {
    val img = new BufferedImage(f.width, f.height, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, f.width, f.height, f.argb, 0, f.width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
