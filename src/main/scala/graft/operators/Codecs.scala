package graft.operators

/** Real pure-JVM media codecs — one format per modality, no native
  * libraries:
  *
  *  - image: BMP (24bpp uncompressed BI_RGB) and PPM (binary P6)
  *  - audio: WAV (RIFF PCM16)
  *  - video: Y4M (YUV4MPEG2, C420 family, raw frames)
  *
  * These replace the deterministic fakes at the codec boundary of
  * [[Multimodal]] for payloads that actually carry these formats; anything
  * unrecognized still falls back to [[Multimodal.StubCodec]] so synthetic
  * testdata keeps flowing. All decoders are total (Option, no throws) and
  * allocation-conscious — they run inside `mapPartitions` over binary
  * columns that were never shuffled.
  */
object Codecs {

  /** A decoded single-plane (luma) image, values in [0, 1]. */
  final case class Plane(width: Int, height: Int, pixels: Array[Float])

  /** Decoded PCM audio, mono-mixed, values in [-1, 1]. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Float])

  /** Decoded Y4M video: luma planes at the container's frame rate. */
  final case class Frames(width: Int, height: Int, frameRateNum: Int,
      frameRateDen: Int, lumas: Vector[Array[Float]])

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** ITU-R BT.601 luma from 8-bit RGB, normalized to [0, 1]. */
  @inline private def luma(r: Int, g: Int, b: Int): Float =
    ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat

  /** BMP: 'BM' magic, BITMAPINFOHEADER (≥40 bytes), 24bpp, BI_RGB
    * (uncompressed), bottom-up (h > 0) or top-down (h < 0) row order,
    * rows padded to 4 bytes.
    */
  def decodeBmp(b: Array[Byte]): Option[Plane] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = i32(b, 10)
    val hdrSize = i32(b, 14)
    if (hdrSize < 40) return None
    val w = i32(b, 18)
    val hRaw = i32(b, 22)
    val bpp = u16(b, 28)
    val compression = i32(b, 30)
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // all geometry in Long: crafted headers must not overflow Int in the
    // bounds check (a negative stride*h would pass it) or in w*h allocation
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + stride * h > b.length) return None
    if (w.toLong * h > Int.MaxValue) return None
    val out = new Array[Float](w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      val rowOff = (dataOff + srcRow * stride).toInt // bounds-checked above
      while (x < w) {
        val p = rowOff + x * 3 // BGR order
        out(y * w + x) = luma(b(p + 2) & 0xff, b(p + 1) & 0xff, b(p) & 0xff)
        x += 1
      }
      y += 1
    }
    Some(Plane(w, h, out))
  }

  /** PPM binary P6 with maxval ≤ 255; '#' comments allowed between header
    * tokens (the netpbm grammar).
    */
  def decodePpm(b: Array[Byte]): Option[Plane] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var live = true
      while (live && i < b.length) {
        val c = b(i)
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else live = false
      }
    }
    def token(): Option[Int] = {
      skipSpaceAndComments()
      val start = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i == start) None
      else {
        var v = 0L
        var j = start
        while (j < i) { v = v * 10 + (b(j) - '0'); j += 1 }
        if (v > Int.MaxValue) None else Some(v.toInt)
      }
    }
    for {
      w <- token(); h <- token(); maxval <- token()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255
      // exactly ONE whitespace byte separates header and raster
      if i < b.length && { i += 1; b.length - i >= w.toLong * h * 3 }
    } yield {
      val out = new Array[Float](w * h)
      var p = 0
      while (p < w * h) {
        val o = i + p * 3
        out(p) = luma(b(o) & 0xff, b(o + 1) & 0xff, b(o + 2) & 0xff) * (255.0f / maxval)
        p += 1
      }
      Plane(w, h, out)
    }
  }

  /** WAV: RIFF/WAVE container, 'fmt ' chunk with PCM (format 1) 16-bit
    * samples, 'data' chunk; channels are averaged to mono.
    */
  def decodeWav(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 12 || !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      !(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0
    while (i + 8 <= b.length && (dataOff < 0 || !fmtOk)) {
      val id = new String(b, i, 4, "US-ASCII")
      val len = i32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      id match {
        case "fmt " if len >= 16 =>
          val audioFormat = u16(b, i + 8)
          channels = u16(b, i + 10)
          sampleRate = i32(b, i + 12)
          bits = u16(b, i + 22)
          fmtOk = audioFormat == 1 && bits == 16 && channels > 0 && sampleRate > 0
        case "data" =>
          dataOff = i + 8; dataLen = len
        case _ => ()
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    val frameBytes = 2 * channels
    val n = dataLen / frameBytes
    val out = new Array[Float](n)
    var f = 0
    while (f < n) {
      var acc = 0.0f
      var c = 0
      while (c < channels) {
        val off = dataOff + f * frameBytes + c * 2
        acc += (u16(b, off).toShort / 32768.0f)
        c += 1
      }
      out(f) = acc / channels
      f += 1
    }
    Some(Pcm(sampleRate, channels, out))
  }

  /** Y4M (YUV4MPEG2): ASCII stream header `YUV4MPEG2 W<w> H<h> F<n>:<d> …`,
    * then `FRAME…\n` + planar YCbCr per frame; the luma plane is the first
    * w×h bytes (any C420 chroma variant — chroma is skipped, not read).
    */
  def decodeY4m(b: Array[Byte]): Option[Frames] = {
    val magic = "YUV4MPEG2"
    if (b.length < magic.length + 1 ||
      new String(b, 0, magic.length, "US-ASCII") != magic) return None
    var i = magic.length
    var end = i
    while (end < b.length && b(end) != '\n') end += 1
    if (end >= b.length) return None
    val params = new String(b, i, end - i, "US-ASCII").trim.split("\\s+")
    var w = 0; var h = 0; var fn = 25; var fd = 1; var c420 = true
    params.foreach {
      case p if p.startsWith("W") => w = p.drop(1).toIntOption.getOrElse(0)
      case p if p.startsWith("H") => h = p.drop(1).toIntOption.getOrElse(0)
      case p if p.startsWith("F") =>
        p.drop(1).split(":") match {
          case Array(n, d) =>
            fn = n.toIntOption.getOrElse(25); fd = d.toIntOption.getOrElse(1)
          case _ => ()
        }
      case p if p.startsWith("C") => c420 = p.drop(1).startsWith("420")
      case _ => ()
    }
    // reject degenerate geometry/rate headers: frame-size arithmetic must
    // not overflow Int (a negative frameSize passes <= length checks and
    // then walks the cursor backwards), and a zero frame-rate denominator
    // would divide-by-zero in consumers mapping timestamps to frames
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0 || !c420) return None
    val frameSizeL = w.toLong * h + 2L * ((w.toLong + 1) / 2) * ((h.toLong + 1) / 2)
    if (w.toLong * h > Int.MaxValue || frameSizeL > Int.MaxValue) return None
    val frameSize = frameSizeL.toInt
    i = end + 1
    val lumas = Vector.newBuilder[Array[Float]]
    var live = true
    while (live && i < b.length) {
      var e = i
      while (e < b.length && b(e) != '\n') e += 1
      val line = new String(b, i, math.min(e - i, 5), "US-ASCII")
      if (line != "FRAME" || e >= b.length || e.toLong + 1 + frameSize > b.length) live = false
      else {
        val base = e + 1
        if (base.toLong + frameSize > b.length) live = false
        else {
          val plane = new Array[Float](w * h)
          var p = 0
          while (p < w * h) { plane(p) = (b(base + p) & 0xff) / 255.0f; p += 1 }
          lumas += plane
          i = base + frameSize
        }
      }
    }
    val fs = lumas.result()
    if (fs.isEmpty) None else Some(Frames(w, h, fn, fd, fs))
  }
}
