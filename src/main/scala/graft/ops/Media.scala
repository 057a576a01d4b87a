package graft.ops

/** Self-contained pure-JVM media codecs for the multimodal surface.
  *
  * PNG and JPEG — the formats a real multimodal corpus actually
  * ships — ride the JDK's own `javax.imageio` readers/writers
  * ([[encodeImage]]/[[decodeImage]]; in every JDK, so the offline
  * build constraint holds). Beside them, two hand-rolled formats
  * whose on-disk layouts are simple, fully public, and decodable
  * without ANY library:
  *
  *  - BMP: 24-bit uncompressed (`BI_RGB`) Windows bitmaps — 14-byte
  *    file header + 40-byte `BITMAPINFOHEADER`, bottom-up BGR pixel
  *    rows padded to 4-byte boundaries.
  *  - WAV: RIFF/WAVE containers with 16-bit PCM — `fmt ` chunk
  *    (format tag 1) + `data` chunk of little-endian samples.
  *
  * Encoders exist so fixtures and declared queries can synthesize
  * payloads deterministically executor-side; decoders are the real
  * thing (reject wrong magic / compression / bit depth rather than
  * guessing). Everything here is per-row CPU work with zero shared
  * state, so one instance serves a whole partition — the shape
  * [[LlmOps.q48MultimodalFeatures]]'s `mapPartitions` contract
  * assumes. Cites reference repo intent only: the reference has no
  * media path at all; this is the training-data-pipeline extension
  * surface (SURVEY §2.8).
  */
object Media {

  /** Decoded 24-bit bitmap: `rgb` is row-major TOP-DOWN, 3 bytes per
    * pixel in R,G,B order (the decoder undoes BMP's bottom-up BGR).
    */
  final case class Bmp(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def put16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def put32(b: Array[Byte], off: Int, v: Int): Unit = {
    put16(b, off, v & 0xFFFF); put16(b, off + 2, (v >>> 16) & 0xFFFF)
  }

  private def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** 24-bit `BI_RGB` BMP bytes from top-down row-major RGB pixels. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeBmp: bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"encodeBmp: need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val stride = rowStride(width)
    val pixelBytes = stride * height
    val out = new Array[Byte](54 + pixelBytes)
    out(0) = 'B'; out(1) = 'M'
    put32(out, 2, out.length)
    put32(out, 10, 54)            // pixel-array offset
    put32(out, 14, 40)            // BITMAPINFOHEADER size
    put32(out, 18, width)
    put32(out, 22, height)        // positive = bottom-up storage
    put16(out, 26, 1)             // planes
    put16(out, 28, 24)            // bits per pixel
    put32(out, 30, 0)             // BI_RGB (no compression)
    put32(out, 34, pixelBytes)
    var y = 0
    while (y < height) {
      val srcRow = (height - 1 - y) * width * 3 // bottom-up on disk
      val dst = 54 + y * stride
      var x = 0
      while (x < width) {
        out(dst + x * 3) = rgb(srcRow + x * 3 + 2)     // B
        out(dst + x * 3 + 1) = rgb(srcRow + x * 3 + 1) // G
        out(dst + x * 3 + 2) = rgb(srcRow + x * 3)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP; rejects anything else. */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP (missing BM magic)")
    val offset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24, s"decodeBmp: only 24-bit supported, got $bpp")
    require(compression == 0, s"decodeBmp: only BI_RGB supported, got $compression")
    require(width > 0 && rawHeight != 0, s"decodeBmp: bad dims ${width}x$rawHeight")
    // ALL size arithmetic in Long: a hostile header (offset or dims
    // near Int.MaxValue) must fail THESE requires, never wrap an int
    // and pass them only to crash (or silently mis-read) in the copy
    // loop below. offset must also sit past the headers — offset 0
    // would "decode" the header bytes as pixels with no error.
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(offset >= 54, s"decodeBmp: pixel offset $offset inside header")
    require(width.toLong * height * 3L <= Int.MaxValue.toLong,
      s"decodeBmp: implausible dims ${width}x$height")
    val stride = rowStride(width)
    require(bytes.length.toLong >= offset.toLong + stride.toLong * height,
      s"decodeBmp: truncated pixel array (${bytes.length} bytes)")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val src = offset + (if (bottomUp) (height - 1 - y) else y) * stride
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        rgb(dstRow + x * 3) = bytes(src + x * 3 + 2)     // R
        rgb(dstRow + x * 3 + 1) = bytes(src + x * 3 + 1) // G
        rgb(dstRow + x * 3 + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Bmp(width, height, rgb)
  }

  /** Nearest-neighbor resize — the "resize" step of the multimodal
    * pipeline, on decoded pixels (no native scaler needed).
    */
  def resize(img: Bmp, newW: Int, newH: Int): Bmp = {
    require(newW > 0 && newH > 0, s"resize: bad dims ${newW}x$newH")
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = y * img.height / newH
      var x = 0
      while (x < newW) {
        val sx = x * img.width / newW
        val s = (sy * img.width + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Bmp(newW, newH, out)
  }

  /** Encode top-down row-major RGB pixels via the JDK's ImageIO
    * (`javax.imageio` ships in every JDK — no new dependency, the
    * offline-build constraint): `format` is an informal ImageIO
    * writer name ("png", "jpg"). PNG is lossless (exact pixel
    * round-trips through [[decodeImage]]); JPEG is lossy by design —
    * round-trips are dimension-exact and pixel-approximate
    * (MediaSpec pins a mean-error tolerance).
    */
  def encodeImage(format: String, width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeImage: bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"encodeImage: need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        img.setRGB(x, y, ((rgb(s) & 0xFF) << 16) |
          ((rgb(s + 1) & 0xFF) << 8) | (rgb(s + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, out)
    require(ok, s"encodeImage: no ImageIO writer for '$format'")
    out.toByteArray
  }

  /** Decode any ImageIO-readable image (PNG, JPEG, GIF, BMP — the
    * JDK's registered readers) to the shared [[Bmp]] pixel form
    * (top-down row-major RGB), so every downstream transform
    * ([[resize]], feature extraction, row framing) runs one code path
    * regardless of container format. Rejects undecodable bytes
    * loudly (ImageIO returns null) rather than guessing.
    */
  def decodeImage(bytes: Array[Byte]): Bmp = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "decodeImage: no ImageIO reader recognized the payload")
    val w = img.getWidth
    val h = img.getHeight
    require(w.toLong * h * 3L <= Int.MaxValue.toLong,
      s"decodeImage: implausible dims ${w}x$h")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val d = (y * w + x) * 3
        rgb(d) = ((p >> 16) & 0xFF).toByte
        rgb(d + 1) = ((p >> 8) & 0xFF).toByte
        rgb(d + 2) = (p & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Bmp(w, h, rgb)
  }

  /** Minimal real video container for the multimodal surface —
    * motion-PNG: magic "GMJV", big-endian u16 frame count, then per
    * frame a big-endian u32 byte length + one complete PNG payload
    * (decoded frame-by-frame through the JDK ImageIO reader, so the
    * per-frame codec is the real thing; the container walk validates
    * every length against the remaining bytes). The shape mirrors
    * what an MJPEG/AVI pipeline does per frame — container walk +
    * still-image codec — without shipping a native demuxer the
    * offline build can't have.
    */
  def encodeVideo(frames: Seq[Bmp]): Array[Byte] = {
    require(frames.nonEmpty, "encodeVideo: need at least one frame")
    require(frames.size <= 0xFFFF, s"encodeVideo: ${frames.size} frames > u16")
    val payloads = frames.map(f => encodeImage("png", f.width, f.height, f.rgb))
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('M'); out.write('J'); out.write('V')
    out.write((frames.size >> 8) & 0xFF); out.write(frames.size & 0xFF)
    payloads.foreach { p =>
      out.write((p.length >>> 24) & 0xFF); out.write((p.length >>> 16) & 0xFF)
      out.write((p.length >>> 8) & 0xFF); out.write(p.length & 0xFF)
      out.write(p, 0, p.length)
    }
    out.toByteArray
  }

  /** Parse a GMJV container into decoded frames; rejects bad magic,
    * truncated frame tables, and per-frame payloads ImageIO cannot
    * read (via [[decodeImage]]'s own validation).
    */
  def decodeVideo(bytes: Array[Byte]): Seq[Bmp] = {
    require(bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'M' &&
      bytes(2) == 'J' && bytes(3) == 'V', "decodeVideo: not a GMJV container")
    val n = ((bytes(4) & 0xFF) << 8) | (bytes(5) & 0xFF)
    var pos = 6
    (0 until n).map { i =>
      require(pos + 4 <= bytes.length, s"decodeVideo: frame $i table truncated")
      val len = ((bytes(pos) & 0xFF) << 24) | ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      // overflow-free form: `pos + 4 + len` could wrap negative for a
      // hostile length near Int.MaxValue and slip past a `<= length`
      // check — compare against the remaining room instead (the BMP
      // decoder's Long-arithmetic rule, int edition)
      require(len >= 0 && len <= bytes.length - pos - 4,
        s"decodeVideo: frame $i payload overruns container")
      val frame = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
      pos += 4 + len
      decodeImage(frame)
    }
  }

  /** 16-bit PCM RIFF/WAVE bytes from interleaved samples. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "encodeWav: bad rate/channels")
    require(samples.length % channels == 0,
      s"encodeWav: ${samples.length} samples not divisible by $channels channels")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    put32(out, 4, 36 + dataBytes)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    put32(out, 16, 16)                      // fmt chunk size
    put16(out, 20, 1)                       // PCM
    put16(out, 22, channels)
    put32(out, 24, sampleRate)
    put32(out, 28, sampleRate * channels * 2) // byte rate
    put16(out, 32, channels * 2)            // block align
    put16(out, 34, 16)                      // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    put32(out, 40, dataBytes)
    var i = 0
    while (i < samples.length) { put16(out, 44 + i * 2, samples(i) & 0xFFFF); i += 1 }
    out
  }

  /** Parse a RIFF/WAVE container with 16-bit PCM data; walks the
    * chunk list (so extra chunks like `LIST` are skipped, not fatal)
    * and rejects non-PCM or non-16-bit content.
    */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "decodeWav: not a RIFF/WAVE container")
    var pos = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = i32(bytes, pos + 4)
      // Long arithmetic: a declared length near Int.MaxValue must
      // fail THIS require, not int-wrap past it and drive pos
      // negative on the next iteration
      require(len >= 0 && pos.toLong + 8L + len <= bytes.length,
        s"decodeWav: chunk '$id' overruns container")
      if (id == "fmt ") {
        require(len >= 16, s"decodeWav: fmt chunk too short ($len bytes)")
        val fmt = u16(bytes, pos + 8)
        require(fmt == 1, s"decodeWav: only PCM supported, got format tag $fmt")
        channels = u16(bytes, pos + 10)
        sampleRate = i32(bytes, pos + 12)
        bits = u16(bytes, pos + 22)
        require(bits == 16, s"decodeWav: only 16-bit PCM supported, got $bits")
      } else if (id == "data") { dataOff = pos + 8; dataLen = len }
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0, "decodeWav: missing fmt chunk")
    require(dataOff >= 0, "decodeWav: missing data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = u16(bytes, dataOff + i * 2).toShort; i += 1 }
    Wav(sampleRate, channels, samples)
  }

  /** Root-mean-square amplitude of decoded PCM, in micro units of
    * full scale (integer output → deterministic across engines).
    */
  def rmsMicro(w: Wav): Long = {
    if (w.samples.isEmpty) return 0L
    var acc = 0.0
    var i = 0
    while (i < w.samples.length) {
      val s = w.samples(i) / 32768.0; acc += s * s; i += 1
    }
    math.round(math.sqrt(acc / w.samples.length) * 1e6)
  }
}
