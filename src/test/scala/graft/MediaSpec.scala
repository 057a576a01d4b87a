package graft

import graft.ops.Media
import org.scalatest.funsuite.AnyFunSuite

/** Pure codec tests — no Spark needed: the decoders must be real
  * parsers (round-trip exactness, layout details like row padding and
  * bottom-up storage, chunk walking) and must REJECT malformed or
  * unsupported input instead of producing garbage features.
  */
class MediaSpec extends AnyFunSuite {

  test("BMP round-trip: exact pixels through padded bottom-up storage") {
    // width 3 -> 9-byte rows padded to 12 on disk: exercises padding
    val rgb = (0 until 3 * 2 * 3).map(i => (i * 7 % 251).toByte).toArray
    val bytes = Media.encodeBmp(3, 2, rgb)
    assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
    assert(bytes.length === 54 + 12 * 2) // header + 2 padded rows
    val img = Media.decodeBmp(bytes)
    assert((img.width, img.height) === ((3, 2)))
    assert(img.rgb.toSeq === rgb.toSeq)
  }

  test("BMP decode: top-down (negative height) images parse too") {
    // 1-row image: bottom-up and top-down layouts coincide, so we can
    // flip the stored height sign and expect identical pixels
    val rgb = Array.tabulate(4 * 1 * 3)(i => i.toByte)
    val bytes = Media.encodeBmp(4, 1, rgb)
    val topDown = bytes.clone()
    topDown(22) = 0xFF.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte // height = -1
    val img = Media.decodeBmp(topDown)
    assert((img.width, img.height) === ((4, 1)))
    assert(img.rgb.toSeq === rgb.toSeq)
  }

  test("BMP decode rejects non-BMP, non-24-bit, compressed, truncated") {
    intercept[IllegalArgumentException](Media.decodeBmp(Array.fill(60)(1.toByte)))
    val ok = Media.encodeBmp(2, 2, new Array[Byte](12))
    val bad8bpp = ok.clone(); bad8bpp(28) = 8
    intercept[IllegalArgumentException](Media.decodeBmp(bad8bpp))
    val badRle = ok.clone(); badRle(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Media.decodeBmp(badRle))
    intercept[IllegalArgumentException](Media.decodeBmp(ok.take(56)))
  }

  test("BMP resize: nearest-neighbor downsample picks source pixels") {
    // 4x4 image with distinct per-pixel values, downsample to 2x2 ->
    // picks pixels (0,0),(2,0),(0,2),(2,2)
    val rgb = Array.tabulate(4 * 4 * 3)(_.toByte)
    val img = Media.Bmp(4, 4, rgb)
    val small = Media.resize(img, 2, 2)
    def px(i: Media.Bmp, x: Int, y: Int) =
      i.rgb.slice((y * i.width + x) * 3, (y * i.width + x) * 3 + 3).toSeq
    assert(px(small, 0, 0) === px(img, 0, 0))
    assert(px(small, 1, 0) === px(img, 2, 0))
    assert(px(small, 0, 1) === px(img, 0, 2))
    assert(px(small, 1, 1) === px(img, 2, 2))
  }

  test("PNG round-trip via ImageIO: exact pixels, dims preserved") {
    val rgb = (0 until 5 * 3 * 3).map(i => (i * 11 % 251).toByte).toArray
    val bytes = Media.encodeImage("png", 5, 3, rgb)
    // real PNG magic
    assert((bytes(0) & 0xFF) === 0x89 && bytes(1) === 'P'.toByte &&
      bytes(2) === 'N'.toByte && bytes(3) === 'G'.toByte)
    val img = Media.decodeImage(bytes)
    assert((img.width, img.height) === ((5, 3)))
    assert(img.rgb.toSeq === rgb.toSeq) // PNG is lossless
    // and the shared pixel form means resize works on it unchanged
    val half = Media.resize(img, 2, 1)
    assert((half.width, half.height) === ((2, 1)))
  }

  test("JPEG round-trip via ImageIO: dims exact, pixels within lossy tolerance") {
    // a smooth gradient (JPEG's best case) — mean per-channel error
    // must stay small; exactness is NOT expected, JPEG is lossy
    val w = 16; val h = 16
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      rgb(d) = (x * 16).toByte; rgb(d + 1) = (y * 16).toByte; rgb(d + 2) = 64.toByte
    }
    val bytes = Media.encodeImage("jpg", w, h, rgb)
    // JFIF/EXIF SOI marker
    assert((bytes(0) & 0xFF) === 0xFF && (bytes(1) & 0xFF) === 0xD8)
    val img = Media.decodeImage(bytes)
    assert((img.width, img.height) === ((w, h)))
    val meanErr = img.rgb.indices.map(i =>
      math.abs((img.rgb(i) & 0xFF) - (rgb(i) & 0xFF))).sum.toDouble / rgb.length
    assert(meanErr < 16.0, s"JPEG mean per-channel error $meanErr too large")
  }

  test("decodeImage rejects undecodable bytes and unknown writer names fail loudly") {
    intercept[IllegalArgumentException](
      Media.decodeImage(Array.fill(64)(42.toByte)))
    intercept[IllegalArgumentException](
      Media.encodeImage("not-a-format", 2, 2, new Array[Byte](12)))
    intercept[IllegalArgumentException](
      Media.encodeImage("png", 2, 2, new Array[Byte](11))) // wrong length
  }

  test("GMJV video round-trip: frame count, dims, exact pixels per frame") {
    val frames = (0 until 4).map { f =>
      Media.Bmp(3, 2, Array.tabulate(3 * 2 * 3)(i => ((i + f * 7) % 251).toByte))
    }
    val bytes = Media.encodeVideo(frames)
    assert(bytes(0) === 'G'.toByte && bytes(3) === 'V'.toByte)
    val back = Media.decodeVideo(bytes)
    assert(back.size === 4)
    back.zip(frames).foreach { case (b, f) =>
      assert((b.width, b.height) === ((f.width, f.height)))
      assert(b.rgb.toSeq === f.rgb.toSeq) // PNG frames are lossless
    }
  }

  test("GMJV decode rejects bad magic, truncated frame table, overrunning payload") {
    intercept[IllegalArgumentException](
      Media.decodeVideo(Array.fill(16)(9.toByte)))
    val ok = Media.encodeVideo(Seq(Media.Bmp(2, 2, new Array[Byte](12))))
    // truncate mid-payload: the declared length overruns the buffer
    intercept[IllegalArgumentException](
      Media.decodeVideo(ok.take(ok.length - 3)))
    // frame-count says 2 but only one frame follows
    val lying = ok.clone(); lying(5) = 2
    intercept[IllegalArgumentException](Media.decodeVideo(lying))
  }

  test("WAV round-trip: rate, channels, exact samples") {
    val samples = Array.tabulate(200)(i =>
      (math.sin(i * 2 * math.Pi / 40) * 16384).toShort)
    val bytes = Media.encodeWav(8000, 1, samples)
    assert(bytes.length === 44 + 400)
    val w = Media.decodeWav(bytes)
    assert((w.sampleRate, w.channels) === ((8000, 1)))
    assert(w.samples.toSeq === samples.toSeq)
    // RMS of a full-cycle sine at half scale ~ 0.5/sqrt(2) = 0.3535
    assert(math.abs(Media.rmsMicro(w) - 353553L) < 2000)
  }

  test("WAV decode: chunk walk skips a LIST chunk before data") {
    val samples = Array[Short](100, -100, 2000, -2000)
    val plain = Media.encodeWav(44100, 2, samples)
    // splice an 8-byte LIST chunk between fmt and data
    val listChunk = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = plain.take(36) ++ listChunk ++ plain.drop(36)
    // fix the RIFF size field
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xFF).toByte; spliced(5) = ((sz >> 8) & 0xFF).toByte
    spliced(6) = ((sz >> 16) & 0xFF).toByte; spliced(7) = ((sz >> 24) & 0xFF).toByte
    val w = Media.decodeWav(spliced)
    assert((w.sampleRate, w.channels) === ((44100, 2)))
    assert(w.samples.toSeq === samples.toSeq)
  }

  test("WAV decode rejects non-RIFF, non-PCM, overrunning chunks") {
    intercept[IllegalArgumentException](Media.decodeWav(Array.fill(50)(7.toByte)))
    val ok = Media.encodeWav(8000, 1, Array[Short](1, 2, 3))
    val badFmt = ok.clone(); badFmt(20) = 3 // IEEE float format tag
    intercept[IllegalArgumentException](Media.decodeWav(badFmt))
    intercept[IllegalArgumentException](Media.decodeWav(ok.take(46)))
  }
}
