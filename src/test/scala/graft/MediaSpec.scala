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
