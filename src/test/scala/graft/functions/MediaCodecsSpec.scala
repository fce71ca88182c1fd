package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM media codecs: encode→parse round trips for every format,
  * geometry/stat exactness, the BMP stride-padding trap, RIFF chunk
  * walking past extra chunks, and malformed-input rejection. */
class MediaCodecsSpec extends AnyFunSuite {
  import MediaCodecs._

  private def seqBytes(a: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((a + i) & 0xff).toByte)
  private def sumOf(b: Array[Byte]): Long = b.map(x => (x & 0xff).toLong).sum

  test("BMP round trip across every padding phase (width mod 4)") {
    // 3*w mod 4 cycles through 0..3 with w: a stride bug (padding read
    // into the sum, or rows misaligned) breaks at least three of these
    for (w <- 8 to 15; h <- Seq(1, 3, 8)) {
      val px = seqBytes(w * 7, w * h * 3)
      val d = decodeBmp(encodeBmp(w, h, px))
      assert(d.width == w && d.height == h && d.nFrames == 1)
      assert(d.nSamples == w.toLong * h * 3)
      assert(d.sampleSum == sumOf(px), s"w=$w h=$h")
    }
  }

  test("WAV round trip + chunk walk tolerates an extra chunk") {
    val s = seqBytes(200, 777) // wraps past 255
    val d = decodeWav(encodeWav(11000, s))
    assert(d.width == 11000 && d.nSamples == 777 && d.sampleSum == sumOf(s))
    // splice a LIST chunk between fmt and data: parsers that assume
    // data at offset 36 break; a real RIFF walk does not
    val wav = encodeWav(8000, s)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 1, 2, 3, 4)
    val spliced = wav.take(36) ++ extra ++ wav.drop(36)
    // fix the RIFF size field
    val sz = spliced.length - 8
    spliced(4) = (sz & 0xff).toByte
    spliced(5) = ((sz >> 8) & 0xff).toByte
    spliced(6) = ((sz >> 16) & 0xff).toByte
    spliced(7) = ((sz >> 24) & 0xff).toByte
    val d2 = decodeWav(spliced)
    assert(d2.width == 8000 && d2.nSamples == 777 && d2.sampleSum == sumOf(s))
  }

  test("Y4M round trip: multi-frame, frame markers counted not trusted") {
    val (w, h, f) = (12, 9, 5)
    val px = seqBytes(300 % 256, w * h * f)
    val d = decodeY4m(encodeY4m(w, h, f, px))
    assert(d.width == w && d.height == h && d.nFrames == f)
    assert(d.nSamples == w.toLong * h * f && d.sampleSum == sumOf(px))
  }

  test("malformed inputs are rejected, never misparsed") {
    intercept[IllegalArgumentException](decodeBmp("not a bitmap".getBytes))
    intercept[IllegalArgumentException](decodeWav("RIFFxxxx".getBytes))
    intercept[IllegalArgumentException](decodeY4m("YUV4MPEG2".getBytes))
    // truncated pixel data must not read past the array silently
    val bmp = encodeBmp(9, 4, seqBytes(1, 9 * 4 * 3))
    intercept[IllegalArgumentException](decodeBmp(bmp.dropRight(5)))
    val y4m = encodeY4m(4, 4, 2, seqBytes(0, 32))
    intercept[IllegalArgumentException](decodeY4m(y4m.dropRight(1)))
  }

  test("poison payloads THROW, never hang or index out of bounds: " +
    "negative RIFF chunk size, bad BMP offset, absurd Y4M geometry") {
    // negative chunk size used to make the RIFF walk a no-op forever —
    // a poison record would hang the executor instead of routing to DLQ
    val wav = encodeWav(8000, seqBytes(0, 16))
    val negChunk = wav.take(12) ++
      Array[Byte]('J', 'U', 'N', 'K') ++ Array[Byte](-8, -1, -1, -1) ++
      wav.drop(12)
    intercept[IllegalArgumentException](decodeWav(negChunk))
    // pixel-data offset pointing before the header / past the buffer
    val bmp = encodeBmp(8, 2, seqBytes(0, 48))
    val badOff = bmp.clone(); badOff(10) = 1; badOff(11) = 1 // off=65793
    intercept[IllegalArgumentException](decodeBmp(badOff))
    val negOff = bmp.clone(); negOff(13) = -1 // off < 0
    intercept[IllegalArgumentException](decodeBmp(negOff))
    // W*H overflowing Int must fail the geometry check, not misparse
    intercept[IllegalArgumentException](
      decodeY4m("YUV4MPEG2 W100000 H100000 F25:1 Ip A1:1 Cmono\nFRAME\n"
        .getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      decodeY4m("YUV4MPEG2 W-4 H3 F25:1 Ip A1:1 Cmono\nFRAME\n"
        .getBytes("US-ASCII")))
  }

  test("sniffDecode dispatches on magic, rejects unknown containers") {
    assert(Multimodal.sniffDecode(encodeBmp(8, 2, seqBytes(0, 48))).height == 2)
    assert(Multimodal.sniffDecode(encodeWav(9000, seqBytes(0, 10))).width == 9000)
    assert(Multimodal.sniffDecode(encodeY4m(4, 4, 3, seqBytes(0, 48))).nFrames == 3)
    intercept[IllegalArgumentException](
      Multimodal.sniffDecode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)))
  }
}
