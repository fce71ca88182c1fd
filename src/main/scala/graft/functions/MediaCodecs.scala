package graft.functions

/** Pure-JVM codecs for three PUBLIC container formats — the real
  * replacement for the former multimodal codec stub (no image/audio
  * libraries exist in this environment, but these formats need none:
  * they are fixed-layout headers over raw samples).
  *
  *   - BMP: Windows bitmap, BITMAPINFOHEADER, uncompressed 24-bit
  *     bottom-up rows with 4-byte row padding (the classic stride
  *     trap — a decoder that ignores padding reads garbage).
  *   - WAV: RIFF/WAVE, 8-bit unsigned PCM mono (fmt + data chunks;
  *     the decoder walks chunks, so extra chunks don't break it).
  *   - Y4M: YUV4MPEG2 (mjpegtools), Cmono planar — a plain-text
  *     stream header plus one `FRAME\n` marker per frame of W*H luma
  *     bytes; the only multi-frame format that is practical to parse
  *     with zero native deps.
  *
  * Decoders PARSE the real layout (magic, header fields, chunk walk,
  * row stride) and return the sample stream's exact integer sum along
  * with the declared geometry — so an encode→decode round trip checks
  * every offset: a one-byte header error or a stride bug shifts the
  * sum and fails the oracle hash. Malformed input throws
  * IllegalArgumentException (callers route it like any poison record).
  */
object MediaCodecs {

  /** Decoded geometry + exact sample statistics: `nSamples` raw
    * samples (pixels bytes / PCM samples / luma bytes) summing to
    * `sampleSum` (unsigned byte values, exact). */
  final case class Decoded(width: Int, height: Int, nFrames: Int,
                           nSamples: Long, sampleSum: Long)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  // ---- little-endian helpers ----------------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ---- BMP (24-bit uncompressed, BITMAPINFOHEADER) -------------------

  /** Encode w*h*3 channel bytes (row-major top-down, BGR order within
    * a pixel) as a bottom-up 24-bit BMP with standard row padding. */
  def encodeBmp(width: Int, height: Int, samples: Array[Byte]): Array[Byte] = {
    require(samples.length == width * height * 3,
      s"need ${width * height * 3} channel bytes, got ${samples.length}")
    val stride = (width * 3 + 3) / 4 * 4
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out.length).copyToArray(out, 2)
    le32(54).copyToArray(out, 10) // pixel data offset
    le32(40).copyToArray(out, 14) // BITMAPINFOHEADER size
    le32(width).copyToArray(out, 18)
    le32(height).copyToArray(out, 22) // positive = bottom-up
    le16(1).copyToArray(out, 26) // planes
    le16(24).copyToArray(out, 28) // bpp
    le32(0).copyToArray(out, 30) // BI_RGB
    le32(dataSize).copyToArray(out, 34)
    var row = 0
    while (row < height) {
      // bottom-up: logical row `row` lands at physical slot from the end
      val dst = 54 + (height - 1 - row) * stride
      System.arraycopy(samples, row * width * 3, out, dst, width * 3)
      row += 1 // padding bytes stay zero
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP; sum skips the padding bytes.
    * Every header field is range-checked BEFORE use — malformed input
    * must throw IllegalArgumentException (the DLQ contract), never
    * hang, index out of bounds, or overflow into garbage stats. */
  def decodeBmp(b: Array[Byte]): Decoded = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') fail("not a BMP")
    val off = rdLe32(b, 10)
    val width = rdLe32(b, 18)
    val height = rdLe32(b, 22)
    if (rdLe16(b, 28) != 24) fail(s"unsupported bpp ${rdLe16(b, 28)}")
    if (rdLe32(b, 30) != 0) fail("compressed BMP unsupported")
    if (width <= 0 || height <= 0) fail("top-down/empty BMP unsupported")
    if (off < 54 || off > b.length) fail(s"bad pixel-data offset $off")
    if (width > (Int.MaxValue - 3) / 3) fail(s"absurd BMP width $width")
    val stride = (width * 3 + 3) / 4 * 4
    if (off.toLong + stride.toLong * height > b.length) fail("truncated BMP")
    var sum = 0L
    var row = 0
    while (row < height) {
      val base = off + row * stride
      var i = 0
      while (i < width * 3) { sum += b(base + i) & 0xff; i += 1 }
      row += 1
    }
    Decoded(width, height, 1, width.toLong * height * 3, sum)
  }

  // ---- WAV (RIFF, 8-bit unsigned PCM mono) ----------------------------

  def encodeWav(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val out = new Array[Byte](44 + n)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(36 + n).copyToArray(out, 4)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(16).copyToArray(out, 16) // fmt chunk size
    le16(1).copyToArray(out, 20) // PCM
    le16(1).copyToArray(out, 22) // mono
    le32(sampleRate).copyToArray(out, 24)
    le32(sampleRate).copyToArray(out, 28) // byte rate (8-bit mono)
    le16(1).copyToArray(out, 32) // block align
    le16(8).copyToArray(out, 34) // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    le32(n).copyToArray(out, 40)
    samples.copyToArray(out, 44)
    out
  }

  /** Chunk-walking RIFF parse; returns (1, nSamples) geometry with the
    * sample rate in `width` so the caller sees a real decoded field. */
  def decodeWav(b: Array[Byte]): Decoded = {
    def tag(off: Int) = new String(b, off, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") fail("not WAV")
    var pos = 12
    var rate = -1
    var bits = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val id = tag(pos)
      val sz = rdLe32(b, pos + 4)
      // a negative/garbage size would stall or reverse the walk — a
      // poison payload must THROW (the DLQ contract), never hang
      if (sz < 0 || pos.toLong + 8 + sz > b.length)
        fail(s"bad RIFF chunk size $sz at $pos")
      if (id == "fmt ") {
        if (sz < 16) fail(s"short fmt chunk ($sz)")
        if (rdLe16(b, pos + 8) != 1) fail("non-PCM WAV unsupported")
        channels = rdLe16(b, pos + 10)
        rate = rdLe32(b, pos + 12)
        bits = rdLe16(b, pos + 22)
      } else if (id == "data") { dataOff = pos + 8; dataLen = sz }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0) fail("missing fmt/data chunk")
    if (bits != 8 || channels != 1) fail(s"unsupported PCM layout")
    if (rate <= 0) fail(s"bad sample rate $rate")
    if (dataOff.toLong + dataLen > b.length) fail("truncated WAV")
    var sum = 0L
    var i = 0
    while (i < dataLen) { sum += b(dataOff + i) & 0xff; i += 1 }
    Decoded(rate, 1, 1, dataLen.toLong, sum)
  }

  // ---- Y4M (YUV4MPEG2, Cmono) ----------------------------------------

  def encodeY4m(width: Int, height: Int, frames: Int,
                samples: Array[Byte]): Array[Byte] = {
    require(samples.length == width * height * frames,
      s"need ${width * height * frames} luma bytes")
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val fsz = width * height
    val out = new Array[Byte](header.length + frames * (marker.length + fsz))
    header.copyToArray(out, 0)
    var f = 0
    var pos = header.length
    while (f < frames) {
      marker.copyToArray(out, pos)
      System.arraycopy(samples, f * fsz, out, pos + marker.length, fsz)
      pos += marker.length + fsz
      f += 1
    }
    out
  }

  def decodeY4m(b: Array[Byte]): Decoded = {
    val nl = b.indexOf('\n'.toByte)
    if (nl < 0) fail("no Y4M stream header")
    val header = new String(b, 0, nl, "US-ASCII")
    if (!header.startsWith("YUV4MPEG2")) fail("not Y4M")
    val params = header.split(' ').drop(1)
    def param(p: Char): Option[String] =
      params.find(_.headOption.contains(p)).map(_.tail)
    val width = param('W').flatMap(_.toIntOption)
      .getOrElse(fail("Y4M missing/bad W"))
    val height = param('H').flatMap(_.toIntOption)
      .getOrElse(fail("Y4M missing/bad H"))
    if (!param('C').forall(_ == "mono")) fail("only Cmono supported")
    if (width <= 0 || height <= 0 ||
      width.toLong * height > Int.MaxValue - 8)
      fail(s"bad Y4M geometry ${width}x$height")
    val fsz = width * height
    var pos = nl + 1
    var frames = 0
    var sum = 0L
    while (pos < b.length) {
      // frame header is FRAME plus optional parameters up to \n
      if (pos + 5 > b.length ||
        new String(b, pos, 5, "US-ASCII") != "FRAME") fail("bad FRAME marker")
      var e = pos + 5
      while (e < b.length && b(e) != '\n') e += 1
      if (e >= b.length || e.toLong + 1 + fsz > b.length)
        fail("truncated frame")
      var i = 0
      while (i < fsz) { sum += b(e + 1 + i) & 0xff; i += 1 }
      pos = e + 1 + fsz
      frames += 1
    }
    if (frames == 0) fail("zero frames")
    Decoded(width, height, frames, frames.toLong * fsz, sum)
  }
}
