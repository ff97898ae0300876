package graft.multimodal

/** REAL metadata decode for self-describing media containers — pure
  * byte parsing, no codec libraries: PNG (IHDR), BMP (info header), GIF
  * (logical screen descriptor), WAV (RIFF fmt chunk walk), JPEG (SOF
  * marker walk). Pixel/sample DECODING of compressed payloads still
  * needs real codec libraries (absent in this environment) and falls
  * back to [[Multimodal.FakeCodec]]; header metadata — the part a corpus
  * pipeline filters and buckets on (dimensions, channels, sample rate)
  * — is parsed for real here.
  */
object HeaderCodec {

  /** Parsed container metadata; audio fields are 0 for images and vice
    * versa. */
  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, sampleRate: Int, bitDepth: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b.slice(i, i + n), "US-ASCII")

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Sniff the container and parse its header; None for unrecognized or
    * truncated payloads. */
  def sniff(b: Array[Byte]): Option[MediaMeta] = {
    if (b.length >= 33 && b.take(8).sameElements(PngSig) &&
        ascii(b, 12, 4) == "IHDR")
      Some(MediaMeta("png", be32(b, 16), be32(b, 20), 0, 0, u8(b, 24)))
    else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M')
      Some(MediaMeta("bmp", le32(b, 18), math.abs(le32(b, 22)), 0, 0, le16(b, 28)))
    else if (b.length >= 10 &&
        (ascii(b, 0, 6) == "GIF87a" || ascii(b, 0, 6) == "GIF89a"))
      Some(MediaMeta("gif", le16(b, 6), le16(b, 8), 0, 0, 0))
    else if (b.length >= 12 && ascii(b, 0, 4) == "RIFF" &&
        ascii(b, 8, 4) == "WAVE")
      sniffWav(b)
    else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
      sniffJpeg(b)
    else None
  }

  /** Walk RIFF chunks to the `fmt ` chunk (not assumed first). */
  private def sniffWav(b: Array[Byte]): Option[MediaMeta] = {
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length)
        return Some(MediaMeta("wav", 0, 0,
          channels = le16(b, i + 10), sampleRate = le32(b, i + 12),
          bitDepth = le16(b, i + 22)))
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Per-channel pixel statistics from an uncompressed 24-bit BMP — the
    * payload-decode step that needs NO codec library, just byte math. */
  final case class PixelStats(width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long, minV: Int, maxV: Int)

  /** Decode an uncompressed (BI_RGB) 24-bit BMP pixel array: row stride
    * padded to 4 bytes, |height| rows (negative height = top-down, which
    * stats are invariant to). Anything else (other depths, compressed,
    * truncated) returns None. */
  def decodeBmp(b: Array[Byte]): Option[PixelStats] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val width = le32(b, 18)
    val height = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (bpp != 24 || compression != 0 || width <= 0 || height == 0) return None
    val rowSize = ((bpp * width + 31) / 32) * 4
    if (dataOff < 54 || dataOff.toLong + rowSize.toLong * height > b.length) return None
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var minV = 255; var maxV = 0
    var y = 0
    while (y < height) {
      val base = dataOff + y * rowSize
      var x = 0
      while (x < width) {
        val bb = u8(b, base + 3 * x)
        val gg = u8(b, base + 3 * x + 1)
        val rr = u8(b, base + 3 * x + 2)
        sumB += bb; sumG += gg; sumR += rr
        val lo = math.min(bb, math.min(gg, rr))
        val hi = math.max(bb, math.max(gg, rr))
        if (lo < minV) minV = lo
        if (hi > maxV) maxV = hi
        x += 1
      }
      y += 1
    }
    Some(PixelStats(width, height, sumR, sumG, sumB, minV, maxV))
  }

  /** Sample statistics from 16-bit PCM WAV data — the audio payload
    * decode that is pure byte math. */
  final case class PcmStats(channels: Int, sampleRate: Int, nSamples: Long,
      sumSamples: Long, minSample: Int, maxSample: Int)

  /** Decode 16-bit PCM (audioFormat 1) samples from the `data` chunk,
    * walking RIFF chunks for both `fmt ` and `data` (neither assumed
    * first). Other formats/depths or truncation return None. */
  def decodeWav(b: Array[Byte]): Option[PcmStats] = {
    if (b.length < 12 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE")
      return None
    var channels = -1; var rate = -1; var fmtOk = false
    var dataOff = -1; var dataLen = -1
    var i = 12
    while (i + 8 <= b.length) {
      val id = ascii(b, i, 4)
      val size = le32(b, i + 4)
      if (size < 0) return None
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        fmtOk = le16(b, i + 8) == 1 && le16(b, i + 22) == 16 // PCM, 16-bit
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
      } else if (id == "data") {
        dataOff = i + 8; dataLen = size
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || dataOff.toLong + dataLen > b.length) return None
    val n = dataLen / 2
    var sum = 0L; var minS = 32767; var maxS = -32768
    var j = 0
    while (j < n) {
      val s = (le16(b, dataOff + 2 * j) << 16) >> 16 // sign-extend
      sum += s
      if (s < minS) minS = s
      if (s > maxS) maxS = s
      j += 1
    }
    Some(PcmStats(channels, rate, n.toLong, sum, minS, maxS))
  }

  /** Walk JPEG markers to the first SOF0/SOF2 frame header. Consecutive
    * 0xFF bytes before a marker are fill/padding (ITU T.81 B.1.1.2) and
    * are skipped; TEM (0x01) and RSTn/SOI/EOI are standalone markers
    * with no length field. Truncation anywhere returns None (stub
    * fallback) rather than reading past the array. */
  private def sniffJpeg(b: Array[Byte]): Option[MediaMeta] = {
    var i = 2
    while (i + 1 < b.length && u8(b, i) == 0xff) {
      // skip 0xFF fill bytes: the marker code is the first non-FF byte
      while (i + 1 < b.length && u8(b, i + 1) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val marker = u8(b, i + 1)
      if (marker == 0xc0 || marker == 0xc2) {
        if (i + 10 > b.length) return None // channels byte is at i+9
        return Some(MediaMeta("jpeg", be16(b, i + 7), be16(b, i + 5),
          channels = u8(b, i + 9), sampleRate = 0, bitDepth = u8(b, i + 4)))
      }
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
      else {
        if (i + 4 > b.length) return None
        i += 2 + be16(b, i + 2)
      }
    }
    None
  }
}
