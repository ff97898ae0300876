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
