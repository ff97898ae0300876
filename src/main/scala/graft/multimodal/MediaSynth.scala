package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic media-file generators: byte-valid BMP (24-bit BI_RGB,
  * incl. padded strides and top-down negative-height variants) and WAV
  * (16-bit PCM, chunk order exercised with a leading JUNK chunk) whose
  * pixel/sample values follow closed-form formulas of (id, x, y) /
  * (id, j) — so an independent oracle can recompute the decoded
  * statistics from the formulas alone, without parsing a byte.
  * Used by q58's end-to-end payload-decode oracle and the codec specs.
  */
object MediaSynth {

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }

  /** Pixel formulas (one per channel) — mirrored in the q58 oracle SQL. */
  def red(id: Long, x: Int, y: Int): Int = ((id * 13 + 5 * x + y) % 256).toInt
  def green(id: Long, x: Int, y: Int): Int = ((id * 11 + x + 2 * y) % 256).toInt
  def blue(id: Long, x: Int, y: Int): Int = ((id * 7 + 3 * x + 5 * y) % 256).toInt

  def bmpWidth(id: Long): Int = (4 + id % 5).toInt
  def bmpHeight(id: Long): Int = (3 + id % 4).toInt

  /** 24-bit uncompressed BMP; every 10th id stores a negative (top-down)
    * height. Stride padding varies with width (4..8 → 0..3 pad bytes). */
  def bmp(id: Long): Array[Byte] = {
    val w = bmpWidth(id); val h = bmpHeight(id)
    val rowSize = ((24 * w + 31) / 32) * 4
    val dataSize = rowSize * h
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    le32(out, 54 + dataSize); le32(out, 0); le32(out, 54) // file header
    le32(out, 40); le32(out, w)
    le32(out, if (id % 10 == 0) -h else h)                // BITMAPINFOHEADER
    le16(out, 1); le16(out, 24); le32(out, 0); le32(out, dataSize)
    le32(out, 2835); le32(out, 2835); le32(out, 0); le32(out, 0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.write(blue(id, x, y)); out.write(green(id, x, y)); out.write(red(id, x, y))
        x += 1
      }
      var pad = rowSize - 3 * w
      while (pad > 0) { out.write(0); pad -= 1 }
      y += 1
    }
    out.toByteArray
  }

  /** Sample formula — mirrored in the q58 oracle SQL. */
  def sample(id: Long, j: Int): Int = (((id * 31 + j * 17) % 65536) - 32768).toInt

  def wavChannels(id: Long): Int = (1 + id % 2).toInt
  def wavRate(id: Long): Int = (8000 + id % 1000).toInt
  def wavSamples(id: Long): Int = ((50 + id % 60) * wavChannels(id)).toInt

  /** 16-bit PCM WAV with a JUNK chunk before `fmt ` (chunk-walk path). */
  def wav(id: Long): Array[Byte] = {
    val ch = wavChannels(id); val rate = wavRate(id); val n = wavSamples(id)
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); le32(out, 4 + 12 + 24 + 8 + 2 * n)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("JUNK".getBytes("US-ASCII")); le32(out, 4); le32(out, 0)
    out.write("fmt ".getBytes("US-ASCII")); le32(out, 16)
    le16(out, 1); le16(out, ch); le32(out, rate)
    le32(out, rate * ch * 2); le16(out, ch * 2); le16(out, 16)
    out.write("data".getBytes("US-ASCII")); le32(out, 2 * n)
    var j = 0
    while (j < n) { le16(out, sample(id, j) & 0xffff); j += 1 }
    out.toByteArray
  }

  /** Even ids are BMPs, odd ids are WAVs. */
  def payload(id: Long): Array[Byte] = if (id % 2 == 0) bmp(id) else wav(id)
}
