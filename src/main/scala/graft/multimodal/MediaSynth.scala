package graft.multimodal

import java.io.ByteArrayOutputStream

/** Deterministic media-file generators: byte-valid BMP (24-bit BI_RGB,
  * incl. padded strides and top-down negative-height variants), WAV
  * (16-bit PCM, chunk order exercised with a leading JUNK chunk), and
  * PNG (8-bit RGB, zlib-deflated, row filter cycling through all five
  * spec types) whose pixel/sample values follow closed-form formulas of
  * (id, x, y) / (id, j) — so an independent oracle can recompute the
  * decoded statistics from the formulas alone, without parsing a byte.
  * Used by the q58/q58b end-to-end payload-decode oracles and the codec
  * specs.
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

  def pngWidth(id: Long): Int = (4 + id % 6).toInt
  def pngHeight(id: Long): Int = (5 + id % 5).toInt // ≥5 rows: filters 0-4 all appear

  /** Standard-conforming PNG: 8-bit RGB (color type 2), zlib-deflated
    * scanlines, row `y` filtered with type `y % 5` — so a decoder must
    * implement ALL FIVE filters (None/Sub/Up/Average/Paeth) correctly to
    * reproduce the closed-form pixel values. Same channel formulas as
    * [[bmp]]; dimensions differ so a mixed corpus distinguishes them. */
  def png(id: Long): Array[Byte] = {
    val w = pngWidth(id); val h = pngHeight(id)
    val bpp = 3; val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // all-zero virtual row above y=0, per spec
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        cur(3 * x) = red(id, x, y); cur(3 * x + 1) = green(id, x, y)
        cur(3 * x + 2) = blue(id, x, y)
        x += 1
      }
      val ft = y % 5
      val off = (stride + 1) * y
      raw(off) = ft.toByte
      var i = 0
      while (i < stride) {
        val v = cur(i)
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val enc = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) / 2)
          case 4 => v - HeaderCodec.paeth(a, b, c)
        }
        raw(off + 1 + i) = (enc & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = deflater.deflate(zbuf)
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb); out.write(data); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IDAT", zbuf.take(zlen))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** GIF palette/index formulas — mirrored in the q58c oracle SQL. The
    * pixel at (x, y) is palette entry `gifIndex`, whose RGB comes from
    * the pal* formulas, so decoded stats are closed-form in (id, x, y). */
  def gifIndex(id: Long, x: Int, y: Int): Int = ((id * 5 + 7 * x + 11 * y) % 256).toInt
  def palR(id: Long, i: Int): Int = ((id * 3 + 5 * i) % 256).toInt
  def palG(id: Long, i: Int): Int = ((id * 7 + 3 * i) % 256).toInt
  def palB(id: Long, i: Int): Int = ((id * 11 + 9 * i) % 256).toInt

  def gifWidth(id: Long): Int = (14 + id % 10).toInt
  // most size classes exceed ~255 pixels, where dictionary growth pushes
  // the LZW code width past 9 bits (the smallest, e.g. 14×12, stay at 9 —
  // so the corpus covers both regimes)
  def gifHeight(id: Long): Int = (12 + id % 8).toInt

  /** Standard-conforming GIF89a: 256-entry global color table from the
    * pal* formulas, one non-interlaced image whose indices follow
    * [[gifIndex]], REAL variable-width LZW compression (clear code,
    * dictionary growth, code-width bumps — the low-repetition index
    * pattern pushes past 9-bit codes on every file). javax.imageio
    * decodes these byte-identically (HeaderCodecSpec cross-checks). */
  def gif(id: Long): Array[Byte] = {
    val w = gifWidth(id); val h = gifHeight(id)
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(out, w); le16(out, h)
    out.write(0xf7) // global table, 8-bit color resolution, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var i = 0
    while (i < 256) {
      out.write(palR(id, i)); out.write(palG(id, i)); out.write(palB(id, i))
      i += 1
    }
    out.write(0x2c) // image descriptor
    le16(out, 0); le16(out, 0); le16(out, w); le16(out, h)
    out.write(0) // no local table, not interlaced
    val minCode = 8
    out.write(minCode)

    // GIF LZW: emit codes LSB-first at the current width; the dictionary
    // adds (prefix, byte) after each emit and the width bumps exactly
    // when the next free code no longer fits — mirrored in decodeGif.
    val clear = 1 << minCode; val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Long, Integer]()
    val codes = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) { codes.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    emit(clear)
    var cur = gifIndex(id, 0, 0)
    var p = 1
    val total = w * h
    while (p < total) {
      val k = gifIndex(id, p % w, p / w)
      val key = cur.toLong << 12 | k
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (next < 4096) {
          dict.put(key, next); next += 1
          if (next == (1 << width) && width < 12) width += 1
        } else { // table full: clear and restart (not reached by these sizes)
          emit(clear); dict.clear(); next = eoi + 1; width = minCode + 1
        }
        cur = k
      }
      p += 1
    }
    emit(cur); emit(eoi)
    if (bitCnt > 0) codes.write((bitBuf & 0xff).toInt)
    val data = codes.toByteArray
    var off = 0
    while (off < data.length) { // sub-blocks of at most 255 bytes
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
