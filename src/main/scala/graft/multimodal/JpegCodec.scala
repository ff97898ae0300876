package graft.multimodal

/** Baseline sequential JPEG decode in pure JVM byte math — the last
  * image format that previously fell to the deterministic stub. Scope
  * (ITU T.81 baseline): 8-bit precision, Huffman entropy coding (DHT
  * canonical tables), 1- or 3-component scans, sampling factors 1 or 2
  * (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn), multi-segment
  * DQT/DHT, APPn/COM skipping, 0xFF00 byte stuffing. Progressive
  * (SOF2), arithmetic coding, 12-bit, and hierarchical modes return
  * None (stub fallback) — as does truncation or corruption anywhere.
  *
  * Forged-header allocation safety mirrors decodePng/decodeGif: the
  * SOF-claimed pixel count is attacker-controlled, so it is capped by a
  * maximum plausible expansion of the actual entropy-data length before
  * any plane allocates (a DC-only block is ≥ 2 bits for 64 pixels, so
  * 2048 px/byte is already generous).
  *
  * Output is the orientation-true [[HeaderCodec.Pixels]]; grayscale
  * decodes to r=g=b, color through the JFIF YCbCr→RGB transform.
  */
object JpegCodec {

  /** Zigzag scan order: zigzag sequence index → natural (row*8+col). */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cosTable(u)(x) = C(u)/2 * cos((2x+1)uπ/16); IDCT is then
  // out(x,y) = ΣuΣv cos(u)(x) cos(v)(y) F(u,v) with no extra scaling
  private val CosTable: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  private final class Huff(counts: Array[Int], vals: Array[Byte]) {
    // canonical code assignment (T.81 C.2): firstCode/firstVal per length
    private val firstCode = new Array[Int](17)
    private val firstVal = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var len = 1
      while (len <= 16) {
        firstCode(len) = code; firstVal(len) = k
        code += counts(len - 1); k += counts(len - 1)
        code <<= 1
        len += 1
      }
    }
    /** Decode one symbol; -1 on corrupt stream / end of data. */
    def decode(br: BitReader): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        val bit = br.nextBit()
        if (bit < 0) return -1
        code = (code << 1) | bit
        len += 1
        val idx = code - firstCode(len)
        if (idx >= 0 && idx < counts(len - 1))
          return vals(firstVal(len) + idx) & 0xff
      }
      -1
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: un-stuffs
    * 0xFF00, stops (and records) at any real marker. */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var cur = 0
    private var cnt = 0
    var marker: Int = -1 // pending marker code once the segment ends
    def bytePos: Int = pos
    def nextBit(): Int = {
      if (cnt == 0) {
        if (marker >= 0 || pos >= b.length) return -1
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { marker = 0xd9; return -1 }
          val m = b(pos + 1) & 0xff
          if (m == 0x00) { pos += 2; cur = 0xff; cnt = 8 } // stuffed literal FF
          else { marker = m; return -1 }
        } else { pos += 1; cur = v; cnt = 8 }
      }
      cnt -= 1
      (cur >> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) {
        val bit = nextBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    /** Byte-align (dropping pad bits), consume the RSTn marker expected
      * at an interval boundary, and resume; false if it is absent. */
    def restart(): Boolean = {
      cnt = 0 // discard the interval's 1-padding to the byte boundary
      if (marker < 0) {
        if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
        marker = b(pos + 1) & 0xff
      }
      if (marker < 0xd0 || marker > 0xd7) return false
      pos += 2; marker = -1; cur = 0
      true
    }
    /** True iff the next marker after byte-aligning is EOI — the
      * fail-closed truncation check after the last MCU. */
    def atEoi(): Boolean = {
      cnt = 0
      if (marker < 0) {
        if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
        marker = b(pos + 1) & 0xff
      }
      marker == 0xd9
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0
    var plane: Array[Byte] = null
    var planeW = 0; var planeH = 0
    var dcPred = 0
  }

  def decodeJpegPixels(b: Array[Byte]): Option[HeaderCodec.Pixels] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var i = 2
    var sos = -1
    while (sos < 0) {
      if (i + 4 > b.length) return None
      if (u8(b, i) != 0xff) return None
      var marker = u8(b, i + 1)
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) } // fill bytes
      // re-check after fill-byte skipping: a 0xFF run ending near EOF
      // would otherwise read a length field past the buffer (fuzz-caught)
      if (i + 4 > b.length) return None
      val segStart = i + 2
      marker match {
        case 0xd8 => i += 2 // stray SOI
        case 0xdb => // DQT: one or more tables in the segment
          val len = be16(b, segStart)
          var p = segStart + 2
          val end = segStart + len
          if (end > b.length) return None
          while (p < end) {
            val pq = u8(b, p) >> 4; val tq = u8(b, p) & 15
            if (tq > 3 || pq > 1) return None
            val n = if (pq == 0) 64 else 128
            if (p + 1 + n > end) return None
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) {
              t(k) = if (pq == 0) u8(b, p + 1 + k) else be16(b, p + 1 + 2 * k)
              k += 1
            }
            qt(tq) = t
            p += 1 + n
          }
          i = end
        case 0xc4 => // DHT: one or more tables
          val len = be16(b, segStart)
          var p = segStart + 2
          val end = segStart + len
          if (end > b.length) return None
          while (p < end) {
            val tc = u8(b, p) >> 4; val th = u8(b, p) & 15
            if (tc > 1 || th > 3 || p + 17 > end) return None
            val counts = Array.tabulate(16)(k => u8(b, p + 1 + k))
            val total = counts.sum
            if (total > 256 || p + 17 + total > end) return None
            val vals = b.slice(p + 17, p + 17 + total)
            val h = new Huff(counts, vals)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            p += 17 + total
          }
          i = end
        case 0xc0 => // SOF0 baseline
          val len = be16(b, segStart)
          if (segStart + len > b.length || len < 8) return None
          val precision = u8(b, segStart + 2)
          height = be16(b, segStart + 3); width = be16(b, segStart + 5)
          val nc = u8(b, segStart + 7)
          if (precision != 8 || width <= 0 || height <= 0) return None
          if (nc != 1 && nc != 3) return None
          if (len < 8 + 3 * nc) return None
          comps = Array.tabulate(nc) { c =>
            val o = segStart + 8 + 3 * c
            val comp = Component(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 15,
              u8(b, o + 2))
            if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2 ||
                comp.tq > 3) return None
            comp
          }
          // T.81 A.2: a single-component scan is NON-interleaved — one 8x8
          // data unit per MCU, row-major over ceil(w/8) x ceil(h/8) — and
          // the declared sampling factors play no role in its layout (they
          // only govern interleaving). A grayscale file declaring Hi=Vi=2
          // must therefore decode exactly like one declaring 1x1; treating
          // it as interleaved would silently emit blocks in the wrong
          // spatial order whenever w,h are multiples of 16.
          if (nc == 1) comps = Array(comps(0).copy(h = 1, v = 1))
          i = segStart + len
        case m if m == 0xc2 || (m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8) =>
          return None // progressive/extended/arithmetic: not baseline
        case 0xdd => // DRI
          if (segStart + 4 > b.length) return None
          restartInterval = be16(b, segStart + 2)
          i = segStart + be16(b, segStart)
        case 0xda => // SOS
          if (comps == null) return None
          val len = be16(b, segStart)
          if (segStart + len > b.length) return None
          val ns = u8(b, segStart + 2)
          if (ns != comps.length || len < 6 + 2 * ns) return None
          var c = 0
          while (c < ns) {
            val cs = u8(b, segStart + 3 + 2 * c)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.td = u8(b, segStart + 4 + 2 * c) >> 4
            comp.ta = u8(b, segStart + 4 + 2 * c) & 15
            if (comp.td > 3 || comp.ta > 3) return None
            c += 1
          }
          sos = segStart + len
        case 0xd9 => return None // EOI before any scan
        case _ => // APPn / COM / anything with a length field
          val len = be16(b, segStart)
          if (len < 2 || segStart + len > b.length) return None
          i = segStart + len
      }
    }

    // SOF-claimed size is attacker-controlled: bound total pixels by the
    // entropy data actually present before allocating planes (DC-only
    // blocks are >= 2 bits per 64 pixels; 2048 px/byte is generous)
    val totalPx = width.toLong * height
    if (totalPx > Int.MaxValue / 8 ||
        totalPx > (b.length - sos).toLong * 2048L + 4096L) return None

    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      if (c.planeW.toLong * c.planeH > totalPx * 4 + 65536) return None
      c.plane = new Array[Byte](c.planeW * c.planeH)
      if (qt(c.tq) == null) return None
      if (dcTabs(c.td) == null || acTabs(c.ta) == null) return None
    }

    val br = new BitReader(b, sos)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    def decodeBlock(c: Component, bx: Int, by: Int): Boolean = {
      java.util.Arrays.fill(coef, 0)
      val q = qt(c.tq)
      val t = dcTabs(c.td).decode(br)
      if (t < 0 || t > 11) return false
      val diffBits = br.receive(t)
      if (diffBits == Int.MinValue) return false
      c.dcPred += extend(diffBits, t)
      coef(0) = c.dcPred * q(0)
      var k = 1
      var done = false
      while (!done && k < 64) {
        val rs = acTabs(c.ta).decode(br)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) k += 16 else done = true // ZRL vs EOB
        } else {
          k += r
          if (k > 63) return false
          val vv = br.receive(s)
          if (vv == Int.MinValue) return false
          coef(Zigzag(k)) = extend(vv, s) * q(k)
          k += 1
        }
      }
      // separable float IDCT: tmp(u, y) = Σv cos(v)(y) F(u, v)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < 8) {
          var acc = 0.0
          var v = 0
          while (v < 8) { acc += CosTable(v)(y) * coef(v * 8 + u); v += 1 }
          tmp(u * 8 + y) = acc
          y += 1
        }
        u += 1
      }
      val x0 = bx * 8; val y0 = by * 8
      var x = 0
      while (x < 8) {
        var y = 0
        while (y < 8) {
          var acc = 0.0
          var uu = 0
          while (uu < 8) { acc += CosTable(uu)(x) * tmp(uu * 8 + y); uu += 1 }
          val px = math.round(acc + 128.0).toInt
          val clamped = if (px < 0) 0 else if (px > 255) 255 else px
          c.plane((y0 + y) * c.planeW + (x0 + x)) = clamped.toByte
          y += 1
        }
        x += 1
      }
      true
    }

    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        var byy = 0
        while (byy < c.v) {
          var bxx = 0
          while (bxx < c.h) {
            if (!decodeBlock(c, mx * c.h + bxx, my * c.v + byy)) return None
            bxx += 1
          }
          byy += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // fail closed on truncated entropy data: a file cut after the last
    // complete MCU but before EOI is damaged, not decodable-by-luck
    if (!br.atEoi()) return None

    val rgb = new Array[Byte](3 * width * height)
    val y = comps(0)
    if (comps.length == 1) {
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          val v = y.plane(yy * y.planeW + xx)
          val o = 3 * (yy * width + xx)
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
          xx += 1
        }
        yy += 1
      }
    } else {
      val cb = comps(1); val cr = comps(2)
      var yy = 0
      while (yy < height) {
        var xx = 0
        while (xx < width) {
          val lum = y.plane((yy * y.v / vMax) * y.planeW + (xx * y.h / hMax)) & 0xff
          val cbv = (cb.plane((yy * cb.v / vMax) * cb.planeW + (xx * cb.h / hMax)) & 0xff) - 128
          val crv = (cr.plane((yy * cr.v / vMax) * cr.planeW + (xx * cr.h / hMax)) & 0xff) - 128
          val r = math.round(lum + 1.402 * crv).toInt
          val g = math.round(lum - 0.344136 * cbv - 0.714136 * crv).toInt
          val bl = math.round(lum + 1.772 * cbv).toInt
          val o = 3 * (yy * width + xx)
          rgb(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          rgb(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          rgb(o + 2) = (if (bl < 0) 0 else if (bl > 255) 255 else bl).toByte
          xx += 1
        }
        yy += 1
      }
    }
    Some(HeaderCodec.Pixels(width, height, rgb))
  }

  def decodeJpeg(b: Array[Byte]): Option[HeaderCodec.PixelStats] =
    decodeJpegPixels(b).map(HeaderCodec.statsOf)
}
