package graft.multimodal

/** Baseline and progressive JPEG decode in pure JVM byte math — the
  * last image format that previously fell to the deterministic stub.
  * Scope (ITU T.81): 8-bit precision, Huffman entropy coding (DHT
  * canonical tables), 1- or 3-component scans, sampling factors 1 or 2
  * (4:4:4 / 4:2:2 / 4:2:0), restart markers (DRI/RSTn), multi-segment
  * DQT/DHT, APPn/COM skipping, 0xFF00 byte stuffing; progressive
  * (SOF2) adds multi-scan spectral selection and successive
  * approximation (DC first/refine, AC first/refine with EOB runs,
  * tables and DRI redefinable between scans); lossless (SOF3) adds the
  * Annex H predictor walk (all 7 predictors, exact samples, no DCT);
  * arithmetic-coded sequential (SOF9) adds the Annex D/E QM coder with
  * the F.1.4.4 DC/AC statistics models and DAC conditioning tables
  * ([[QmCoder]]); lossless also covers 3-component 1x1 INTERLEAVED
  * scans (per-channel predictor chains + JFIF YCbCr); 12-bit precision
  * decodes through the extended-sequential (SOF1) path — grayscale or
  * 4:4:4 color, level shift 2048, DC categories to 15, YCbCr in the
  * 12-bit domain, top-8-bit emission;
  * hierarchical (DHP) streams dispatch to the Annex J multi-frame
  * driver ([[HierJpeg]]); arithmetic-coded progressive (SOF10) runs the
  * T.81 G.2 statistical models — per-scan QM entropy segments over the
  * same progressive coefficient store (DC first on point-transformed
  * values, fixed-state DC refinement, band-limited AC first, G.2.3 AC
  * refinement); arithmetic sequential also honors restart intervals
  * (per-interval entropy segments, RSTn numbering, statistics resets,
  * E.2.4). Out-of-[[HierJpeg]]-remit hierarchical residues and 12-bit
  * progressive/arithmetic combinations return None (stub fallback) —
  * as does truncation or corruption anywhere.
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

  private[multimodal] final class Huff(counts: Array[Int], vals: Array[Byte]) {
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
  private[multimodal] final class BitReader(b: Array[Byte], start: Int) {
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
    /** Byte-align and return the pending marker code without consuming
      * it (`bytePos` stays on its 0xFF), or -1 if the stream ends with
      * no marker — how a progressive scan hands control back to the
      * marker loop. */
    def alignMarker(): Int = {
      cnt = 0
      if (marker < 0) {
        if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return -1
        marker = b(pos + 1) & 0xff
      }
      marker
    }
  }

  private[multimodal] def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Separable float IDCT of one dequantized block (natural order) into
    * the component plane at block (bx, by). `tmp` is a caller-owned
    * 64-slot scratch (allocation-free inner loop). */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
      plane: Array[Byte], planeW: Int, bx: Int, by: Int): Unit = {
    // tmp(u, y) = Σv cos(v)(y) F(u, v)
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
        plane((y0 + y) * planeW + (x0 + x)) = clamped.toByte
        y += 1
      }
      x += 1
    }
  }

  /** 12-bit emission (shared by the SOF1 and SOF10-12-bit exits): level
    * shift 2048, clamp to 12 bits; for color, the JFIF YCbCr→RGB
    * transform runs in the 12-BIT domain (neutral chroma 2048) BEFORE
    * the top-8-bit cut — transforming after the cut would quantize the
    * chroma contribution 16× coarser than the samples carry. Expects
    * each component's `plane12` filled with UNSHIFTED samples. */
  private def emit12Rgb(comps: Array[Component], width: Int,
      height: Int): HeaderCodec.Pixels = {
    val rgb = new Array[Byte](3 * width * height)
    def sample12(ci: Int, x: Int, y: Int): Int = {
      val raw = 2048 + comps(ci).plane12(y * comps(ci).planeW + x)
      if (raw < 0) 0 else if (raw > 4095) 4095 else raw
    }
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        val o = 3 * (yy * width + xx)
        if (comps.length == 1) {
          val v = (sample12(0, xx, yy) >> 4).toByte
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        } else {
          val lum = sample12(0, xx, yy)
          val cbv = sample12(1, xx, yy) - 2048
          val crv = sample12(2, xx, yy) - 2048
          def emit(v: Double): Byte = {
            val r = math.round(v).toInt
            val c = if (r < 0) 0 else if (r > 4095) 4095 else r
            (c >> 4).toByte
          }
          rgb(o) = emit(lum + 1.402 * crv)
          rgb(o + 1) = emit(lum - 0.344136 * cbv - 0.714136 * crv)
          rgb(o + 2) = emit(lum + 1.772 * cbv)
        }
        xx += 1
      }
      yy += 1
    }
    HeaderCodec.Pixels(width, height, rgb)
  }

  /** IDCT of one dequantized block into an Int plane WITHOUT the +128
    * level shift or clamping — the form hierarchical differential frames
    * need (T.81 J: differential samples are signed; shift/clamp happen at
    * reference merge). Rounding is identical to [[idctBlock]]:
    * floor(x+0.5) commutes with integer shifts, so
    * idctBlock ≡ clamp(128 + idctBlockRaw). */
  private[multimodal] def idctBlockRaw(coef: Array[Int], tmp: Array[Double],
      out: Array[Int], planeW: Int, bx: Int, by: Int): Unit = {
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
        out((y0 + y) * planeW + (x0 + x)) = math.round(acc).toInt
        y += 1
      }
      x += 1
    }
  }

  /** Upsample component planes to the frame grid and convert to RGB —
    * grayscale copies Y, color runs the JFIF YCbCr transform. */
  private def assembleRgb(comps: Array[Component], width: Int, height: Int,
      hMax: Int, vMax: Int): HeaderCodec.Pixels = {
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
    HeaderCodec.Pixels(width, height, rgb)
  }

  private[multimodal] def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private[multimodal] def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0
    var plane: Array[Byte] = null
    var plane12: Array[Int] = null // 12-bit precision path (SOF1)
    var planeW = 0; var planeH = 0
    var dcPred = 0
    // progressive-only state: unquantized coefficients for every padded
    // block (natural order within each 64), the component's REAL
    // (non-padded) block dims for non-interleaved scans, and whether a
    // first DC scan has arrived (T.81 requires it before anything else)
    var coefs: Array[Int] = null
    var blocksW = 0; var blocksH = 0 // padded (interleaved MCU) grid
    var realBw = 0; var realBh = 0   // ceil(compW/8) x ceil(compH/8)
    var sawDc = false
  }

  def decodeJpegPixels(b: Array[Byte]): Option[HeaderCodec.Pixels] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var progressive = false
    var lossless = false
    var arith = false
    var p12 = false // 12-bit precision (SOF1/SOF2/SOF9/SOF10)
    // DAC conditioning (T.81 B.2.4.3), spec defaults when absent
    val dcCondL = Array(0, 0, 0, 0)
    val dcCondU = Array(1, 1, 1, 1)
    val acCondK = Array(5, 5, 5, 5)
    var sawScan = false
    var i = 2

    /** One progressive scan's entropy data: a DC scan (ss==0; interleaved
      * when the SOS lists several components, else non-interleaved over
      * the real block grid) or a single-component AC band scan, in the
      * first (ah==0) or refinement pass. Coefficients accumulate RAW
      * (unquantized, successively approximated); dequant + IDCT happen
      * once at EOI. Returns false on any corruption (fail closed). */
    def progressiveScan(br: BitReader, scanComps: Array[Component],
        ss: Int, se: Int, ah: Int, al: Int): Boolean = {
      var eobrun = 0
      val p1 = 1 << al

      def refineOne(coefs: Array[Int], idx: Int): Boolean = {
        val cv = coefs(idx)
        val bit = br.nextBit()
        if (bit < 0) return false
        if (bit != 0 && (cv & p1) == 0)
          coefs(idx) = if (cv >= 0) cv + p1 else cv - p1
        true
      }

      def dcUnit(c: Component, off: Int): Boolean = {
        if (ah == 0) {
          val t = dcTabs(c.td).decode(br)
          if (t < 0 || t > (if (p12) 15 else 11)) return false
          val d = br.receive(t)
          if (d == Int.MinValue) return false
          c.dcPred += extend(d, t)
          c.coefs(off) = c.dcPred << al
          c.sawDc = true
        } else {
          // refinement: one raw bit of the two's-complement DC value
          val bit = br.nextBit()
          if (bit < 0) return false
          if (bit != 0) c.coefs(off) |= p1
        }
        true
      }

      def acFirstUnit(c: Component, off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = acTabs(c.ta).decode(br)
          if (rs < 0) return false
          val r = rs >> 4; val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1 // EOBn: run of (1<<r)+ext all-EOB blocks
              if (r > 0) {
                val eb = br.receive(r)
                if (eb == Int.MinValue) return false
                eobrun += eb
              }
              return true
            }
          } else {
            k += r
            if (k > se) return false
            val v = br.receive(s)
            if (v == Int.MinValue) return false
            c.coefs(off + Zigzag(k)) = extend(v, s) << al
            k += 1
          }
        }
        true
      }

      // T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine: zero-history
      // coefficients take new ±(1<<al) values; nonzero-history ones
      // consume a correction bit whenever the scan passes over them
      def acRefineUnit(c: Component, off: Int): Boolean = {
        val coefs = c.coefs
        var k = ss
        if (eobrun == 0) {
          var atEob = false
          while (!atEob && k <= se) {
            val rs = acTabs(c.ta).decode(br)
            if (rs < 0) return false
            var r = rs >> 4; val s = rs & 15
            var newVal = 0
            if (s == 0) {
              if (r < 15) {
                eobrun = 1 << r
                if (r > 0) {
                  val eb = br.receive(r)
                  if (eb == Int.MinValue) return false
                  eobrun += eb
                }
                atEob = true
              }
              // r == 15 (ZRL): pass 16 zero-history coefficients
            } else {
              if (s != 1) return false // refinement values are ±1 only
              val bit = br.nextBit()
              if (bit < 0) return false
              newVal = if (bit != 0) p1 else -p1
            }
            if (!atEob) {
              var placed = false
              while (!placed && k <= se) {
                val z = Zigzag(k)
                if (coefs(off + z) != 0) {
                  if (!refineOne(coefs, off + z)) return false
                } else if (r == 0) {
                  if (newVal != 0) coefs(off + z) = newVal
                  placed = true
                } else r -= 1
                k += 1
              }
              if (!placed && newVal != 0) return false // ran past se
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) { // correction bits for the block's remainder
            val z = Zigzag(k)
            if (coefs(off + z) != 0 && !refineOne(coefs, off + z)) return false
            k += 1
          }
          eobrun -= 1
        }
        true
      }

      def unit(c: Component, off: Int): Boolean =
        if (ss == 0) dcUnit(c, off)
        else if (ah == 0) acFirstUnit(c, off)
        else acRefineUnit(c, off)


      scanComps.foreach(_.dcPred = 0) // predictors reset per scan (F.2.1.3.1)
      if (scanComps.length == 1) {
        // non-interleaved: one data unit per MCU, row-major over the
        // component's REAL (non-padded) block grid (T.81 A.2.2)
        val c = scanComps(0)
        val total = c.realBw * c.realBh
        var blk = 0
        while (blk < total) {
          if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
            if (!br.restart()) return false
            c.dcPred = 0; eobrun = 0
          }
          val off = ((blk / c.realBw) * c.blocksW + blk % c.realBw) * 64
          if (!unit(c, off)) return false
          blk += 1
        }
      } else {
        val total = mcusX * mcusY
        var mcu = 0
        while (mcu < total) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            if (!br.restart()) return false
            scanComps.foreach(_.dcPred = 0)
            eobrun = 0
          }
          val mx = mcu % mcusX; val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var byy = 0
            while (byy < c.v) {
              var bxx = 0
              while (bxx < c.h) {
                val off = ((my * c.v + byy) * c.blocksW + (mx * c.h + bxx)) * 64
                if (!unit(c, off)) return false
                bxx += 1
              }
              byy += 1
            }
            ci += 1
          }
          mcu += 1
        }
      }
      true
    }

    /** One SOF10 (arithmetic progressive, T.81 G.2) scan: the Annex F
      * QM statistical models over the same coefficient store and walk
      * as the Huffman scans — DC first via F.1.4.4.1 on the
      * point-transformed values, DC refinement as one fixed-state
      * decision per block, AC first via the band-limited sequential
      * model, AC refinement via the G.2.3 correction model. Statistics
      * and the entropy coder reset per scan (each scan is its own
      * segment). Returns the byte position of the scan-terminating
      * marker's 0xFF, or -1 on corruption. */
    def progressiveArithScan(entry: Int, scanComps: Array[Component],
        ss: Int, se: Int, ah: Int, al: Int): Int = {
      val dec = new QmCoder.Decoder(b, entry)
      val p1 = 1 << al
      val czig = new Array[Int](64)
      val dcSt =
        if (ss == 0 && ah == 0)
          scanComps.map(c => new QmCoder.DcState(dcCondL(c.td), dcCondU(c.td)))
        else null
      val fixed = if (ss == 0 && ah > 0) QmCoder.fixedBin() else null
      val acSt =
        if (ss > 0) new QmCoder.AcState(acCondK(scanComps(0).ta)) else null

      def unit(ci: Int, c: Component, off: Int): Boolean = {
        if (ss == 0) {
          if (ah == 0) {
            if (!QmCoder.decodeDc(dec, dcSt(ci))) return false
            c.coefs(off) = dcSt(ci).pred << al
            c.sawDc = true
          } else if (dec.decode(fixed) == 1) c.coefs(off) |= p1
          true
        } else {
          // zigzag view of the block's band, refined/filled in place
          var k = ss
          while (k <= se) { czig(k) = c.coefs(off + Zigzag(k)); k += 1 }
          val ok =
            if (ah == 0) QmCoder.decodeAcBand(dec, acSt, czig, ss, se, al)
            else QmCoder.decodeAcRefine(dec, acSt, czig, ss, se, al)
          if (!ok) return false
          k = ss
          while (k <= se) { c.coefs(off + Zigzag(k)) = czig(k); k += 1 }
          true
        }
      }

      if (scanComps.length == 1) {
        // non-interleaved: row-major over the REAL block grid (A.2.2)
        val c = scanComps(0)
        val total = c.realBw * c.realBh
        var blk = 0
        while (blk < total) {
          val off = ((blk / c.realBw) * c.blocksW + blk % c.realBw) * 64
          if (!unit(0, c, off)) return -1
          blk += 1
        }
      } else {
        val total = mcusX * mcusY
        var mcu = 0
        while (mcu < total) {
          val mx = mcu % mcusX; val my = mcu / mcusX
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            var byy = 0
            while (byy < c.v) {
              var bxx = 0
              while (bxx < c.h) {
                val off = ((my * c.v + byy) * c.blocksW + (mx * c.h + bxx)) * 64
                if (!unit(ci, c, off)) return -1
                bxx += 1
              }
              byy += 1
            }
            ci += 1
          }
          mcu += 1
        }
      }
      // walk any unread flush bytes to the terminating marker: 0xFF
      // followed by <= 0x8F is bit-stuffed entropy data, not a marker
      var p = dec.bytePos
      while (true) {
        if (p + 1 >= b.length) return -1
        if (u8(b, p) == 0xff && u8(b, p + 1) > 0x8f) return p
        p += 1
      }
      -1 // unreachable
    }

    while (true) {
      if (i + 2 > b.length) return None
      if (u8(b, i) != 0xff) return None
      var marker = u8(b, i + 1)
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) } // fill bytes
      // standalone markers (SOI/EOI/RSTn) carry no length field; anything
      // else needs 2 more bytes for it — re-checked after fill-byte
      // skipping, where a 0xFF run ending near EOF would otherwise read a
      // length field past the buffer (fuzz-caught)
      val standalone = marker == 0xd8 || marker == 0xd9 ||
        (marker >= 0xd0 && marker <= 0xd7)
      if (i + 2 > b.length || (!standalone && i + 4 > b.length)) return None
      val segStart = i + 2
      marker match {
        case 0xd8 => i += 2 // stray SOI
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // stray RSTn (standalone)
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
        case m if m == 0xc0 || m == 0xc1 || m == 0xc2 || m == 0xc3 ||
            m == 0xc9 || m == 0xca =>
          // SOF0 baseline / SOF1 extended sequential (8- or 12-bit) /
          // SOF2 progressive / SOF3 lossless / SOF9 arithmetic
          // sequential / SOF10 arithmetic progressive
          if (comps != null) return None // second frame header
          progressive = m == 0xc2 || m == 0xca
          lossless = m == 0xc3
          arith = m == 0xc9 || m == 0xca
          val len = be16(b, segStart)
          if (segStart + len > b.length || len < 8) return None
          val precision = u8(b, segStart + 2)
          height = be16(b, segStart + 3); width = be16(b, segStart + 5)
          val nc = u8(b, segStart + 7)
          // 12-bit remit (T.81 table 1): every DCT-based frame type —
          // extended sequential (SOF1), progressive (SOF2), sequential
          // arithmetic (SOF9), progressive arithmetic (SOF10) —
          // grayscale or 4:4:4 color; lossless (SOF3) and baseline
          // (SOF0) stay 8-bit (baseline is 8-bit BY DEFINITION)
          if (precision == 12) {
            if ((m != 0xc1 && m != 0xc2 && m != 0xc9 && m != 0xca) ||
                (nc != 1 && nc != 3)) return None
            p12 = true
          } else if (precision != 8) return None
          if (width <= 0 || height <= 0) return None
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
          // 12-bit color remit is 4:4:4 — the 12-bit assembly reads
          // full-resolution planes per component
          if (p12 && comps.exists(c => c.h != 1 || c.v != 1)) return None
          hMax = comps.map(_.h).max
          vMax = comps.map(_.v).max
          mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          comps.foreach { c =>
            c.planeW = mcusX * c.h * 8
            c.planeH = mcusY * c.v * 8
            c.blocksW = mcusX * c.h
            c.blocksH = mcusY * c.v
            val compW = (width * c.h + hMax - 1) / hMax
            val compH = (height * c.v + vMax - 1) / vMax
            c.realBw = (compW + 7) / 8
            c.realBh = (compH + 7) / 8
          }
          i = segStart + len
        case 0xcc => // DAC: arithmetic conditioning tables (B.2.4.3)
          val len = be16(b, segStart)
          if (segStart + len > b.length) return None
          var p = segStart + 2
          val end = segStart + len
          while (p + 1 < end) {
            val tc = u8(b, p) >> 4; val tb = u8(b, p) & 15
            val cs = u8(b, p + 1)
            if (tb > 3) return None
            if (tc == 0) {
              val l = cs & 15; val u = cs >> 4
              if (u > 15 || l > u) return None
              dcCondL(tb) = l; dcCondU(tb) = u
            } else if (tc == 1) {
              if (cs < 1 || cs > 63) return None
              acCondK(tb) = cs
            } else return None
            p += 2
          }
          i = end
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          return None // other extended modes: unsupported
        case 0xde => // DHP: the stream is hierarchical (T.81 Annex J) —
          // hand the WHOLE stream to the multi-frame driver. Before this
          // dispatch existed, the skip-unknown-segment default silently
          // decoded just the base frame of a pyramid and returned it as
          // the image — wrong output, not fail-closed.
          if (comps != null || sawScan) return None // DHP must precede frames
          return HierJpeg.decode(b)
        case 0xdf => // EXP outside a hierarchical stream: malformed
          return None
        case 0xdd => // DRI
          if (segStart + 4 > b.length) return None
          restartInterval = be16(b, segStart + 2)
          i = segStart + be16(b, segStart)
        case 0xda => // SOS
          if (comps == null) return None
          val len = be16(b, segStart)
          if (segStart + len > b.length) return None
          val ns = u8(b, segStart + 2)
          if (ns < 1 || ns > comps.length || len < 6 + 2 * ns) return None
          val scanComps = new Array[Component](ns)
          var c = 0
          while (c < ns) {
            val cs = u8(b, segStart + 3 + 2 * c)
            val comp = comps.find(_.id == cs).getOrElse(return None)
            comp.td = u8(b, segStart + 4 + 2 * c) >> 4
            comp.ta = u8(b, segStart + 4 + 2 * c) & 15
            if (comp.td > 3 || comp.ta > 3) return None
            scanComps(c) = comp
            c += 1
          }
          val ss = u8(b, segStart + 3 + 2 * ns)
          val se = u8(b, segStart + 4 + 2 * ns)
          val ah = u8(b, segStart + 5 + 2 * ns) >> 4
          val al = u8(b, segStart + 5 + 2 * ns) & 15
          val entry = segStart + len
          if (!sawScan) {
            // SOF-claimed size is attacker-controlled: bound total pixels
            // by the entropy data actually present before any plane or
            // coefficient store allocates (a DC-only block is >= 2 bits
            // per 64 pixels; 2048 px/byte is generous)
            val totalPx = width.toLong * height
            if (totalPx > Int.MaxValue / 8 ||
                totalPx > (b.length - entry).toLong * 2048L + 4096L) return None
            comps.foreach { cc =>
              if (cc.planeW.toLong * cc.planeH > totalPx * 4 + 65536) return None
            }
            sawScan = true
          }
          if (lossless) {
            // T.81 Annex H lossless (process 14): Huffman-coded prediction
            // DIFFERENCES — no DCT, no quantization, so dimensions need
            // not be block multiples and every sample is exact. ss is the
            // predictor selector (1..7), al the point transform. Remit:
            // 8-bit precision, no restart markers; single-component
            // non-interleaved scans (with point transform), or 3-component
            // 1x1 INTERLEAVED scans (al = 0; one sample per component per
            // MCU, H.2 — each component predicts from its own plane).
            if (ns != comps.length || restartInterval != 0) return None
            if (comps.length != 1 && comps.length != 3) return None
            if (comps.length == 3 &&
                (comps.exists(c => c.h != 1 || c.v != 1) || al != 0)) return None
            if (ss < 1 || ss > 7 || se != 0 || ah != 0 || al > 7) return None
            if (scanComps.exists(sc => dcTabs(sc.td) == null)) return None
            val br = new BitReader(b, entry)
            val nsC = scanComps.length
            val planes = Array.fill(nsC)(new Array[Int](width * height))
            val defaultPred = 1 << (7 - al)
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) {
                var ci = 0
                while (ci < nsC) {
                  val t = dcTabs(scanComps(ci).td).decode(br)
                  if (t < 0 || t > 16) return None
                  val diff =
                    if (t == 0) 0
                    else if (t == 16) 32768 // T.81 H.2: category 16 carries no bits
                    else {
                      val v = br.receive(t)
                      if (v == Int.MinValue) return None
                      extend(v, t)
                    }
                  // T.81 H.1.2: first sample predicts the midpoint; the rest
                  // of the first LINE predicts Ra; first COLUMN predicts Rb;
                  // everywhere else the scan-selected predictor, over
                  // RECONSTRUCTED neighbors in the point-transformed domain.
                  // /2 is an arithmetic shift right per the spec note.
                  val raster = planes(ci)
                  val px =
                    if (x == 0 && y == 0) defaultPred
                    else if (y == 0) raster(x - 1)
                    else if (x == 0) raster((y - 1) * width)
                    else {
                      val ra = raster(y * width + x - 1)
                      val rb = raster((y - 1) * width + x)
                      val rc = raster((y - 1) * width + x - 1)
                      ss match {
                        case 1 => ra
                        case 2 => rb
                        case 3 => rc
                        case 4 => ra + rb - rc
                        case 5 => ra + ((rb - rc) >> 1)
                        case 6 => rb + ((ra - rc) >> 1)
                        case _ => (ra + rb) >> 1
                      }
                    }
                  raster(y * width + x) = (px + diff) & 0xffff // modulo 2^16
                  ci += 1
                }
                x += 1
              }
              y += 1
            }
            // fail closed on trailing truncation, like the DCT paths
            if (!br.atEoi()) return None
            val rgb = new Array[Byte](3 * width * height)
            if (nsC == 1) {
              val raster = planes(0)
              var p = 0
              while (p < width * height) {
                val v = ((raster(p) << al) & 0xff).toByte
                rgb(3 * p) = v; rgb(3 * p + 1) = v; rgb(3 * p + 2) = v
                p += 1
              }
            } else {
              // JFIF 3-component: YCbCr, same transform as the DCT paths
              val ys = planes(0); val cbs = planes(1); val crs = planes(2)
              var p = 0
              while (p < width * height) {
                val lum = ys(p) & 0xff
                val cbv = (cbs(p) & 0xff) - 128
                val crv = (crs(p) & 0xff) - 128
                val r = math.round(lum + 1.402 * crv).toInt
                val g = math.round(lum - 0.344136 * cbv - 0.714136 * crv).toInt
                val bl = math.round(lum + 1.772 * cbv).toInt
                rgb(3 * p) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
                rgb(3 * p + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
                rgb(3 * p + 2) = (if (bl < 0) 0 else if (bl > 255) 255 else bl).toByte
                p += 1
              }
            }
            return Some(HeaderCodec.Pixels(width, height, rgb))
          }
          if (arith && !progressive) {
            // SOF9: extended sequential with arithmetic entropy coding
            // (T.81 F.1.4.4 statistics over the Annex D/E QM coder). One
            // interleaved scan, full spectral band, no successive
            // approximation. Restart markers (DRI/RSTn) per E.2.4: each
            // interval is its own entropy segment — the QM decoder
            // re-initializes after the marker and ALL statistics bins,
            // conditioning contexts, and DC predictions reset. No
            // Huffman tables involved.
            if (ns != comps.length) return None
            if (ss != 0 || se != 63 || ah != 0 || al != 0) return None
            comps.foreach { cc =>
              if (qt(cc.tq) == null) return None
              // 12-bit (SOF9 precision 12): unshifted Int planes, the
              // shared 12-bit emission at the exit; DC magnitudes just
              // run deeper in the same F.1.4.4 trees
              if (p12) cc.plane12 = new Array[Int](cc.planeW * cc.planeH)
              else cc.plane = new Array[Byte](cc.planeW * cc.planeH)
            }
            var dec = new QmCoder.Decoder(b, entry)
            var dcSt = comps.map(cc => new QmCoder.DcState(dcCondL(cc.td), dcCondU(cc.td)))
            var acSt = comps.map(cc => new QmCoder.AcState(acCondK(cc.ta)))
            val czig = new Array[Int](64)
            val coef = new Array[Int](64)
            val tmp = new Array[Double](64)

            def decodeBlock(cc: Component, cIdx: Int, bx: Int, by: Int): Boolean = {
              java.util.Arrays.fill(czig, 0)
              val q = qt(cc.tq)
              if (!QmCoder.decodeDc(dec, dcSt(cIdx))) return false
              if (!QmCoder.decodeAc(dec, acSt(cIdx), czig)) return false
              java.util.Arrays.fill(coef, 0)
              coef(0) = dcSt(cIdx).pred * q(0)
              var k = 1
              while (k < 64) { coef(Zigzag(k)) = czig(k) * q(k); k += 1 }
              if (p12) idctBlockRaw(coef, tmp, cc.plane12, cc.planeW, bx, by)
              else idctBlock(coef, tmp, cc.plane, cc.planeW, bx, by)
              true
            }

            var mcu = 0
            var nextRst = 0
            val totalMcus = mcusX * mcusY
            while (mcu < totalMcus) {
              if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                // interval boundary: walk the segment's unread flush
                // bytes to the expected RSTn (numbered mod 8), then
                // restart the entropy decoder and reset all statistics
                var p = dec.bytePos
                var found = false
                while (!found) {
                  if (p + 1 >= b.length) return None
                  if (u8(b, p) == 0xff && u8(b, p + 1) > 0x8f) found = true
                  else p += 1
                }
                if (u8(b, p + 1) != 0xd0 + nextRst) return None
                nextRst = (nextRst + 1) % 8
                dec = new QmCoder.Decoder(b, p + 2)
                dcSt = comps.map(cc => new QmCoder.DcState(dcCondL(cc.td), dcCondU(cc.td)))
                acSt = comps.map(cc => new QmCoder.AcState(acCondK(cc.ta)))
              }
              val mx = mcu % mcusX; val my = mcu / mcusX
              var ci = 0
              while (ci < comps.length) {
                val cc = comps(ci)
                var byy = 0
                while (byy < cc.v) {
                  var bxx = 0
                  while (bxx < cc.h) {
                    if (!decodeBlock(cc, ci, mx * cc.h + bxx, my * cc.v + byy))
                      return None
                    bxx += 1
                  }
                  byy += 1
                }
                ci += 1
              }
              mcu += 1
            }
            // fail closed: walk any unread flush bytes (0xFF + stuffed
            // <= 0x8F pairs are still data) and require the EOI marker
            var p = dec.bytePos
            var eoi = false
            while (!eoi) {
              if (p + 1 >= b.length) return None
              if (u8(b, p) == 0xff && u8(b, p + 1) > 0x8f) {
                if (u8(b, p + 1) != 0xd9) return None
                eoi = true
              } else p += 1
            }
            if (p12) return Some(emit12Rgb(comps, width, height))
            return Some(assembleRgb(comps, width, height, hMax, vMax))
          }
          if (!progressive) {
            // baseline / extended sequential: one scan, all components,
            // interleaved. 12-bit (SOF1) decodes through Int planes with
            // level shift 2048 and a [0,4095] clamp, emitted as the top
            // 8 bits (>>4) of each sample; DC difference categories run
            // to 15 there (T.81 table F.1) vs 11 at 8-bit.
            if (ns != comps.length) return None
            val maxDcCat = if (p12) 15 else 11
            comps.foreach { cc =>
              if (qt(cc.tq) == null) return None
              if (dcTabs(cc.td) == null || acTabs(cc.ta) == null) return None
              if (p12) cc.plane12 = new Array[Int](cc.planeW * cc.planeH)
              else cc.plane = new Array[Byte](cc.planeW * cc.planeH)
            }
            val br = new BitReader(b, entry)
            val coef = new Array[Int](64)
            val tmp = new Array[Double](64)

            def decodeBlock(cc: Component, bx: Int, by: Int): Boolean = {
              java.util.Arrays.fill(coef, 0)
              val q = qt(cc.tq)
              val t = dcTabs(cc.td).decode(br)
              if (t < 0 || t > maxDcCat) return false
              val diffBits = br.receive(t)
              if (diffBits == Int.MinValue) return false
              cc.dcPred += extend(diffBits, t)
              coef(0) = cc.dcPred * q(0)
              var k = 1
              var done = false
              while (!done && k < 64) {
                val rs = acTabs(cc.ta).decode(br)
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
              if (p12) idctBlockRaw(coef, tmp, cc.plane12, cc.planeW, bx, by)
              else idctBlock(coef, tmp, cc.plane, cc.planeW, bx, by)
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
                val cc = comps(ci)
                var byy = 0
                while (byy < cc.v) {
                  var bxx = 0
                  while (bxx < cc.h) {
                    if (!decodeBlock(cc, mx * cc.h + bxx, my * cc.v + byy)) return None
                    bxx += 1
                  }
                  byy += 1
                }
                ci += 1
              }
              mcu += 1
            }
            // fail closed on truncated entropy data: a file cut after the
            // last complete MCU but before EOI is damaged, not
            // decodable-by-luck
            if (!br.atEoi()) return None
            if (p12) return Some(emit12Rgb(comps, width, height))
            return Some(assembleRgb(comps, width, height, hMax, vMax))
          } else {
            // scan-header validity (T.81 G.1): the DC band is exactly
            // [0,0] and may interleave components; AC bands are
            // single-component; a refinement pass lowers Al by exactly 1;
            // every component's first scan must be a first DC scan
            if (ss == 0) { if (se != 0) return None }
            else if (ns != 1 || se < ss || se > 63) return None
            if (al > 13 || (ah != 0 && ah != al + 1)) return None
            if (!arith && ss == 0 && ah == 0 &&
                scanComps.exists(sc => dcTabs(sc.td) == null)) return None
            if (ss == 0 && ah > 0 && scanComps.exists(!_.sawDc)) return None
            if (ss > 0 && !scanComps(0).sawDc) return None
            if (!arith && ss > 0 && acTabs(scanComps(0).ta) == null) return None
            scanComps.foreach { sc =>
              if (sc.coefs == null) sc.coefs = new Array[Int](sc.planeW * sc.planeH)
            }
            if (arith) {
              // SOF10: restart markers are out of remit, as in SOF9
              if (restartInterval != 0) return None
              val next = progressiveArithScan(entry, scanComps, ss, se, ah, al)
              if (next < 0) return None
              i = next
            } else {
              val br = new BitReader(b, entry)
              if (!progressiveScan(br, scanComps, ss, se, ah, al)) return None
              if (br.alignMarker() < 0) return None
              i = br.bytePos // resume the marker loop at the pending marker
            }
          }
        case 0xd9 => // EOI: for progressive, coefficients are complete now
          if (!progressive || comps == null || !sawScan) return None
          val coef = new Array[Int](64)
          val tmp = new Array[Double](64)
          comps.foreach { cc =>
            if (cc.coefs == null || !cc.sawDc) return None
            val q = qt(cc.tq)
            if (q == null) return None
            // 12-bit progressive (SOF10 precision 12) reconstructs into
            // unshifted Int planes and exits through the shared 12-bit
            // emission; 8-bit shifts/clamps in the IDCT as usual
            if (p12) cc.plane12 = new Array[Int](cc.planeW * cc.planeH)
            else cc.plane = new Array[Byte](cc.planeW * cc.planeH)
            var by = 0
            while (by < cc.blocksH) {
              var bx = 0
              while (bx < cc.blocksW) {
                val off = (by * cc.blocksW + bx) * 64
                var k = 0
                while (k < 64) {
                  val z = Zigzag(k)
                  coef(z) = cc.coefs(off + z) * q(k) // q is zigzag-ordered
                  k += 1
                }
                if (p12) idctBlockRaw(coef, tmp, cc.plane12, cc.planeW, bx, by)
                else idctBlock(coef, tmp, cc.plane, cc.planeW, bx, by)
                bx += 1
              }
              by += 1
            }
          }
          if (p12) return Some(emit12Rgb(comps, width, height))
          return Some(assembleRgb(comps, width, height, hMax, vMax))
        case _ => // APPn / COM / anything with a length field
          val len = be16(b, segStart)
          if (len < 2 || segStart + len > b.length) return None
          i = segStart + len
      }
    }
    None // unreachable: the loop exits only via return
  }

  def decodeJpeg(b: Array[Byte]): Option[HeaderCodec.PixelStats] =
    decodeJpegPixels(b).map(HeaderCodec.statsOf)
}
