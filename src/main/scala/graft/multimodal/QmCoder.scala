package graft.multimodal

/** QM arithmetic coder + JPEG coefficient statistics models, per ITU
  * T.81 (arithmetic entropy coding: Annex D encoder, the Annex F/E
  * decoder procedures, Table D.3 probability estimation state machine).
  *
  * Register conventions follow the spec's software flowcharts:
  *  - decoder: 32-bit C with Chigh = bits 31..16, 16-bit A, CT bit
  *    counter; INITDEC loads `B << 16`, BYTEIN, then a 7-bit shift;
  *    BYTEIN feeds 1-bits past a marker (any 0xFF followed by > 0x8F)
  *    and consumes bit-stuffed 7-bit bytes after a data 0xFF
  *    (`C += B << 9`, CT = 7).
  *  - encoder: MPS occupies the bottom of the interval (C unchanged on
  *    an MPS, `C += A` after the Qe subtraction on an LPS) with the
  *    conditional-exchange rule when the MPS subinterval shrinks below
  *    Qe; BYTEOUT appends bits 26..19 to a bit buffer, a carry (bit 27)
  *    ripples +1 through the buffered bits, and FLUSH packs the
  *    resolved bit string into bytes with the 7-bit stuff slot after
  *    every 0xFF (see the [[Encoder]] scaladoc for why the packing must
  *    be deferred until carries are resolved).
  *
  * The statistics models are the sequential DC (F.1.4.4.1, conditioning
  * classes from the DAC L/U bounds) and AC (F.1.4.4.2, 3 decisions per
  * coefficient index, Kx splits the low/high magnitude-category state
  * regions, sign on the fixed non-adaptive state) decision trees.
  */
object QmCoder {

  /** Table D.3: Qe value, next state after MPS, next state after LPS,
    * MPS-switch flag — 113 estimation states plus the fixed
    * non-adaptive state 113 used for AC sign decisions. */
  private val Qe = Array(
    0x5a1d, 0x2586, 0x1114, 0x080b, 0x03d8, 0x01da, 0x00e5, 0x006f,
    0x0036, 0x001a, 0x000d, 0x0006, 0x0003, 0x0001, 0x5a7f, 0x3f25,
    0x2cf2, 0x207c, 0x17b9, 0x1182, 0x0cef, 0x09a1, 0x072f, 0x055c,
    0x0406, 0x0303, 0x0240, 0x01b1, 0x0144, 0x00f5, 0x00b7, 0x008a,
    0x0068, 0x004e, 0x003b, 0x002c, 0x5ae1, 0x484c, 0x3a0d, 0x2ef1,
    0x261f, 0x1f33, 0x19a8, 0x1518, 0x1177, 0x0e74, 0x0bfb, 0x09f8,
    0x0861, 0x0706, 0x05cd, 0x04de, 0x040f, 0x0363, 0x02d4, 0x025c,
    0x01f8, 0x01a4, 0x0160, 0x0125, 0x00f6, 0x00cb, 0x00ab, 0x008f,
    0x5b12, 0x4d04, 0x412c, 0x37d8, 0x2fe8, 0x293c, 0x2379, 0x1edf,
    0x1aa9, 0x174e, 0x1424, 0x119c, 0x0f6b, 0x0d51, 0x0bb6, 0x0a40,
    0x5832, 0x4d1c, 0x438e, 0x3bdd, 0x34ee, 0x2eae, 0x299a, 0x2516,
    0x5570, 0x4ca9, 0x44d9, 0x3e22, 0x3824, 0x32b4, 0x2e17, 0x56a8,
    0x4f46, 0x47e5, 0x41cf, 0x3c3d, 0x375e, 0x5231, 0x4c0f, 0x4639,
    0x415e, 0x5627, 0x50e7, 0x4b85, 0x5597, 0x504f, 0x5a10, 0x5522,
    0x59eb, 0x5a1d)

  private val Nmps = Array(
    1, 2, 3, 4, 5, 6, 7, 8,
    9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24,
    25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40,
    41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56,
    57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72,
    73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71,
    89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104,
    105, 106, 107, 103, 109, 110, 111, 112,
    112, 113)

  private val Nlps = Array(
    1, 14, 16, 18, 20, 23, 25, 28,
    30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48,
    49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67,
    68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53,
    54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87,
    87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86,
    88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107,
    103, 105, 108, 109, 110, 111, 110, 112,
    112, 113)

  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 0, 0, 1, 0, 1, 0,
    1, 0)

  /** One adaptive binary context: estimation-state index + current MPS.
    * Index 113 is the fixed state (sign decisions): its next-state
    * entries point back to itself, so it never adapts. */
  final class Bin(var idx: Int = 0, var mps: Int = 0) {
    def reset(): Unit = { idx = 0; mps = 0 }
  }

  def newBins(n: Int): Array[Bin] = Array.fill(n)(new Bin())
  def fixedBin(): Bin = new Bin(113, 0)

  // ------------------------------------------------------------- decoder

  /** Annex E/F decoder over one entropy-coded segment of `data`
    * starting at `start`; reading past the terminating marker feeds
    * 1-bits per the spec, so truncation cannot run off the buffer. */
  final class Decoder(data: Array[Byte], start: Int) {
    private var bp = start
    private var c: Long = 0L
    private var a: Int = 0
    private var ct: Int = 0

    private def byteAt(p: Int): Int =
      if (p < data.length) data(p) & 0xff else 0xff // EOF behaves as a marker

    private def bytein(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 } // marker: feed 1s
        else { bp += 1; c += (byteAt(bp).toLong << 9); ct = 7 }
      } else { bp += 1; c += (byteAt(bp).toLong << 8); ct = 8 }
    }

    // INITDEC
    {
      c = byteAt(bp).toLong << 16
      bytein()
      c <<= 7; ct -= 7
      a = 0x8000
    }

    /** Position of the byte the decoder is looking at — after a clean
      * segment this is inside the terminating marker's 0xFF. */
    def bytePos: Int = bp

    private def renormd(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) bytein()
        a = (a << 1) & 0xffff
        c = (c << 1) & 0xffffffffL
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }

    /** DECODE(S) per the spec flowcharts with conditional exchange. */
    def decode(s: Bin): Int = {
      val qe = Qe(s.idx)
      a -= qe
      val chigh = ((c >>> 16) & 0xffff).toInt
      if (chigh < a) {
        if ((a & 0x8000) != 0) s.mps
        else {
          // MPS_EXCHANGE
          val d =
            if (a < qe) {
              val r = 1 - s.mps
              if (Switch(s.idx) == 1) s.mps = 1 - s.mps
              s.idx = Nlps(s.idx); r
            } else { val r = s.mps; s.idx = Nmps(s.idx); r }
          renormd(); d
        }
      } else {
        // LPS_EXCHANGE
        c -= a.toLong << 16
        val d =
          if (a < qe) { val r = s.mps; s.idx = Nmps(s.idx); r }
          else {
            val r = 1 - s.mps
            if (Switch(s.idx) == 1) s.mps = 1 - s.mps
            s.idx = Nlps(s.idx); r
          }
        a = qe
        renormd(); d
      }
    }
  }

  // ------------------------------------------------------------- encoder

  /** Annex D encoder. Output is a fully stuffed entropy segment (no
    * trailing marker — the caller appends EOI/RSTn/SOS).
    *
    * The back end is a BIT buffer, not a byte buffer: each BYTEOUT
    * appends 8 raw stream bits and applies any carry as a +1 ripple on
    * the bits already emitted; [[finish]] packs the resolved bit string
    * into bytes, inserting the 7-bit stuff slot after every 0xFF at
    * pack time. Eager byte finalization (the first version of this
    * class) is subtly wrong: a carry can increment an already-written
    * 0xFE to 0xFF, and the byte after it — already packed as a full
    * 8-bit byte — is then read by every T.81 decoder as a 7-bit stuffed
    * byte, shearing the stream by one bit (caught by a QM-core fuzz;
    * QmCoderSpec pins the minimal case). Deferring the byte split until
    * all carries are known resolves every such interaction, and emits
    * bit-identical output on streams the eager scheme handled. */
  final class Encoder {
    private var c: Long = 0L
    private var a: Int = 0x8000
    private var ct: Int = 12
    private val bits = new scala.collection.mutable.ArrayBuffer[Int](1024)

    private def byteout(): Unit = {
      val t = ((c >>> 19) & 0x1ff).toInt
      if (t > 0xff) {
        // carry: +1 on the emitted bit string, rippling through 1s
        var i = bits.length - 1
        while (i >= 0 && bits(i) == 1) { bits(i) = 0; i -= 1 }
        require(i >= 0, "QM encoder: carry before first bit")
        bits(i) = 1
      }
      var k = 7
      while (k >= 0) { bits += (t >> k) & 1; k -= 1 }
      c &= 0x7ffff
      ct = 8
    }

    private def renorme(): Unit = {
      var go = true
      while (go) {
        a = (a << 1) & 0x1ffff
        c = (c << 1) & 0xfffffffL
        ct -= 1
        if (ct == 0) byteout()
        go = (a & 0x8000) == 0
      }
    }

    /** ENCODE one decision in context `s`. */
    def encode(s: Bin, bit: Int): Unit = {
      val qe = Qe(s.idx)
      if (bit == s.mps) {
        // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) { c += a; a = qe } // conditional exchange: MPS on top
          s.idx = Nmps(s.idx)
          renorme()
        }
      } else {
        // CODELPS
        a -= qe
        if (a < qe) () // conditional exchange: LPS takes the bottom
        else { c += a; a = qe }
        if (Switch(s.idx) == 1) s.mps = 1 - s.mps
        s.idx = Nlps(s.idx)
        renorme()
      }
    }

    /** D.1.8 flush: choose the interval value with the most trailing
      * zeros, push the remaining register bits out, then pack the
      * resolved bit string into stuffed bytes. */
    def finish(): Array[Byte] = {
      // CLEARBITS
      val t = (c + a - 1) & 0xffff0000L
      c = if (t < c) t + 0x8000 else t
      // final byteouts: simulate the remaining CT shifts. FOUR rounds,
      // not three: round k flushes down to bit (27-ct-8k) of the
      // cleared register, so with a small ct three rounds can leave the
      // lowest cleared zero bits unemitted — a decoder 1-fills them,
      // and when the interval top is within 2 of the chosen value that
      // pushes the reconstruction out of the final interval and the
      // LAST decision decodes wrong (QM-core fuzz, ~2e-5 of streams;
      // QmCoderSpec pins the minimal case). k=3 reaches bit -5-ct < 0
      // for every ct, so all sixteen cleared bits are always in the
      // stream and the 1-fill tail stays strictly below one c-unit.
      var k = 0
      while (k < 4) {
        c = (c << ct) & 0xfffffffL
        byteout()
        k += 1
      }
      // pack: 8 bits per byte, 7 after any 0xFF (stuff bit 0 in the msb
      // slot — carries are fully resolved, so it is always clear)
      val out = new scala.collection.mutable.ArrayBuffer[Int](bits.length / 8 + 2)
      var i = 0
      var stuffed = false
      while (i < bits.length) {
        val width = if (stuffed) 7 else 8
        var v = 0
        var j = 0
        while (j < width) {
          v = (v << 1) | (if (i < bits.length) bits(i) else 0)
          i += 1; j += 1
        }
        out += v
        stuffed = v == 0xff
      }
      // a trailing data 0xFF directly before the caller's marker would
      // read as a marker start: terminate it with a stuffed zero byte
      if (out.nonEmpty && out.last == 0xff) out += 0x00
      val arr = new Array[Byte](out.length)
      var p = 0
      while (p < out.length) { arr(p) = out(p).toByte; p += 1 }
      arr
    }
  }

  // ---------------------------------------------- DC/AC statistics model

  /** Sequential DC difference, decode side (F.1.4.4.1). `dcBins` has 64
    * contexts per the spec layout: 20 conditioning-tree states (5
    * classes x {S0,SS,SP,SN}) then X/M magnitude states at 20..48.
    * Returns the new DC value; updates `ctx` (the conditioning class
    * carried between blocks of one component). */
  final class DcState(val L: Int, val U: Int) {
    val bins: Array[Bin] = newBins(64)
    var ctx: Int = 0
    var pred: Int = 0
    def reset(): Unit = { bins.foreach(_.reset()); ctx = 0; pred = 0 }
  }

  /** AC coefficients, one component-scan pairing (F.1.4.4.2): 256
    * contexts — 3 per index k (EOB / zero / first-magnitude), category
    * trees at 189 (k <= Kx) and 217 (k > Kx), mantissas at +14. */
  final class AcState(val Kx: Int) {
    val bins: Array[Bin] = newBins(256)
    val sign: Bin = fixedBin()
    def reset(): Unit = { bins.foreach(_.reset()); sign.idx = 113; sign.mps = 0 }
  }

  /** F.1.4.4.1.2 conditioning class of a NONZERO diff from its magnitude
    * category msb `m` (a zero diff is classed 0 at the decision point).
    * Defaults L=0, U=1: magnitude 1 is "small", >= 2 is "large". */
  private def classify(m: Int, sign: Int, L: Int, U: Int): Int =
    if (m < ((1 << L) >> 1)) 0
    else if (m > ((1 << U) >> 1)) 12 + sign * 4
    else 4 + sign * 4

  /** Decode one DC difference and fold it into the prediction. Returns
    * false on a malformed magnitude category. */
  def decodeDc(dec: Decoder, st: DcState): Boolean = {
    val b = st.bins
    val s0 = st.ctx
    if (dec.decode(b(s0)) == 0) { st.ctx = 0; return true } // diff = 0
    val sign = dec.decode(b(s0 + 1))
    var m = dec.decode(b(s0 + 2 + sign))
    var stIdx = 20
    if (m != 0) {
      while (dec.decode(b(stIdx)) != 0) {
        m <<= 1
        if (m == 0x8000) return false
        stIdx += 1
      }
    }
    st.ctx = classify(m, sign, st.L, st.U)
    var v = m
    stIdx += 14
    while ({ m >>= 1; m != 0 }) if (dec.decode(b(stIdx)) != 0) v |= m
    v += 1
    st.pred += (if (sign == 1) -v else v)
    true
  }

  /** Encode one DC difference (dual of [[decodeDc]]). */
  def encodeDc(enc: Encoder, st: DcState, diff: Int): Unit = {
    val b = st.bins
    val s0 = st.ctx
    if (diff == 0) { enc.encode(b(s0), 0); st.ctx = 0; return }
    enc.encode(b(s0), 1)
    val sign = if (diff < 0) 1 else 0
    enc.encode(b(s0 + 1), sign)
    val v = math.abs(diff) - 1
    // magnitude category: msb m of v (0 if v == 0)
    var m = Integer.highestOneBit(v)
    enc.encode(b(s0 + 2 + sign), if (m != 0) 1 else 0)
    var stIdx = 20
    if (m != 0) {
      var cat = m
      while (cat > 1) { enc.encode(b(stIdx), 1); stIdx += 1; cat >>= 1 }
      enc.encode(b(stIdx), 0)
    }
    st.ctx = classify(m, sign, st.L, st.U)
    stIdx += 14
    var mm = m >> 1
    while (mm != 0) { enc.encode(b(stIdx), if ((v & mm) != 0) 1 else 0); mm >>= 1 }
    st.pred += diff
  }

  /** Decode the 63 AC coefficients of one block into `coefZig`
    * (zigzag-indexed positions 1..63). Returns false on malformed
    * streams. */
  def decodeAc(dec: Decoder, st: AcState, coefZig: Array[Int]): Boolean =
    decodeAcBand(dec, st, coefZig, 1, 63, 0)

  /** Band-limited, point-transformed AC decode — the sequential
    * F.1.4.4.2 model applied to a progressive first scan (T.81 G.2):
    * positions run `ss..se`, contexts stay indexed by ABSOLUTE k (the
    * triplet for position k is `3*(k-1)`, Kx comparison on k), and each
    * decoded value lands in `coefZig(k)` shifted up by the scan's
    * successive-approximation low bit `al`. (ss=1, se=63, al=0) IS the
    * sequential decode. */
  def decodeAcBand(dec: Decoder, st: AcState, coefZig: Array[Int],
      ss: Int, se: Int, al: Int): Boolean = {
    val b = st.bins
    var k = ss
    while (k <= se) {
      var s = 3 * (k - 1)
      if (dec.decode(b(s)) == 1) return true // EOB
      while (dec.decode(b(s + 1)) == 0) {
        s += 3; k += 1
        if (k > se) return false
      }
      val sign = dec.decode(st.sign)
      var m = dec.decode(b(s + 2))
      var stIdx = -1
      if (m != 0) {
        if (dec.decode(b(s + 2)) != 0) {
          m <<= 1
          stIdx = if (k <= st.Kx) 189 else 217
          while (dec.decode(b(stIdx)) != 0) {
            m <<= 1
            if (m == 0x8000) return false
            stIdx += 1
          }
        }
      }
      var v = m
      val mant = if (stIdx < 0) s + 2 + 14 else stIdx + 14
      while ({ m >>= 1; m != 0 }) if (dec.decode(b(mant)) != 0) v |= m
      v += 1
      coefZig(k) = (if (sign == 1) -v else v) << al
      k += 1
    }
    true
  }

  /** Encode the 63 AC coefficients (dual of [[decodeAc]]). */
  def encodeAc(enc: Encoder, st: AcState, coefZig: Array[Int]): Unit =
    encodeAcBand(enc, st, coefZig, 1, 63, 0)

  /** Dual of [[decodeAcBand]]: the coefficient coded at position k is
    * the point-transformed `sign * (|coefZig(k)| >> al)` — a magnitude
    * that shifts to zero is a zero of this scan. */
  def encodeAcBand(enc: Encoder, st: AcState, coefZig: Array[Int],
      ss: Int, se: Int, al: Int): Unit = {
    val b = st.bins
    def mag(k: Int): Int = math.abs(coefZig(k)) >> al
    var last = se
    while (last >= ss && mag(last) == 0) last -= 1
    var k = ss
    while (k <= last) {
      var s = 3 * (k - 1)
      enc.encode(b(s), 0) // not EOB
      while (mag(k) == 0) {
        enc.encode(b(s + 1), 0)
        s += 3; k += 1
      }
      enc.encode(b(s + 1), 1)
      val sign = if (coefZig(k) < 0) 1 else 0
      enc.encode(st.sign, sign)
      val v = mag(k) - 1
      var m = Integer.highestOneBit(v)
      enc.encode(b(s + 2), if (m != 0) 1 else 0)
      var stIdx = -1
      if (m != 0) {
        if (m > 1) {
          enc.encode(b(s + 2), 1)
          stIdx = if (k <= st.Kx) 189 else 217
          var cat = m >> 1
          while (cat > 1) { enc.encode(b(stIdx), 1); stIdx += 1; cat >>= 1 }
          enc.encode(b(stIdx), 0)
        } else enc.encode(b(s + 2), 0)
      }
      val mant = if (stIdx < 0) s + 2 + 14 else stIdx + 14
      var mm = m >> 1
      while (mm != 0) { enc.encode(b(mant), if ((v & mm) != 0) 1 else 0); mm >>= 1 }
      k += 1
    }
    // EOB decision for the position after the last coded coefficient
    // sits at state 3*max(last, ss-1); when the band is full (last ==
    // se) no EOB is coded, mirroring the decoder
    if (last < se) enc.encode(b(3 * math.max(last, ss - 1)), 1)
  }

  /** AC successive-approximation refinement, decode side (T.81 G.2.3).
    * `coefZig` holds the block's history from prior scans (zigzag
    * positions ss..se) and is refined in place at low bit `al`. The
    * context triplet for position k is `3*(k-1)`: +0 the end-of-block
    * decision (consulted only once the walk has passed kex, the last
    * position with NONZERO history), +1 the newly-nonzero decision for
    * zero-history positions, +2 the correction bit for nonzero-history
    * positions; signs of newly-nonzero coefficients use the fixed
    * (non-adapting) state. */
  def decodeAcRefine(dec: Decoder, st: AcState, coefZig: Array[Int],
      ss: Int, se: Int, al: Int): Boolean = {
    val b = st.bins
    val p1 = 1 << al
    var kex = se
    while (kex >= ss && coefZig(kex) == 0) kex -= 1
    var k = ss
    while (k <= se) {
      var s = 3 * (k - 1)
      if (k > kex && dec.decode(b(s)) == 1) return true // EOB: rest unchanged
      var placed = false
      while (!placed) {
        val cv = coefZig(k)
        if (cv != 0) {
          if (dec.decode(b(s + 2)) == 1)
            coefZig(k) = if (cv < 0) cv - p1 else cv + p1
          placed = true
        } else if (dec.decode(b(s + 1)) == 1) {
          coefZig(k) = if (dec.decode(st.sign) == 1) -p1 else p1
          placed = true
        } else {
          k += 1
          if (k > se) return false
          s += 3
        }
      }
      k += 1
    }
    true
  }

  /** Dual of [[decodeAcRefine]] — a decoder simulation over the FULL
    * coefficient values `curZig`: the history the decoder holds is
    * derived as the magnitude truncated to the previous precision
    * (`(|v| >> (al+1)) << (al+1)`), the correction bit for a
    * nonzero-history position is bit al of |v|, and a zero-history
    * position turns newly nonzero exactly when `|v| >> al == 1`. The
    * end-of-block flag is emitted at the first consultation point past
    * both kex and the last position with anything to transmit. */
  def encodeAcRefine(enc: Encoder, st: AcState, curZig: Array[Int],
      ss: Int, se: Int, al: Int): Unit = {
    val b = st.bins
    def histMag(k: Int): Int = (math.abs(curZig(k)) >> (al + 1)) << (al + 1)
    def curMag(k: Int): Int = math.abs(curZig(k)) >> al
    var kex = se
    while (kex >= ss && histMag(kex) == 0) kex -= 1
    var kem = ss - 1 // last position with a 1-bit or a new coefficient
    var j = ss
    while (j <= se) {
      if (if (histMag(j) != 0) (curMag(j) & 1) == 1 else curMag(j) == 1) kem = j
      j += 1
    }
    var k = ss
    while (k <= se) {
      var s = 3 * (k - 1)
      if (k > kex) {
        if (k > kem) { enc.encode(b(s), 1); return } // EOB
        enc.encode(b(s), 0)
      }
      var placed = false
      while (!placed) {
        if (histMag(k) != 0) {
          enc.encode(b(s + 2), curMag(k) & 1)
          placed = true
        } else if (curMag(k) == 1) {
          enc.encode(b(s + 1), 1)
          enc.encode(st.sign, if (curZig(k) < 0) 1 else 0)
          placed = true
        } else {
          enc.encode(b(s + 1), 0)
          k += 1
          s += 3
        }
      }
      k += 1
    }
  }
}
