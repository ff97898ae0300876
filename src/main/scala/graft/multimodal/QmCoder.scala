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
  *    Qe; BYTEOUT emits bits 26..19, a carry (bit 27) increments the
  *    last written byte (never ripples further: a byte following 0xFF
  *    is written in bit-stuffed 7-bit form whose spare msb absorbs the
  *    carry, which is the purpose of T.81's bit stuffing).
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
    * trailing marker — the caller appends EOI/RSTn). */
  final class Encoder {
    private var lastWasFF = false
    private var c: Long = 0L
    private var a: Int = 0x8000
    private var ct: Int = 12
    private val bytes = new scala.collection.mutable.ArrayBuffer[Int](256)

    private def byteout(): Unit = {
      if (lastWasFF) {
        // bit-stuffed byte: 7 data bits, spare msb absorbs any carry
        val b = ((c >>> 19) & 0xff).toInt
        require(b <= 0x8f, s"QM encoder: stuffed byte 0x${b.toHexString} in marker range")
        bytes += b
        c &= 0x7ffff
      } else {
        val t = ((c >>> 19) & 0x1ff).toInt
        if (t > 0xff) {
          // carry: increments the previous byte; that byte is < 0xFF on
          // this path (an 0xFF would have put us in the stuffed branch),
          // so the increment can never ripple further
          require(bytes.nonEmpty, "QM encoder: carry before first byte")
          bytes(bytes.length - 1) += 1
          require(bytes(bytes.length - 1) <= 0xff, "QM encoder: carry ripple")
        }
        bytes += (t & 0xff)
        c &= 0x7ffff
      }
      lastWasFF = bytes.last == 0xff
      ct = if (lastWasFF) 7 else 8
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
      * zeros, then push the remaining register bits out. */
    def finish(): Array[Byte] = {
      // CLEARBITS
      val t = (c + a - 1) & 0xffff0000L
      c = if (t < c) t + 0x8000 else t
      // final byteouts: simulate the remaining CT shifts, three times
      var k = 0
      while (k < 3) {
        c = (c << ct) & 0xfffffffL
        byteout()
        k += 1
      }
      val arr = new Array[Byte](bytes.length)
      var i = 0
      while (i < bytes.length) { arr(i) = bytes(i).toByte; i += 1 }
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
  def decodeAc(dec: Decoder, st: AcState, coefZig: Array[Int]): Boolean = {
    val b = st.bins
    var k = 1
    while (k <= 63) {
      var s = 3 * (k - 1)
      if (dec.decode(b(s)) == 1) return true // EOB
      while (dec.decode(b(s + 1)) == 0) {
        s += 3; k += 1
        if (k > 63) return false
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
      coefZig(k) = if (sign == 1) -v else v
      k += 1
    }
    true
  }

  /** Encode the 63 AC coefficients (dual of [[decodeAc]]). */
  def encodeAc(enc: Encoder, st: AcState, coefZig: Array[Int]): Unit = {
    val b = st.bins
    var last = 63
    while (last >= 1 && coefZig(last) == 0) last -= 1
    var k = 1
    while (k <= last) {
      var s = 3 * (k - 1)
      enc.encode(b(s), 0) // not EOB
      while (coefZig(k) == 0) {
        enc.encode(b(s + 1), 0)
        s += 3; k += 1
      }
      enc.encode(b(s + 1), 1)
      val c = coefZig(k)
      val sign = if (c < 0) 1 else 0
      enc.encode(st.sign, sign)
      val v = math.abs(c) - 1
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
    // EOB decision for k = last+1 sits at state 3*((last+1)-1); when the
    // block is full (last == 63) no EOB is coded, mirroring the decoder
    if (last < 63) enc.encode(b(3 * last), 1)
  }
}
