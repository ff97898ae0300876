package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{JpegCodec, MediaSynth, QmCoder}

class QmCoderSpec extends AnyFunSuite {

  /** Deterministic pseudorandom decisions (xorshift; no java.util.Random
    * to keep the stream pinned across JVMs). */
  private def bits(seed: Long, n: Int, biasNum: Int, biasDen: Int): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      if (math.floorMod(s, biasDen.toLong) < biasNum) 1 else 0
    }
  }

  private def roundTrip(decisions: Array[Int], nCtx: Int): Unit = {
    val enc = new QmCoder.Encoder
    val encBins = QmCoder.newBins(nCtx)
    decisions.zipWithIndex.foreach { case (d, i) => enc.encode(encBins(i % nCtx), d) }
    val data = enc.finish()
    val dec = new QmCoder.Decoder(data, 0)
    val decBins = QmCoder.newBins(nCtx)
    decisions.zipWithIndex.foreach { case (d, i) =>
      assert(dec.decode(decBins(i % nCtx)) == d, s"decision $i of ${decisions.length}")
    }
  }

  test("balanced random decisions round-trip (adaptation in both directions)") {
    roundTrip(bits(0x9e3779b97f4a7c15L, 20000, 1, 2), nCtx = 7)
  }

  test("heavily skewed streams round-trip (deep renormalization + carry)") {
    roundTrip(bits(42L, 20000, 1, 50), nCtx = 3)   // 2% ones
    roundTrip(bits(7L, 20000, 49, 50), nCtx = 3)   // 98% ones
    roundTrip(Array.fill(5000)(0), nCtx = 1)       // pure MPS run
    roundTrip(Array.fill(5000)(1), nCtx = 1)       // MPS flips then runs
  }

  test("alternating and blocky patterns round-trip (stuffing paths)") {
    roundTrip(Array.tabulate(8192)(i => i & 1), nCtx = 1)
    roundTrip(Array.tabulate(8192)(i => (i >> 5) & 1), nCtx = 2)
    // many seeds x shorter streams: varied flush states
    for (seed <- 1 to 40)
      roundTrip(bits(seed.toLong * 0x5851f42dL, 500 + seed * 13, seed % 7 + 1, 8), nCtx = 5)
  }

  test("encoded stream is marker-clean: any 0xFF is followed by <= 0x8F") {
    for (seed <- 1 to 20) {
      val enc = new QmCoder.Encoder
      val b = QmCoder.newBins(4)
      bits(seed * 977L, 4000, 1, 3).zipWithIndex.foreach { case (d, i) =>
        enc.encode(b(i % 4), d)
      }
      val data = enc.finish()
      data.indices.dropRight(1).foreach { i =>
        if ((data(i) & 0xff) == 0xff)
          assert((data(i + 1) & 0xff) <= 0x8f,
            s"seed $seed: 0xFF followed by 0x${(data(i + 1) & 0xff).toHexString}")
      }
    }
  }

  test("DC statistics model round-trips diffs across all conditioning classes") {
    val diffs = Array(0, 1, -1, 2, -2, 3, 5, -8, 17, -100, 255, -255, 1000, -2040,
      0, 0, 7, -7, 64, 1023, -1, 1, 0, 511)
    for ((l, u) <- Seq((0, 1), (0, 2), (1, 3))) {
      val enc = new QmCoder.Encoder
      val eSt = new QmCoder.DcState(l, u)
      diffs.foreach(d => QmCoder.encodeDc(enc, eSt, d))
      val data = enc.finish()
      val dec = new QmCoder.Decoder(data, 0)
      val dSt = new QmCoder.DcState(l, u)
      var expect = 0
      diffs.foreach { d =>
        expect += d
        assert(QmCoder.decodeDc(dec, dSt), s"L=$l U=$u diff=$d")
        assert(dSt.pred == expect, s"L=$l U=$u pred after diff=$d")
      }
    }
  }

  test("AC statistics model round-trips blocks incl. runs, EOB edges, high k") {
    val blocks = Seq(
      Array.fill(64)(0),                                   // immediate EOB
      { val a = new Array[Int](64); a(1) = 3; a },          // single low coef
      { val a = new Array[Int](64); a(63) = -7; a },        // coef at k=63: no EOB
      { val a = new Array[Int](64); (1 to 63).foreach(k => a(k) = if (k % 2 == 0) k else -k); a },
      { val a = new Array[Int](64); a(5) = 1; a(6) = -1; a(40) = 1000; a },
      { val a = new Array[Int](64); a(1) = -32767; a(2) = 32767; a })
    for (kx <- Seq(1, 5, 63)) {
      val enc = new QmCoder.Encoder
      val eSt = new QmCoder.AcState(kx)
      blocks.foreach(bk => QmCoder.encodeAc(enc, eSt, bk))
      val data = enc.finish()
      val dec = new QmCoder.Decoder(data, 0)
      val dSt = new QmCoder.AcState(kx)
      blocks.zipWithIndex.foreach { case (bk, i) =>
        val out = new Array[Int](64)
        assert(QmCoder.decodeAc(dec, dSt, out), s"Kx=$kx block $i")
        assert(out.drop(1).sameElements(bk.drop(1)), s"Kx=$kx block $i")
      }
    }
  }

  test("arithmetic JPEG decodes to the exact constant-block pixels, all variants") {
    for (id <- 0L until 24L) {
      val px = JpegCodec.decodeJpegPixels(MediaSynth.arithJpeg(id))
        .getOrElse(fail(s"id=$id: decode failed"))
      assert(px.width == MediaSynth.jpegWidth(id) && px.height == MediaSynth.jpegHeight(id))
      var errs = 0
      for (y <- 0 until px.height; x <- 0 until px.width) {
        val g = MediaSynth.jpegBlockGray(id, x / 8, y / 8)
        for (c <- 0 until 3)
          if ((px.rgb(3 * (y * px.width + x) + c) & 0xff) != g) errs += 1
      }
      assert(errs == 0, s"id=$id: $errs mismatched samples")
    }
  }

  test("arithmetic and Huffman codings of the same image decode identically") {
    for (id <- 0L until 12L) {
      val a = JpegCodec.decodeJpegPixels(MediaSynth.arithJpeg(id)).get
      val hfm = JpegCodec.decodeJpegPixels(MediaSynth.jpeg(id)).get
      assert(a.width == hfm.width && a.height == hfm.height, s"id=$id dims")
      assert(a.rgb.sameElements(hfm.rgb), s"id=$id pixels differ between entropy coders")
    }
  }

  test("truncation and bit flips fail closed (no crash, no misdecode-by-luck)") {
    val base = MediaSynth.arithJpeg(7L)
    // truncations inside the entropy segment must not return pixels
    for (cut <- Seq(base.length - 3, base.length - 10, base.length / 2)) {
      val res = JpegCodec.decodeJpegPixels(base.take(cut))
      assert(res.isEmpty, s"cut=$cut decoded from a truncated stream")
    }
    // random single-byte corruptions: decode either fails or returns a
    // well-formed raster (never throws, never hangs)
    for (seed <- 1 to 50) {
      val mut = base.clone()
      val pos = math.floorMod(seed * 2654435761L, (base.length - 30).toLong).toInt + 20
      mut(pos) = (mut(pos) ^ (1 << (seed % 8))).toByte
      JpegCodec.decodeJpegPixels(mut).foreach { p =>
        assert(p.rgb.length == 3 * p.width * p.height)
      }
    }
  }

  test("variant-1 files carry a parseable DAC segment and still decode") {
    val withDac = MediaSynth.arithJpeg(1L)
    val idx = (0 until withDac.length - 1).find(i =>
      (withDac(i) & 0xff) == 0xff && (withDac(i + 1) & 0xff) == 0xcc)
    assert(idx.isDefined, "variant 1 should ship a DAC segment")
    assert(JpegCodec.decodeJpegPixels(withDac).isDefined)
  }

  test("DC conditioning bounds change the decision stream (U matters)") {
    // diffs with category msb m == 2 classify small under U=2 but large
    // under U=1; interleaving them with genuinely large diffs makes the
    // large-class bins see extra decisions under the wrong U, so the
    // adaptation paths diverge (a uniform m==2 stream would only remap
    // contexts bijectively and decode identically)
    val diffs = Array.fill(40)(Seq(3, 100, -4, -100, 4, 77, -3, -77)).flatten.toArray
    val enc = new QmCoder.Encoder
    val eSt = new QmCoder.DcState(0, 2)
    diffs.foreach(d => QmCoder.encodeDc(enc, eSt, d))
    val data = enc.finish()
    val dec = new QmCoder.Decoder(data, 0)
    val dSt = new QmCoder.DcState(0, 1) // wrong U
    var prev = 0
    val decoded = diffs.map { _ =>
      if (!QmCoder.decodeDc(dec, dSt)) Int.MinValue
      else { val d = dSt.pred - prev; prev = dSt.pred; d }
    }
    assert(!decoded.sameElements(diffs), "wrong DC conditioning decoded identically")
  }

  test("AC Kx bound changes the decision stream (Kx matters)") {
    // a category >= 2 coefficient at k = 6 uses the low X-region when
    // Kx >= 6 and the high region when Kx < 6
    val block = { val a = new Array[Int](64); a(6) = 5; a(20) = -9; a }
    val enc = new QmCoder.Encoder
    val eSt = new QmCoder.AcState(6)
    (0 until 50).foreach(_ => QmCoder.encodeAc(enc, eSt, block))
    val data = enc.finish()
    val dec = new QmCoder.Decoder(data, 0)
    val dSt = new QmCoder.AcState(5) // wrong Kx
    var diverged = false
    var i = 0
    while (i < 50 && !diverged) {
      val out = new Array[Int](64)
      if (!QmCoder.decodeAc(dec, dSt, out)) diverged = true
      else if (!out.sameElements(block)) diverged = true
      i += 1
    }
    assert(diverged, "wrong AC conditioning decoded identically")
  }

  test("carry onto an emitted 0xFE byte keeps the stuffing alignment") {
    // Minimal case from the QM-core fuzz: this decision sequence makes a
    // later carry increment an already-emitted 0xFE to 0xFF. The eager
    // byte-packing encoder then had the following byte packed as 8 bits
    // while every T.81 decoder reads the byte after an 0xFF as a 7-bit
    // stuffed byte — a one-bit shear. The bit-buffer back end defers
    // packing until carries are resolved.
    val decisions = "0101000001001000111".map(_ - '0').toArray
    roundTrip(decisions, 1)
  }

  test("flush emits all cleared zero bits (last-decision edge)") {
    // Second fuzz find: with a small CT at flush time, three final
    // BYTEOUTs leave the lowest cleared zero bits unemitted; a decoder
    // 1-fills them and, when the final interval is within 2 units of
    // the chosen value, the LAST decision decodes wrong. Four rounds
    // flush through bit 0 for every CT.
    val decisions = ("0111100010101010110000010101000000000010100101101000000111" +
      "0000101100000010111000001011011000000000111001000000010010001100000" +
      "00000001010011000110100100000010010000011").map(_ - '0').toArray
    roundTrip(decisions, 1)
  }

  test("broad deterministic fuzz: many seeds, one adaptive context") {
    // Statistical net over the whole back end (carry ripple, stuffing,
    // flush depth): 400 pinned pseudorandom streams of varying bias.
    var seed = 0x9e3779b97f4a7c15L
    (0 until 400).foreach { i =>
      val n = 20 + (i * 37) % 300
      roundTrip(bits(seed + i, n, 1 + i % 9, 10), 1)
    }
  }

  test("progressive AC band scans round-trip nonzero coefficients (G.2)") {
    // A successive-approximation chain over a band with real values:
    // first scan at Al=2, then G.2.3 refinement scans at Al=1 and Al=0.
    // Exercises the correction-bit, newly-nonzero, and fixed-state sign
    // legs that the all-zero q58k corpus cannot reach.
    val cur = new Array[Int](64)
    cur(1) = 13; cur(3) = -6; cur(4) = 1; cur(10) = -29; cur(17) = 2
    cur(33) = -1; cur(50) = 7
    val ss = 1; val se = 63
    def encodeScan(al: Int, first: Boolean): Array[Byte] = {
      val enc = new QmCoder.Encoder
      val st = new QmCoder.AcState(5)
      (0 until 25).foreach { _ =>
        if (first) QmCoder.encodeAcBand(enc, st, cur, ss, se, al)
        else QmCoder.encodeAcRefine(enc, st, cur, ss, se, al)
      }
      enc.finish()
    }
    val hist = new Array[Int](64)
    Seq((2, true), (1, false), (0, false)).foreach { case (al, first) =>
      val data = encodeScan(al, first)
      val dec = new QmCoder.Decoder(data, 0)
      val st = new QmCoder.AcState(5)
      (0 until 25).foreach { _ =>
        val blk = hist.clone()
        val ok =
          if (first) QmCoder.decodeAcBand(dec, st, blk, ss, se, al)
          else QmCoder.decodeAcRefine(dec, st, blk, ss, se, al)
        assert(ok, s"scan al=$al failed")
        // after this scan the decoder must hold cur truncated to al bits
        (ss to se).foreach { k =>
          val want = math.signum(cur(k)) * ((math.abs(cur(k)) >> al) << al)
          assert(blk(k) == want, s"al=$al k=$k got=${blk(k)} want=$want")
        }
        if (al == 0) assert(blk.drop(1).sameElements(cur.drop(1)))
      }
      // advance the decoder-visible history to this precision
      (ss to se).foreach { k =>
        hist(k) = math.signum(cur(k)) * ((math.abs(cur(k)) >> al) << al)
      }
    }
  }

  test("SOF10/restart files: truncation and corruption fail closed") {
    for (base <- Seq(MediaSynth.progArithJpeg(7L), MediaSynth.arithRstJpeg(7L))) {
      // truncations inside the entropy data must not return pixels
      for (cut <- Seq(base.length - 3, base.length - 10, base.length / 2)) {
        assert(JpegCodec.decodeJpegPixels(base.take(cut)).isEmpty,
          s"cut=$cut decoded from a truncated stream")
      }
      // random single-byte corruptions: decode either fails or returns a
      // well-formed raster (never throws, never hangs)
      for (seed <- 1 to 60) {
        val mut = base.clone()
        val pos = math.floorMod(seed * 2654435761L, (base.length - 30).toLong).toInt + 20
        mut(pos) = (mut(pos) ^ (1 << (seed % 8))).toByte
        JpegCodec.decodeJpegPixels(mut).foreach { p =>
          assert(p.rgb.length == 3 * p.width * p.height)
        }
      }
    }
  }

  test("restart-interval files decode exactly; resets are load-bearing") {
    (0L until 30L).foreach { id =>
      val plain = JpegCodec.decodeJpegPixels(MediaSynth.arithJpeg(id))
      val rst = JpegCodec.decodeJpegPixels(MediaSynth.arithRstJpeg(id))
      assert(rst.isDefined, s"id=$id restart file failed to decode")
      assert(plain.get.rgb.sameElements(rst.get.rgb), s"id=$id rasters differ")
    }
    // a wrong restart NUMBER fails closed (T.81 numbering is mod 8)
    val f = MediaSynth.arithRstJpeg(0)
    var i = 2
    var patched: Array[Byte] = null
    while (patched == null && i < f.length - 1) {
      if ((f(i) & 0xff) == 0xff && (f(i + 1) & 0xff) == 0xd0) {
        patched = f.clone(); patched(i + 1) = 0xd3.toByte
      }
      i += 1
    }
    assert(patched != null, "no RST0 marker found in fixture")
    assert(JpegCodec.decodeJpegPixels(patched).isEmpty,
      "mis-numbered RSTn decoded instead of failing closed")
  }

  test("SOF2 and SOF10 codings of the same image decode identically") {
    (0L until 30L).foreach { id =>
      val huff = JpegCodec.decodeJpegPixels(MediaSynth.progressiveJpeg(id))
      val arith = JpegCodec.decodeJpegPixels(MediaSynth.progArithJpeg(id))
      assert(huff.isDefined && arith.isDefined, s"id=$id failed to decode")
      val (h, a) = (huff.get, arith.get)
      assert(h.width == a.width && h.height == a.height, s"id=$id dims differ")
      assert(h.rgb.sameElements(a.rgb), s"id=$id rasters differ")
    }
  }
}
