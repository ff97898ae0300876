package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode: byte-exact round trip of the DC-only generator
  * (all three variants), bidirectional cross-validation against
  * javax.imageio (their decoder on our files exactly; our decoder on
  * their AC-bearing files within IDCT tolerance), truncation fuzz, and
  * forged-header allocation guards. */
class JpegCodecSpec extends AnyFunSuite {

  private def expected(id: Long): (Int, Int, Long) = {
    val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
    var sum = 0L
    for (by <- 0 until h / 8; bx <- 0 until w / 8)
      sum += 64L * MediaSynth.jpegBlockGray(id, bx, by)
    (w, h, sum)
  }

  test("DC-only generator decodes byte-exactly in all three variants") {
    // ids cover grayscale (0 mod 3), 4:4:4 (1 mod 3), 4:2:0+DRI (2 mod 3)
    (0L until 30L).foreach { id =>
      val px = JpegCodec.decodeJpegPixels(MediaSynth.jpeg(id))
        .getOrElse(fail(s"decode failed for id=$id"))
      val (w, h, sum) = expected(id)
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      // every pixel equals its block's formula value, all three channels
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaSynth.jpegBlockGray(id, x / 8, y / 8)
        assert(px.r(x, y) == g && px.g(x, y) == g && px.b(x, y) == g,
          s"pixel ($x,$y) of id=$id: got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want $g")
      }
      val st = HeaderCodec.statsOf(px)
      assert((st.sumR, st.sumG, st.sumB) == (sum, sum, sum), s"sums for id=$id")
    }
  }

  test("javax.imageio decodes our generated JPEGs to the same pixels") {
    Seq(0L, 1L, 2L, 7L, 11L, 17L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(MediaSynth.jpeg(id)))
      assert(img != null, s"imageio rejected our JPEG for id=$id")
      assert((img.getWidth, img.getHeight) ==
        (MediaSynth.jpegWidth(id), MediaSynth.jpegHeight(id)))
      // read RAW raster samples: getRGB on a grayscale BufferedImage runs
      // the ColorModel's linear-gray→sRGB gamma transform (11 becomes 59),
      // which is presentation color management, not JPEG decoding
      val raster = img.getRaster
      val bands = raster.getNumBands
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth;
           band <- 0 until bands) {
        val g = MediaSynth.jpegBlockGray(id, x / 8, y / 8)
        val got = raster.getSample(x, y, band)
        // DC-only constant blocks are exact through any correct decoder
        assert(got == g,
          s"imageio raster ($x,$y) band $band of id=$id: got $got, want $g")
      }
    }
  }

  test("our decoder reads imageio-encoded AC-bearing JPEGs within IDCT tolerance") {
    // a real gradient image: quantized AC coefficients everywhere, 4:2:0
    // or 4:4:4 as imageio's encoder chooses — decoders may differ by a
    // couple of counts per pixel (IDCT + upsampling conventions), never more
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 255 / (w - 1) + y * 7 + (x * y) % 31) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = buf.toByteArray
    val ours = JpegCodec.decodeJpegPixels(bytes)
      .getOrElse(fail("decoder rejected an imageio-written baseline JPEG"))
    val theirs = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert((ours.width, ours.height) == (theirs.getWidth, theirs.getHeight))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = theirs.getRGB(x, y)
      maxDelta = math.max(maxDelta, math.abs(ours.r(x, y) - ((rgb >> 16) & 0xff)))
      maxDelta = math.max(maxDelta, math.abs(ours.g(x, y) - ((rgb >> 8) & 0xff)))
      maxDelta = math.max(maxDelta, math.abs(ours.b(x, y) - (rgb & 0xff)))
    }
    assert(maxDelta <= 3,
      s"pixel delta $maxDelta vs imageio — IDCT/upsampling disagreement too large")
  }

  test("truncation anywhere returns None, never throws") {
    val full = MediaSynth.jpeg(5L) // 4:2:0 variant with restart markers
    (0 until full.length - 1).foreach { n =>
      assert(JpegCodec.decodeJpegPixels(full.take(n)).isEmpty,
        s"truncated at $n bytes must not decode")
    }
  }

  test("bit-flip fuzz never throws or allocation-bombs") {
    val rnd = new scala.util.Random(42)
    val base = MediaSynth.jpeg(8L)
    (0 until 500).foreach { _ =>
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        val p = rnd.nextInt(mutated.length)
        mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      JpegCodec.decodeJpegPixels(mutated) // Some or None, must not throw
    }
  }

  test("a forged SOF claiming huge dimensions is rejected before allocating") {
    // take a valid file and rewrite the SOF dims to 65000x65000 — the
    // entropy data cannot justify 4.2 Gpx, so the cap must reject it
    val b = MediaSynth.jpeg(0L)
    var i = 2
    var sofAt = -1
    while (sofAt < 0 && i + 4 < b.length) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0) sofAt = i
      else i += 1
    }
    assert(sofAt > 0)
    val forged = b.clone()
    forged(sofAt + 5) = 0xfd.toByte; forged(sofAt + 6) = 0xe8.toByte // h=65000
    forged(sofAt + 7) = 0xfd.toByte; forged(sofAt + 8) = 0xe8.toByte // w=65000
    val t0 = System.nanoTime()
    assert(JpegCodec.decodeJpegPixels(forged).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "rejection must be fast, not a decode attempt")
  }

  test("a 0xFF fill-byte run ending near EOF returns None, never throws") {
    // review-caught: the fill-byte skip advanced past the bounds check,
    // so the length-field read threw ArrayIndexOutOfBounds on inputs
    // like FF D8 FF FF FF DB
    val crafted = Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xdb).map(_.toByte)
    assert(JpegCodec.decodeJpegPixels(crafted).isEmpty)
    // and the general family: SOI + any run of fill bytes, truncated
    (1 to 6).foreach { n =>
      val b = (Seq(0xff, 0xd8) ++ Seq.fill(n)(0xff)).map(_.toByte).toArray
      assert(JpegCodec.decodeJpegPixels(b).isEmpty, s"fill run of $n")
    }
  }

  test("grayscale sampling factors do not change the scan layout (T.81 A.2)") {
    // A single-component scan is non-interleaved: one 8x8 data unit per
    // MCU, row-major over ceil(w/8) x ceil(h/8), sampling factors ignored.
    // Patch a 32x16 grayscale file's declared sampling from 1x1 to 2x2 —
    // the entropy data is unchanged, so a correct decoder must produce
    // identical pixels. (An interleaved-layout bug instead reorders the 8
    // distinct blocks silently: same block count at w,h multiples of 16.)
    val original = MediaSynth.jpeg(12L) // grayscale, 32x16
    assert(MediaSynth.jpegWidth(12L) == 32 && MediaSynth.jpegHeight(12L) == 16)
    var i = 2
    while (!((original(i) & 0xff) == 0xff && (original(i + 1) & 0xff) == 0xc0)) i += 1
    val patched = original.clone()
    assert((patched(i + 11) & 0xff) == 0x11, "component sampling byte located")
    patched(i + 11) = 0x22.toByte
    val base = JpegCodec.decodeJpegPixels(original)
      .getOrElse(fail("original grayscale file must decode"))
    val got = JpegCodec.decodeJpegPixels(patched)
      .getOrElse(fail("2x2-sampled grayscale file must decode"))
    assert((got.width, got.height) == (base.width, base.height))
    for (y <- 0 until base.height; x <- 0 until base.width)
      assert(got.r(x, y) == base.r(x, y) && got.g(x, y) == base.g(x, y) &&
        got.b(x, y) == base.b(x, y),
        s"pixel ($x,$y) moved when only the declared sampling changed")
    // javax.imageio agrees the patched file is the same image
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(patched))
    if (img != null) {
      val raster = img.getRaster
      for (y <- 0 until base.height; x <- 0 until base.width)
        assert(raster.getSample(x, y, 0) == (base.r(x, y) & 0xff),
          s"imageio disagrees at ($x,$y) on the patched file")
    }
  }

  test("malformed-progressive marker falls to None; mislabeled SOF9 never crashes") {
    val b = MediaSynth.jpeg(0L)
    var i = 2
    while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0)) i += 1
    // flipping SOF0→SOF2 leaves the baseline scan header (Ss=0, Se=63)
    // behind, which violates the progressive DC-band rule Ss=0 ⇒ Se=0 —
    // fail closed, not half-decode
    val progressive = b.clone(); progressive(i + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpegPixels(progressive).isEmpty)
    // SOF9 decodes for real now; a Huffman stream mislabeled as
    // arithmetic is undetectable in general (the QM coder decodes any
    // byte sequence), so the contract is: no crash, and any output is a
    // well-formed raster of the declared dimensions
    val arithmetic = b.clone(); arithmetic(i + 1) = 0xc9.toByte
    JpegCodec.decodeJpegPixels(arithmetic).foreach { p =>
      assert(p.rgb.length == 3 * p.width * p.height)
    }
    // a 12-bit-precision arithmetic frame stays out of remit
    val hierarchical = b.clone(); hierarchical(i + 1) = 0xcb.toByte
    assert(JpegCodec.decodeJpegPixels(hierarchical).isEmpty)
  }

  test("progressive DC-only generator decodes byte-exactly in all three variants") {
    // same dims/gray formula as baseline; multi-scan SOF2 with DC
    // first/refine at Al=1/0 (odd grays put real bits in the refinement
    // pass) and EOB-run AC band scans
    (0L until 30L).foreach { id =>
      val px = JpegCodec.decodeJpegPixels(MediaSynth.progressiveJpeg(id))
        .getOrElse(fail(s"progressive decode failed for id=$id"))
      val (w, h, sum) = expected(id)
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      for (y <- 0 until h; x <- 0 until w) {
        val g = MediaSynth.jpegBlockGray(id, x / 8, y / 8)
        assert(px.r(x, y) == g && px.g(x, y) == g && px.b(x, y) == g,
          s"pixel ($x,$y) of id=$id: got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want $g")
      }
      val st = HeaderCodec.statsOf(px)
      assert((st.sumR, st.sumG, st.sumB) == (sum, sum, sum), s"sums for id=$id")
    }
  }

  test("javax.imageio decodes our generated progressive JPEGs to the same pixels") {
    Seq(0L, 1L, 2L, 7L, 11L, 17L).foreach { id =>
      val img = javax.imageio.ImageIO.read(
        new ByteArrayInputStream(MediaSynth.progressiveJpeg(id)))
      assert(img != null, s"imageio rejected our progressive JPEG for id=$id")
      assert((img.getWidth, img.getHeight) ==
        (MediaSynth.jpegWidth(id), MediaSynth.jpegHeight(id)))
      val raster = img.getRaster
      val bands = raster.getNumBands
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth;
           band <- 0 until bands) {
        val g = MediaSynth.jpegBlockGray(id, x / 8, y / 8)
        assert(raster.getSample(x, y, band) == g,
          s"imageio raster ($x,$y) band $band of id=$id")
      }
    }
  }

  test("our decoder reads imageio progressive-encoded AC-bearing JPEGs within IDCT tolerance") {
    // the JDK writer's standard progressive script: spectral selection,
    // successive approximation (DC and AC first + refinement passes),
    // EOB runs — everything the multi-scan machinery must handle
    val w = 40; val h = 24
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val v = (x * 255 / (w - 1) + y * 7 + (x * y) % 31) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val buf = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.95f)
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val bytes = buf.toByteArray
    // confirm the writer actually emitted SOF2
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "test premise: imageio emitted a progressive (SOF2) file")
    val ours = JpegCodec.decodeJpegPixels(bytes)
      .getOrElse(fail("decoder rejected an imageio-written progressive JPEG"))
    val theirs = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert((ours.width, ours.height) == (theirs.getWidth, theirs.getHeight))
    var maxDelta = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = theirs.getRGB(x, y)
      maxDelta = math.max(maxDelta, math.abs(ours.r(x, y) - ((rgb >> 16) & 0xff)))
      maxDelta = math.max(maxDelta, math.abs(ours.g(x, y) - ((rgb >> 8) & 0xff)))
      maxDelta = math.max(maxDelta, math.abs(ours.b(x, y) - (rgb & 0xff)))
    }
    assert(maxDelta <= 3,
      s"pixel delta $maxDelta vs imageio on progressive — decode disagreement too large")
  }

  test("progressive truncation anywhere returns None, never throws") {
    val full = MediaSynth.progressiveJpeg(5L) // 4:2:0 variant with restarts
    (0 until full.length - 1).foreach { n =>
      assert(JpegCodec.decodeJpegPixels(full.take(n)).isEmpty,
        s"truncated at $n bytes must not decode")
    }
  }

  test("lossless (SOF3) decodes every predictor byte-exactly, boundaries included") {
    // ids 0..6 cover all seven T.81 H.1 predictors (pred = 1 + id % 7)
    // and, via the dims formulas, non-block-multiple widths/heights
    (0L to 13L).foreach { id =>
      val px = JpegCodec.decodeJpegPixels(MediaSynth.losslessJpeg(id))
        .getOrElse(fail(s"lossless id=$id did not decode"))
      assert(px.width == MediaSynth.losslessWidth(id))
      assert(px.height == MediaSynth.losslessHeight(id))
      (0 until px.height).foreach { y =>
        (0 until px.width).foreach { x =>
          val want = MediaSynth.losslessGray(id, x, y)
          assert(px.r(x, y) == want && px.g(x, y) == want && px.b(x, y) == want,
            s"id=$id pixel ($x,$y): got ${px.r(x, y)}, want $want")
        }
      }
    }
  }

  test("multi-component lossless falls to None, not a mis-decoded first scan") {
    // splice two extra components into the SOF3 of a valid lossless file:
    // the first scan still says ns=1, so without the frame-level guard the
    // decoder would return that single color plane as the whole image
    val base = MediaSynth.losslessJpeg(0L)
    // layout: [ffd8][ffc3 len=11 p h h w w nc comp1(3)] — SOF3 payload at 4
    val patched = new scala.collection.mutable.ArrayBuffer[Byte]()
    patched ++= base.take(15) // through comp1
    patched(5) = 17.toByte    // SOF3 length 11 -> 17
    patched(11) = 3.toByte    // nc 1 -> 3
    patched ++= Seq[Byte](2, 0x11, 0, 3, 0x11, 0) // comp2, comp3
    patched ++= base.drop(15)
    assert(JpegCodec.decodeJpegPixels(patched.toArray).isEmpty,
      "multi-component lossless must fall to the stub")
  }

  test("lossless truncation and bit-flip fuzz never throw") {
    val full = MediaSynth.losslessJpeg(3L)
    (0 until full.length - 1).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // None or Some, must not throw
    }
    val rnd = new scala.util.Random(47)
    (0 until 300).foreach { _ =>
      val mutated = full.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        val p = rnd.nextInt(mutated.length)
        mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      JpegCodec.decodeJpegPixels(mutated) // must not throw
    }
  }

  test("progressive bit-flip fuzz never throws or allocation-bombs") {
    val rnd = new scala.util.Random(43)
    val base = MediaSynth.progressiveJpeg(8L)
    (0 until 500).foreach { _ =>
      val mutated = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        val p = rnd.nextInt(mutated.length)
        mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      JpegCodec.decodeJpegPixels(mutated) // Some or None, must not throw
    }
  }

  test("12-bit SOF1 decodes to the top 8 bits of each sample, pixel-exactly") {
    (0L until 30L).foreach { id =>
      val px = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12(id))
        .getOrElse(fail(s"12-bit decode failed for id=$id"))
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      assert((px.width, px.height) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val e = MediaSynth.jpeg12Block(id, x / 8, y / 8) >> 4
        assert(px.r(x, y) == e && px.g(x, y) == e && px.b(x, y) == e,
          s"id=$id ($x,$y): got ${px.r(x, y)}, want $e")
      }
    }
  }

  test("12-bit color: YCbCr transform runs in the 12-bit domain") {
    // neutral chroma: r=g=b = the grayscale formula
    (0L until 12L).foreach { id =>
      val px = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12Color(id))
        .getOrElse(fail(s"12-bit color decode failed for id=$id"))
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      for (y <- 0 until h; x <- 0 until w) {
        val e = MediaSynth.jpeg12Block(id, x / 8, y / 8) >> 4
        assert(px.r(x, y) == e && px.g(x, y) == e && px.b(x, y) == e,
          s"id=$id ($x,$y): got ${px.r(x, y)}, want $e")
      }
    }
    // NON-neutral chroma: the transform must use the full 12-bit chroma
    // samples (a decoder transforming after the >>4 cut quantizes the
    // chroma contribution 16x coarser and diverges on these values)
    val id = 1L
    val (cb, cr) = (2048 + 200, 2048 - 300)
    val px = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12ColorOf(id, cb, cr))
      .getOrElse(fail("non-neutral 12-bit color decode failed"))
    def clamp12(v: Long): Long = if (v < 0) 0 else if (v > 4095) 4095 else v
    val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
    for (y <- 0 until h; x <- 0 until w) {
      val lum = MediaSynth.jpeg12Block(id, x / 8, y / 8)
      val er = clamp12(math.round(lum + 1.402 * (cr - 2048))) >> 4
      val eg = clamp12(math.round(lum - 0.344136 * (cb - 2048) - 0.714136 * (cr - 2048))) >> 4
      val eb = clamp12(math.round(lum + 1.772 * (cb - 2048))) >> 4
      assert(px.r(x, y) == er && px.g(x, y) == eg && px.b(x, y) == eb,
        s"($x,$y): got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want ($er,$eg,$eb)")
    }
  }

  test("12-bit progressive arithmetic (SOF10) decodes raster-identically to SOF1") {
    // the q58n composition: same jpeg12Block samples through the G.2
    // multi-scan path (DC first at Al=1, zero AC bands, DC refinement
    // bit, AC refinement) must land on the SAME pixels the one-scan
    // SOF1 file produces — both grayscale (even ids) and neutral-chroma
    // color with a DAC segment (odd ids)
    (0L until 24L).foreach { id =>
      val prog = JpegCodec.decodeJpegPixels(MediaSynth.prog12ArithJpeg(id))
        .getOrElse(fail(s"12-bit SOF10 decode failed for id=$id"))
      val seq = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12(id))
        .getOrElse(fail(s"12-bit SOF1 decode failed for id=$id"))
      assert((prog.width, prog.height) == (seq.width, seq.height))
      assert(java.util.Arrays.equals(prog.rgb, seq.rgb),
        s"id=$id: SOF10-12bit raster differs from SOF1-12bit")
    }
    // truncation anywhere fails closed, never throws
    val full = MediaSynth.prog12ArithJpeg(5L)
    (1 until full.length by 7).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // Some only if valid prefix; must not throw
    }
  }

  test("12-bit sequential arithmetic (SOF9) decodes raster-identically to SOF1") {
    // all four q58o variants: grayscale, color+DAC, grayscale+DRI=2,
    // color+DAC+DRI=2 — the coded values equal jpeg12's, so the SOF9
    // file must land on the SOF1 raster exactly
    (0L until 24L).foreach { id =>
      val arith = JpegCodec.decodeJpegPixels(MediaSynth.seq12ArithJpeg(id))
        .getOrElse(fail(s"12-bit SOF9 decode failed for id=$id"))
      val seq = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12(id))
        .getOrElse(fail(s"12-bit SOF1 decode failed for id=$id"))
      assert((arith.width, arith.height) == (seq.width, seq.height))
      assert(java.util.Arrays.equals(arith.rgb, seq.rgb),
        s"id=$id: SOF9-12bit raster differs from SOF1-12bit")
    }
    // truncation fails closed on the restart-interval variant too
    val full = MediaSynth.seq12ArithJpeg(6L) // variant 2: gray + DRI
    (1 until full.length by 5).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // must not throw
    }
  }

  test("12-bit progressive Huffman (SOF2) decodes raster-identically to SOF1") {
    // all four q58p variants: deep-category gray, q(0)=8 color (odd
    // DC-refinement bits), gray+DRI, all-ones color+DRI
    (0L until 24L).foreach { id =>
      val prog = JpegCodec.decodeJpegPixels(MediaSynth.prog12Jpeg(id))
        .getOrElse(fail(s"12-bit SOF2 decode failed for id=$id"))
      val seq = JpegCodec.decodeJpegPixels(MediaSynth.jpeg12(id))
        .getOrElse(fail(s"12-bit SOF1 decode failed for id=$id"))
      assert((prog.width, prog.height) == (seq.width, seq.height))
      assert(java.util.Arrays.equals(prog.rgb, seq.rgb),
        s"id=$id: SOF2-12bit raster differs from SOF1-12bit")
    }
    // deep DC categories actually occur: the all-ones-quant variant must
    // code at least one category > 11 (the 8-bit cap) — otherwise this
    // test wouldn't distinguish a 12-bit-aware decoder from an 8-bit one
    val deepId = 4L // variant 0: all-ones quant, grayscale
    val w = MediaSynth.jpegWidth(deepId); val hh = MediaSynth.jpegHeight(deepId)
    val maxCat = (0 until (w / 8) * (hh / 8)).scanLeft((0, 0)) { case ((pred, _), mcu) =>
      val sv = 8 * (MediaSynth.jpeg12Block(deepId, mcu % (w / 8), mcu / (w / 8)) - 2048) >> 1
      val diff = math.abs(sv - pred)
      (sv, if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(diff))
    }.map(_._2).max
    assert(maxCat > 11, s"deep-category fixture only reaches category $maxCat")
  }

  test("12-bit precision is rejected outside the DCT-frame remit") {
    // flip the fixture's SOF marker to SOF0: 12-bit baseline is illegal
    val f = MediaSynth.jpeg12(3L).clone()
    val sof = f.indices.find(i => (f(i) & 0xff) == 0xff &&
      i + 1 < f.length && (f(i + 1) & 0xff) == 0xc1).get
    f(sof + 1) = 0xc0.toByte
    assert(JpegCodec.decodeJpegPixels(f).isEmpty)
    // an 8-bit SOF1 file decodes like baseline (extended sequential)
    val g = MediaSynth.jpeg(0L).clone()
    val sof0 = g.indices.find(i => (g(i) & 0xff) == 0xff &&
      i + 1 < g.length && (g(i + 1) & 0xff) == 0xc0).get
    g(sof0 + 1) = 0xc1.toByte
    val px = JpegCodec.decodeJpegPixels(g)
      .getOrElse(fail("8-bit SOF1 should decode"))
    assert(px.r(0, 0) == MediaSynth.jpegBlockGray(0L, 0, 0))
  }
}
