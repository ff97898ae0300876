package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec
import graft.multimodal.HeaderCodec.MediaMeta

/** Byte-exact header parsing over synthesized container files, plus the
  * distributed extractMeta path with stub fallback. */
class HeaderCodecSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, depth: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h).put(depth.toByte).put(6.toByte)
    out.array()
  }

  private def bmp(w: Int, h: Int, bpp: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h)
    out.putShort(1.toShort).putShort(bpp.toShort)
    out.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val out = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(w.toShort).putShort(h.toShort)
    out.array()
  }

  /** RIFF/WAVE with a JUNK chunk BEFORE fmt (exercises the chunk walk). */
  private def wav(channels: Int, rate: Int, bits: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(100))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("JUNK".getBytes("US-ASCII")); out.write(le32(4)); out.write(le32(0))
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(rate))
    out.write(le32(rate * channels * bits / 8))
    out.write(le16(channels * bits / 8)); out.write(le16(bits))
    out.toByteArray
  }

  /** SOI, APP0 segment, then SOF0 (exercises the marker walk). */
  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(Array(0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte)) // APP0 len 4
    out.write(Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)) // SOF0, precision 8
    out.write(Array((h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3)
      .map(_.toByte))
    out.toByteArray
  }

  test("sniff parses PNG/BMP/GIF/WAV/JPEG headers byte-exactly") {
    assert(HeaderCodec.sniff(png(800, 600, 8))
      .contains(MediaMeta("png", 800, 600, 0, 0, 8)))
    assert(HeaderCodec.sniff(bmp(1024, 768, 24))
      .contains(MediaMeta("bmp", 1024, 768, 0, 0, 24)))
    assert(HeaderCodec.sniff(gif(320, 200))
      .contains(MediaMeta("gif", 320, 200, 0, 0, 0)))
    assert(HeaderCodec.sniff(wav(2, 44100, 16))
      .contains(MediaMeta("wav", 0, 0, 2, 44100, 16)))
    assert(HeaderCodec.sniff(jpeg(640, 480))
      .contains(MediaMeta("jpeg", 640, 480, 3, 0, 8)))
    // negative height BMPs (top-down rows) normalize to positive
    assert(HeaderCodec.sniff(bmp(10, -20, 32)).get.height == 20)
  }

  test("unknown and truncated payloads are rejected, not misparsed") {
    assert(HeaderCodec.sniff("plain text document".getBytes("UTF-8")).isEmpty)
    assert(HeaderCodec.sniff("BM".getBytes("US-ASCII")).isEmpty) // truncated
    assert(HeaderCodec.sniff(Array.empty[Byte]).isEmpty)
    assert(HeaderCodec.sniff(png(1, 1, 8).take(20)).isEmpty)
  }

  test("JPEG edge cases: truncation after SOF width, fill bytes, TEM marker") {
    val full = jpeg(640, 480)
    // truncated exactly after the SOF width bytes (channels byte missing):
    // must return None, not read past the array
    assert(HeaderCodec.sniff(full.dropRight(1)).isEmpty)
    // every truncation point must be a clean None (never throws)
    (0 until full.length).foreach(n => HeaderCodec.sniff(full.take(n)))
    // 0xFF fill/padding bytes before a marker are skipped, not misread
    // as a segment whose "length" is the marker byte
    val padded = full.take(2) ++ Array.fill(3)(0xff.toByte) ++ full.drop(2).tail
    assert(HeaderCodec.sniff(padded).contains(MediaMeta("jpeg", 640, 480, 3, 0, 8)))
    // standalone TEM marker (0x01) has no length field
    val withTem = full.take(2) ++ Array(0xff.toByte, 0x01.toByte) ++ full.drop(2)
    assert(HeaderCodec.sniff(withTem).contains(MediaMeta("jpeg", 640, 480, 3, 0, 8)))
  }

  test("decodeBmp: pixel stats match the generating formulas (incl. stride pad, top-down)") {
    // ids chosen to cover all widths 4..8 (pad 0..3 bytes) and a
    // negative-height (id%10==0) top-down file
    Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 20L).foreach { id =>
      val px = HeaderCodec.decodeBmp(MediaSynth.bmp(id)).get
      val w = MediaSynth.bmpWidth(id); val h = MediaSynth.bmpHeight(id)
      val all = for (x <- 0 until w; y <- 0 until h)
        yield (MediaSynth.red(id, x, y), MediaSynth.green(id, x, y), MediaSynth.blue(id, x, y))
      assert(px.width == w && px.height == h)
      assert(px.sumR == all.map(_._1.toLong).sum)
      assert(px.sumG == all.map(_._2.toLong).sum)
      assert(px.sumB == all.map(_._3.toLong).sum)
      val flat = all.flatMap(t => Seq(t._1, t._2, t._3))
      assert(px.minV == flat.min && px.maxV == flat.max)
    }
    // non-24bpp and truncated pixel arrays are rejected, not misread
    assert(HeaderCodec.decodeBmp(bmp(10, 10, 32)).isEmpty)
    assert(HeaderCodec.decodeBmp(MediaSynth.bmp(2L).dropRight(1)).isEmpty)
  }

  test("decodeWav: PCM sample stats match the generating formulas (sign-extended)") {
    Seq(1L, 3L, 5L, 7L, 9L, 31L).foreach { id =>
      val pcm = HeaderCodec.decodeWav(MediaSynth.wav(id)).get
      val n = MediaSynth.wavSamples(id)
      val all = (0 until n).map(MediaSynth.sample(id, _))
      assert(pcm.channels == MediaSynth.wavChannels(id))
      assert(pcm.sampleRate == MediaSynth.wavRate(id))
      assert(pcm.nSamples == n.toLong)
      assert(pcm.sumSamples == all.map(_.toLong).sum)
      assert(pcm.minSample == all.min && pcm.maxSample == all.max)
      assert(all.min < 0, "formula must produce negative samples (sign-extension path)")
    }
    // a fmt-only wav (no data chunk) and a truncated one are rejected
    assert(HeaderCodec.decodeWav(wav(1, 8000, 16)).isEmpty)
    assert(HeaderCodec.decodeWav(MediaSynth.wav(3L).dropRight(1)).isEmpty)
  }

  test("decodePng: every filter type 0-4 reconstructs the generating formulas") {
    // heights 5..9 ⇒ every file exercises all five row filters (y % 5);
    // ids cover each (width, height) residue class
    (0L until 30L).foreach { id =>
      val px = HeaderCodec.decodePng(MediaSynth.png(id)).get
      val w = MediaSynth.pngWidth(id); val h = MediaSynth.pngHeight(id)
      val all = for (x <- 0 until w; y <- 0 until h)
        yield (MediaSynth.red(id, x, y), MediaSynth.green(id, x, y), MediaSynth.blue(id, x, y))
      assert(px.width == w && px.height == h, s"dims for id=$id")
      assert(px.sumR == all.map(_._1.toLong).sum, s"sumR for id=$id")
      assert(px.sumG == all.map(_._2.toLong).sum, s"sumG for id=$id")
      assert(px.sumB == all.map(_._3.toLong).sum, s"sumB for id=$id")
      val flat = all.flatMap(t => Seq(t._1, t._2, t._3))
      assert(px.minV == flat.min && px.maxV == flat.max, s"min/max for id=$id")
    }
  }

  test("decodePng: single-filter files decode for each type 0-4") {
    // a 1-row image gets exactly filter y%5 = 0; to isolate each filter
    // type rewrite the filter bytes of a known raw stream and re-deflate
    val id = 7L
    val w = MediaSynth.pngWidth(id); val h = MediaSynth.pngHeight(id)
    (0 to 4).foreach { ft =>
      // re-encode with every row forced to filter `ft` by round-tripping
      // through the decoder's own unfilter: decode reference pixels, then
      // re-filter uniformly
      val ref = HeaderCodec.decodePng(MediaSynth.png(id)).get
      val stride = w * 3
      val pix = Array.tabulate(h, stride) { (y, i) =>
        val x = i / 3
        i % 3 match {
          case 0 => MediaSynth.red(id, x, y)
          case 1 => MediaSynth.green(id, x, y)
          case 2 => MediaSynth.blue(id, x, y)
        }
      }
      val raw = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h) {
        raw((stride + 1) * y) = ft.toByte
        for (i <- 0 until stride) {
          val v = pix(y)(i)
          val a = if (i >= 3) pix(y)(i - 3) else 0
          val b = if (y > 0) pix(y - 1)(i) else 0
          val c = if (y > 0 && i >= 3) pix(y - 1)(i - 3) else 0
          val enc = ft match {
            case 0 => v
            case 1 => v - a
            case 2 => v - b
            case 3 => v - ((a + b) / 2)
            case 4 => v - HeaderCodec.paeth(a, b, c)
          }
          raw((stride + 1) * y + 1 + i) = (enc & 0xff).toByte
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val zbuf = new Array[Byte](raw.length + 64)
      val zlen = deflater.deflate(zbuf); deflater.end()
      val out = new ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      def chunk(t: String, d: Array[Byte]): Unit = {
        out.write(be32(d.length)); out.write(t.getBytes("US-ASCII")); out.write(d)
        out.write(be32(0)) // decoder does not verify CRCs
      }
      chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
      chunk("IDAT", zbuf.take(zlen))
      chunk("IEND", Array.emptyByteArray)
      val px = HeaderCodec.decodePng(out.toByteArray)
        .getOrElse(fail(s"filter $ft did not decode"))
      assert(px.sumR == ref.sumR && px.sumG == ref.sumG && px.sumB == ref.sumB,
        s"filter $ft reconstruction")
    }
  }

  test("decodePng: IDAT split across chunks decodes; bad inputs reject cleanly") {
    // split the single IDAT of a real file into two chunks
    val whole = MediaSynth.png(3L)
    val ref = HeaderCodec.decodePng(whole).get
    val idatLen = {
      var i = 33; var len = -1
      while (len < 0) {
        val l = ((whole(i) & 0xff) << 24) | ((whole(i + 1) & 0xff) << 16) |
          ((whole(i + 2) & 0xff) << 8) | (whole(i + 3) & 0xff)
        if (new String(whole.slice(i + 4, i + 8), "US-ASCII") == "IDAT") len = l
        else i += 12 + l
      }
      (i, len)
    }
    val (idatOff, len) = idatLen
    val data = whole.slice(idatOff + 8, idatOff + 8 + len)
    val out = new ByteArrayOutputStream()
    out.write(whole, 0, idatOff)
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    Seq(data.take(len / 2), data.drop(len / 2)).foreach { part =>
      out.write(be32(part.length)); out.write("IDAT".getBytes("US-ASCII"))
      out.write(part); out.write(be32(0))
    }
    out.write(be32(0)); out.write("IEND".getBytes("US-ASCII")); out.write(be32(0))
    assert(HeaderCodec.decodePng(out.toByteArray).contains(ref))

    // non-RGB color type (the header-only synthesizer writes type 6), 16-bit
    // depth, truncations anywhere, and corrupt zlib all reject as None
    assert(HeaderCodec.decodePng(png(8, 8, 8)).isEmpty)
    val full = MediaSynth.png(4L)
    (0 until full.length).foreach(n => assert(HeaderCodec.decodePng(full.take(n)).isEmpty))
    val corrupt = full.clone()
    corrupt(45) = (corrupt(45) ^ 0x55).toByte // inside the zlib stream
    assert(HeaderCodec.decodePng(corrupt).isEmpty ||
      HeaderCodec.decodePng(corrupt).get != HeaderCodec.decodePng(full).get)
  }

  test("decodeGif: LZW + palette reconstruct the generating formulas") {
    (0L until 30L).foreach { id =>
      val px = HeaderCodec.decodeGif(MediaSynth.gif(id)).get
      val w = MediaSynth.gifWidth(id); val h = MediaSynth.gifHeight(id)
      val all = for (x <- 0 until w; y <- 0 until h) yield {
        val i = MediaSynth.gifIndex(id, x, y)
        (MediaSynth.palR(id, i), MediaSynth.palG(id, i), MediaSynth.palB(id, i))
      }
      assert(px.width == w && px.height == h, s"dims for id=$id")
      assert(px.sumR == all.map(_._1.toLong).sum, s"sumR for id=$id")
      assert(px.sumG == all.map(_._2.toLong).sum, s"sumG for id=$id")
      assert(px.sumB == all.map(_._3.toLong).sum, s"sumB for id=$id")
      val flat = all.flatMap(t => Seq(t._1, t._2, t._3))
      assert(px.minV == flat.min && px.maxV == flat.max, s"min/max for id=$id")
    }
    // truncation anywhere rejects cleanly (never throws, never misreads);
    // the final byte is the trailer, which the first image doesn't need
    val full = MediaSynth.gif(5L)
    (0 until full.length - 1).foreach(n => assert(HeaderCodec.decodeGif(full.take(n)).isEmpty))
  }

  test("GIF/PNG generators and decoders cross-validate against javax.imageio") {
    // an INDEPENDENT standard decoder agrees with ours on our files...
    Seq(1L, 8L, 17L).foreach { id =>
      val ours = HeaderCodec.decodeGif(MediaSynth.gif(id)).get
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MediaSynth.gif(id)))
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sumR += (rgb >> 16) & 0xff; sumG += (rgb >> 8) & 0xff; sumB += rgb & 0xff
      }
      assert((img.getWidth, img.getHeight) == (ours.width, ours.height))
      assert((sumR, sumG, sumB) == (ours.sumR, ours.sumG, ours.sumB),
        s"imageio decoded different pixels than decodeGif for id=$id")
      val oursPng = HeaderCodec.decodePng(MediaSynth.png(id)).get
      val imgPng = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MediaSynth.png(id)))
      var pr = 0L; var pg = 0L; var pb = 0L
      for (y <- 0 until imgPng.getHeight; x <- 0 until imgPng.getWidth) {
        val rgb = imgPng.getRGB(x, y)
        pr += (rgb >> 16) & 0xff; pg += (rgb >> 8) & 0xff; pb += rgb & 0xff
      }
      assert((pr, pg, pb) == (oursPng.sumR, oursPng.sumG, oursPng.sumB),
        s"imageio decoded different pixels than decodePng for id=$id")
    }
    // ...and our decoder agrees with an independent standard ENCODER:
    // imageio writes a GIF of the formula pixels, decodeGif must match
    val id = 3L
    val w = MediaSynth.gifWidth(id); val h = MediaSynth.gifHeight(id)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) {
      val i = MediaSynth.gifIndex(id, x, y)
      img.setRGB(x, y,
        (MediaSynth.palR(id, i) << 16) | (MediaSynth.palG(id, i) << 8) | MediaSynth.palB(id, i))
    }
    val buf = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", buf)
    val decoded = HeaderCodec.decodeGif(buf.toByteArray)
      .getOrElse(fail("decodeGif rejected an imageio-written GIF"))
    val ours = HeaderCodec.decodeGif(MediaSynth.gif(id)).get
    assert((decoded.sumR, decoded.sumG, decoded.sumB) == (ours.sumR, ours.sumG, ours.sumB),
      "decodeGif read an imageio-encoded stream differently")
  }

  test("decodePng rejects a forged chunk length near 2^31 (Int-overflow guard)") {
    // valid signature + IHDR, then a chunk claiming len=0x7FFFFFEB: with
    // Int math 'i + 12 + len' wraps negative and slips past the bounds
    // check, crashing idat.write instead of returning None
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    out.write(be32(13)); out.write("IHDR".getBytes("US-ASCII"))
    out.write(be32(4)); out.write(be32(4)); out.write(Array[Byte](8, 2, 0, 0, 0))
    out.write(be32(0)) // IHDR crc
    out.write(be32(0x7fffffeb)); out.write("IDAT".getBytes("US-ASCII"))
    out.write(Array.fill(16)(0x41.toByte))
    assert(HeaderCodec.decodePng(out.toByteArray).isEmpty)
    // same forged length on a non-IDAT type must also reject cleanly
    val out2 = new ByteArrayOutputStream()
    out2.write(out.toByteArray.take(33))
    out2.write(be32(0x7fffffeb)); out2.write("tEXt".getBytes("US-ASCII"))
    out2.write(Array.fill(16)(0x41.toByte))
    assert(HeaderCodec.decodePng(out2.toByteArray).isEmpty)
  }

  test("decoders never throw on adversarial bytes (deterministic fuzz)") {
    val rnd = new scala.util.Random(0xC0DEC)
    (1 to 500).foreach { i =>
      val len = rnd.nextInt(4096)
      val junk = new Array[Byte](len)
      rnd.nextBytes(junk)
      // pure junk, junk behind each real magic, and bit-flipped real files:
      // every decoder must return an Option, never throw or loop
      val withMagics = Seq(
        junk,
        "GIF89a".getBytes("US-ASCII") ++ junk,
        Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++ junk,
        "RIFF".getBytes("US-ASCII") ++ junk,
        Array('B'.toByte, 'M'.toByte) ++ junk)
      withMagics.foreach { b =>
        HeaderCodec.sniff(b); HeaderCodec.decodeBmp(b)
        HeaderCodec.decodePng(b); HeaderCodec.decodeGif(b); HeaderCodec.decodeWav(b)
      }
      if (i <= 100) {
        val real = if (i % 2 == 0) MediaSynth.gif(i.toLong) else MediaSynth.png(i.toLong)
        val flipped = real.clone()
        val pos = rnd.nextInt(flipped.length)
        flipped(pos) = (flipped(pos) ^ (1 << rnd.nextInt(8))).toByte
        HeaderCodec.decodePng(flipped); HeaderCodec.decodeGif(flipped)
      }
    }
  }

  test("extractContentStats: real decode for bmp/png/wav, stub confined to the rest") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/bmp", MediaSynth.bmp(4L), 0, 0, 0L),
      Multimodal.MediaRow(2L, "audio/wav", MediaSynth.wav(5L), 0, 0, 0L),
      Multimodal.MediaRow(3L, "image/jpeg", jpeg(64, 48), 0, 0, 0L),
      Multimodal.MediaRow(4L, "image/png", MediaSynth.png(6L), 0, 0, 0L),
      Multimodal.MediaRow(5L, "image/gif", MediaSynth.gif(7L), 0, 0, 0L))
    val out = Multimodal.extractContentStats(rows.toDS())
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).format == "bmp" && out(1L).n_values ==
      3L * MediaSynth.bmpWidth(4L) * MediaSynth.bmpHeight(4L))
    assert(out(1L).sum_r != out(1L).sum_b, "channel sums must distinguish B/R")
    assert(out(2L).format == "wav" && out(2L).n_values == MediaSynth.wavSamples(5L).toLong)
    assert(out(3L).format == "stub" && out(3L).n_values == 0L)
    assert(out(4L).format == "png" && out(4L).n_values ==
      3L * MediaSynth.pngWidth(6L) * MediaSynth.pngHeight(6L))
    assert(out(4L).sum_r != out(4L).sum_b, "png channel sums must distinguish order")
    assert(out(5L).format == "gif" && out(5L).n_values ==
      3L * MediaSynth.gifWidth(7L) * MediaSynth.gifHeight(7L))
  }

  test("forged BMP dimensions are rejected before any allocation") {
    // review-caught pair: height 0x80000000 survives math.abs negative
    // (NegativeArraySizeException), and width 0x10000000 overflows the
    // int stride math so the bounds check passed and ~805MB allocated
    def bmp60(width: Int, height: Int): Array[Byte] = {
      val out = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(60).putInt(0).putInt(54)
      out.putInt(40).putInt(width).putInt(height)
      out.putShort(1.toShort).putShort(24.toShort).putInt(0)
      out.array()
    }
    val t0 = System.nanoTime()
    assert(HeaderCodec.decodeBmpPixels(bmp60(4, 0x80000000)).isEmpty)
    assert(HeaderCodec.decodeBmpPixels(bmp60(0x10000000, 3)).isEmpty)
    assert(HeaderCodec.decodeBmpPixels(bmp60(0x7fffffff, 0x7fffffff)).isEmpty)
    assert((System.nanoTime() - t0) < 1e9, "rejection must not attempt the decode")
  }

  test("LZW end-of-data edge: EOI at pre-bump width, byte-aligned, zero padding") {
    // The decoder widens one code EARLIER than the encoder; an encoder
    // that never inserts after its final data emit writes EOI at the old
    // width. When the stream also ends exactly on a byte boundary there
    // is no zero padding to extend the read — the decoder must accept
    // end-of-data as EOI once every expected pixel is out.
    // Construction (minCode=2, clear=4, EOI=5): 122 literal data codes.
    // The decoder's insert on code 122 drives next to 127 = 2^7-1 (bump
    // to width 8); the encoder stays at width 7 for EOI. Total bits:
    // 3 + 2*3 + 8*4 + 16*5 + 32*6 + 64*7 + 7 = 768 — exactly 96 bytes.
    def widthAt(i: Int): Int =
      if (i <= 2) 3 else if (i <= 10) 4 else if (i <= 26) 5
      else if (i <= 58) 6 else 7
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def emit(code: Int, w: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += w
      while (bitCnt >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    emit(4, 3) // clear
    val pixels = (1 to 122).map(i => (i % 4))
    pixels.zipWithIndex.foreach { case (px, idx) => emit(px, widthAt(idx + 1)) }
    emit(5, 7) // EOI at the encoder's (pre-bump) width 7
    assert(bitCnt == 0, s"construction must land byte-aligned, $bitCnt bits over")
    val data = out.toByteArray
    assert(data.length == 96)
    val decoded = HeaderCodec.lzwDecode(data, 2, 122)
      .getOrElse(fail("boundary-aligned EOI rejected a valid stream"))
    assert(decoded.toSeq == pixels.map(_.toByte))
    // truncation strictness is preserved: one pixel short still fails
    assert(HeaderCodec.lzwDecode(data.dropRight(1), 2, 122).isEmpty)
  }

  test("extractMeta decodes real containers distributed, stubs the rest") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/png", png(12, 34, 8), 0, 0, 33L),
      Multimodal.MediaRow(2L, "audio/wav", wav(1, 16000, 16), 0, 0, 100L),
      Multimodal.MediaRow(3L, "text/fake", "hello".getBytes("UTF-8"), 0, 0, 5L))
    val out = Multimodal.extractMeta(rows.toDS())
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).format == "png" && out(1L).width == 12 && out(1L).height == 34)
    assert(out(2L).format == "wav" && out(2L).channels == 1 &&
      out(2L).sample_rate == 16000 && out(2L).bit_depth == 16)
    assert(out(3L).format == "stub" && out(3L).width > 0)
  }
}
