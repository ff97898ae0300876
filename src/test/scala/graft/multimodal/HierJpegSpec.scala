package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Hierarchical JPEG (T.81 Annex J): the generator's pyramids decode
  * pixel-exactly against an independent replay of the hierarchy math
  * (base → J.1.1.2 expansion → correction), and the fail-closed edges
  * hold. The same pixels are pinned cross-engine by the q58h oracle. */
class HierJpegSpec extends AnyFunSuite {

  /** Independent J.1.1.2 doubling: out(2u)=in(u),
    * out(2u+1)=(in(u)+in(u+1)+1)>>1, edge replicated — horizontal first,
    * then vertical (the decoder, encoder and oracle all pin this order). */
  private def expand(in: Array[Array[Int]]): Array[Array[Int]] = {
    val h = in.length; val w = in(0).length
    val hor = Array.tabulate(h, 2 * w) { (y, x) =>
      if (x % 2 == 0) in(y)(x / 2)
      else (in(y)(x / 2) + in(y)(math.min(x / 2 + 1, w - 1)) + 1) >> 1
    }
    Array.tabulate(2 * h, 2 * w) { (y, x) =>
      if (y % 2 == 0) hor(y / 2)(x)
      else (hor(y / 2)(x) + hor(math.min(y / 2 + 1, h - 1))(x) + 1) >> 1
    }
  }

  private def expectedPixel(id: Long, x: Int, y: Int,
      up: Array[Array[Int]]): Int =
    if (id % 3 == 1) {
      val v = MediaSynth.jpegBlockGray(id, x / 8, y / 8) +
        MediaSynth.hierDelta(id, x / 8, y / 8)
      math.max(0, math.min(255, v))
    } else up(y)(x) + MediaSynth.hierDetail(id, x, y)

  test("pyramids decode pixel-exactly in all three variants") {
    (0L until 30L).foreach { id =>
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      val px = JpegCodec.decodeJpegPixels(MediaSynth.hierJpeg(id))
        .getOrElse(fail(s"decode failed for id=$id"))
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      val up =
        if (id % 3 == 1) null
        else expand(Array.tabulate(h / 2, w / 2)((v, u) =>
          MediaSynth.hierBase(id, u / 8, v / 8)))
      for (y <- 0 until h; x <- 0 until w) {
        val e = expectedPixel(id, x, y, up)
        assert(px.r(x, y) == e && px.g(x, y) == e && px.b(x, y) == e,
          s"pixel ($x,$y) id=$id: got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want $e")
      }
    }
  }

  test("arithmetic pyramids (SOF9/SOF13) decode pixel-exactly in all variants") {
    (0L until 30L).foreach { id =>
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      val px = JpegCodec.decodeJpegPixels(MediaSynth.hierArithJpeg(id))
        .getOrElse(fail(s"arith-hier decode failed for id=$id"))
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      val up =
        if (id % 3 == 2) expand(Array.tabulate(h / 2, w / 2)((v, u) =>
          MediaSynth.hierBase(id, u / 8, v / 8)))
        else null
      for (y <- 0 until h; x <- 0 until w) {
        val e =
          if (id % 3 == 2) up(y)(x) + MediaSynth.hierDelta(id, x / 8, y / 8)
          else math.max(0, math.min(255,
            MediaSynth.jpegBlockGray(id, x / 8, y / 8) +
              MediaSynth.hierDelta(id, x / 8, y / 8)))
        assert(px.r(x, y) == e && px.g(x, y) == e && px.b(x, y) == e,
          s"pixel ($x,$y) id=$id: got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want $e")
      }
    }
    // truncation fails closed, never throws
    val full = MediaSynth.hierArithJpeg(2L) // pyramid variant with EXP
    (1 until full.length by 7).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // must not throw
    }
  }

  test("progressive-arithmetic pyramids (SOF10/SOF14) decode pixel-exactly") {
    (0L until 30L).foreach { id =>
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      val px = JpegCodec.decodeJpegPixels(MediaSynth.hierProgArithJpeg(id))
        .getOrElse(fail(s"prog-hier decode failed for id=$id"))
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      val up =
        if (id % 3 == 2) expand(Array.tabulate(h / 2, w / 2)((v, u) =>
          MediaSynth.hierBase(id, u / 8, v / 8)))
        else null
      for (y <- 0 until h; x <- 0 until w) {
        val e =
          if (id % 3 == 2) up(y)(x) + MediaSynth.hierDelta(id, x / 8, y / 8)
          else math.max(0, math.min(255,
            MediaSynth.jpegBlockGray(id, x / 8, y / 8) +
              MediaSynth.hierDelta(id, x / 8, y / 8)))
        assert(px.r(x, y) == e && px.g(x, y) == e && px.b(x, y) == e,
          s"pixel ($x,$y) id=$id: got (${px.r(x, y)},${px.g(x, y)},${px.b(x, y)}), want $e")
      }
    }
    // the multi-scan frame must NOT reconstruct early: truncating after
    // the first frame's DC scan (an incomplete frame at EOI position)
    // fails closed, and arbitrary truncation never throws
    val full = MediaSynth.hierProgArithJpeg(2L)
    (1 until full.length by 7).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // must not throw
    }
  }

  test("progressive-Huffman pyramids (SOF2/SOF6) decode pixel-exactly") {
    (0L until 30L).foreach { id =>
      val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
      val px = JpegCodec.decodeJpegPixels(MediaSynth.hierProgJpeg(id))
        .getOrElse(fail(s"prog-huff-hier decode failed for id=$id"))
      assert((px.width, px.height) == (w, h), s"dims for id=$id")
      // SOF2/SOF6 carries the same values as the SOF10/SOF14 twin —
      // pixel-identical rasters through a different entropy layer
      val arith = JpegCodec.decodeJpegPixels(MediaSynth.hierProgArithJpeg(id)).get
      assert(java.util.Arrays.equals(px.rgb, arith.rgb),
        s"id=$id: Huffman-progressive raster differs from the arithmetic twin")
    }
    val full = MediaSynth.hierProgJpeg(5L)
    (1 until full.length by 7).foreach { n =>
      JpegCodec.decodeJpegPixels(full.take(n)) // must not throw
    }
  }

  test("bit-flip fuzz over the arithmetic/progressive pyramids never throws") {
    val rnd = new scala.util.Random(97)
    Seq(MediaSynth.hierArithJpeg(4L), MediaSynth.hierProgArithJpeg(4L),
        MediaSynth.hierProgJpeg(4L), MediaSynth.hierProgArithJpeg(2L)).foreach { base =>
      (0 until 250).foreach { _ =>
        val mutated = base.clone()
        val flips = 1 + rnd.nextInt(4)
        (0 until flips).foreach { _ =>
          val p = rnd.nextInt(mutated.length)
          mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
        }
        JpegCodec.decodeJpegPixels(mutated) // Some or None, must not throw
      }
    }
  }

  test("variant 1 actually exercises the [0,255] clamp") {
    val clamped = (0L until 60L).exists { id =>
      id % 3 == 1 && {
        val w = MediaSynth.jpegWidth(id); val h = MediaSynth.jpegHeight(id)
        (0 until h / 8).exists(by => (0 until w / 8).exists { bx =>
          val v = MediaSynth.jpegBlockGray(id, bx, by) +
            MediaSynth.hierDelta(id, bx, by)
          v < 0 || v > 255
        })
      }
    }
    assert(clamped, "no fixture block hits the clamp — weaken nothing silently")
  }

  test("variant 0 corrections include negative samples (signed category path)") {
    assert((0 until 48).exists(x => MediaSynth.hierDetail(0L, x, 0) < 0))
  }

  test("fail-closed edges: truncation, stray EXP, double SOI, bad DHP") {
    val good = MediaSynth.hierJpeg(3L) // variant 0: DHP + EXP + 2 frames
    assert(JpegCodec.decodeJpegPixels(good).isDefined)
    // truncation anywhere in the tail → None, never a partial image
    Seq(good.length - 2, good.length - 10, good.length / 2).foreach { n =>
      assert(JpegCodec.decodeJpegPixels(good.take(n)).isEmpty, s"len=$n")
    }
    // EXP in a non-hierarchical stream is malformed
    val base = MediaSynth.jpeg(0L)
    val exp = Array[Byte](0xff.toByte, 0xdf.toByte, 0, 3, 0x11)
    val spliced = base.take(2) ++ exp ++ base.drop(2)
    assert(JpegCodec.decodeJpegPixels(spliced).isEmpty)
    // DHP claiming absurd dimensions must not allocate
    val forged = good.clone()
    // DHP is the first FFDE in the stream; its height bytes follow len+precision
    val dhpAt = forged.indices.find(i => (forged(i) & 0xff) == 0xff &&
      i + 1 < forged.length && (forged(i + 1) & 0xff) == 0xde).get
    forged(dhpAt + 5) = 0xff.toByte; forged(dhpAt + 6) = 0xff.toByte // height
    forged(dhpAt + 7) = 0xff.toByte; forged(dhpAt + 8) = 0xff.toByte // width
    assert(JpegCodec.decodeJpegPixels(forged).isEmpty)
  }

  test("the old latent bug stays dead: a pyramid never returns its base frame") {
    // variant 0's base layer is half-size; if the dispatch regressed to
    // skipping DHP, decode would return a (w/2, h/2) image
    val id = 6L
    val px = JpegCodec.decodeJpegPixels(MediaSynth.hierJpeg(id)).get
    assert(px.width == MediaSynth.jpegWidth(id) &&
      px.height == MediaSynth.jpegHeight(id))
  }
}
