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

  test("extractContentStats: real decode for bmp/wav, stub confined to the rest") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image/bmp", MediaSynth.bmp(4L), 0, 0, 0L),
      Multimodal.MediaRow(2L, "audio/wav", MediaSynth.wav(5L), 0, 0, 0L),
      Multimodal.MediaRow(3L, "image/jpeg", jpeg(64, 48), 0, 0, 0L))
    val out = Multimodal.extractContentStats(rows.toDS())
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).format == "bmp" && out(1L).n_values ==
      3L * MediaSynth.bmpWidth(4L) * MediaSynth.bmpHeight(4L))
    assert(out(1L).sum_r != out(1L).sum_b, "channel sums must distinguish B/R")
    assert(out(2L).format == "wav" && out(2L).n_values == MediaSynth.wavSamples(5L).toLong)
    assert(out(3L).format == "stub" && out(3L).n_values == 0L)
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
