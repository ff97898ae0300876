package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-frame GIF decode (the video container), frame sampling +
  * per-frame dHash, and the frame-keyed near-dup majority vote. */
class VideoSpec extends SparkSpec {
  import spark.implicits._

  private val id = 12L
  private val w = MediaSynth.nearDupWidth(id)
  private val h = MediaSynth.nearDupHeight(id)
  private val nf = MediaSynth.nearDupFrames(id)

  test("decodeGifFrames round-trips the animated writer, frame for frame") {
    val frames = HeaderCodec.decodeGifFrames(MediaSynth.nearDupVideo(id)).get
    assert(frames.size == nf)
    for (f <- 0 until nf; x <- 0 until w; y <- 0 until h) {
      val want = MediaSynth.nearDupVideoGray(id, f, x, y)
      assert(frames(f).r(x, y) == want && frames(f).g(x, y) == want &&
        frames(f).b(x, y) == want,
        s"frame $f pixel ($x,$y): got ${frames(f).r(x, y)}, want $want")
    }
  }

  test("an independent reader (imageio) sees the same frames") {
    val bytes = MediaSynth.nearDupVideo(id)
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    assert(reader.getNumImages(true) == nf, "imageio sees a different frame count")
    for (f <- 0 until nf) {
      val img = reader.read(f)
      for (x <- 0 until w; y <- 0 until h) {
        val want = MediaSynth.nearDupVideoGray(id, f, x, y)
        assert((img.getRGB(x, y) & 0xff) == want,
          s"imageio frame $f pixel ($x,$y) differs")
      }
    }
    reader.dispose()
  }

  test("still-image decode is unchanged: first frame of an animation, whole still") {
    val anim = MediaSynth.nearDupVideo(id)
    val first = HeaderCodec.decodeGifPixels(anim).get
    assert(first.r(3, 2) == MediaSynth.nearDupVideoGray(id, 0, 3, 2))
    // a still written by gifOf (now a 1-frame animation) still decodes
    val still = MediaSynth.gif(7L)
    assert(HeaderCodec.decodeGifPixels(still).isDefined)
    assert(HeaderCodec.decodeGifFrames(still).get.size == 1)
  }

  test("a still whose image sits inside a larger logical screen decodes (single-frame path)") {
    // review-caught: the animation full-frame contract must not reject
    // stills — real crawls carry GIFs whose only image is smaller than
    // the logical screen. Patch the screen dims of a valid still larger.
    val still = MediaSynth.gif(7L)
    val w = MediaSynth.gifWidth(7L); val h = MediaSynth.gifHeight(7L)
    val patched = still.clone()
    patched(6) = ((w + 10) & 0xff).toByte; patched(7) = ((w + 10) >> 8).toByte
    patched(8) = ((h + 6) & 0xff).toByte; patched(9) = ((h + 6) >> 8).toByte
    val px = HeaderCodec.decodeGifPixels(patched)
    assert(px.isDefined && px.get.width == w && px.get.height == h,
      "still decode must use the image's own dimensions")
    // the ANIMATION path does reject it (composition would need state)
    assert(HeaderCodec.decodeGifFrames(patched, maxFrames = 8).isEmpty)
  }

  test("full-frame contract and frame cap are enforced, not crashed") {
    // a partial frame (offset/size mismatch) must fail closed
    val bytes = MediaSynth.nearDupVideo(id)
    // image descriptors start with 0x2c; corrupt the first one's left offset
    val idx = bytes.indexOfSlice(Seq(0x2c.toByte, 0x00.toByte, 0x00.toByte))
    val forged = bytes.clone(); forged(idx + 1) = 1
    assert(HeaderCodec.decodeGifFrames(forged).isEmpty)
    // more frames than maxFrames → reject (fail closed), never allocate all
    assert(HeaderCodec.decodeGifFrames(bytes, maxFrames = 2).isEmpty)
  }

  test("videoFrameHashes samples every k-th frame with n_sampled on each row") {
    val media = spark.range(20).map(i => Multimodal.MediaRow(
      i, "synth", MediaSynth.nearDupVideo(i), 0, 0, 0L))
    val rows = Multimodal.videoFrameHashes(media, frameStride = 2).collect()
    val byId = rows.groupBy(_.media_id)
    assert(byId.keySet == (0L until 20L).toSet)
    byId.foreach { case (i, rs) =>
      val n = MediaSynth.nearDupFrames(i)
      val want = (0 until n by 2).toSeq
      assert(rs.map(_.frame_idx).sorted.toSeq == want, s"clip $i sampled wrong")
      assert(rs.forall(_.n_sampled == want.size))
      assert(rs.forall(_.dhash.matches("[01]{64}")))
    }
  }

  test("videoFrameHashes runs stateless on a stream and matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("vhash_stream_").toString + "/in"
    spark.range(40).map(i => i).write.parquet(dir)
    val streamed = Multimodal.videoFrameHashes(
      spark.readStream.schema("value BIGINT").parquet(dir)
        .as[java.lang.Long].map(i => Multimodal.MediaRow(i, "synth",
          MediaSynth.nearDupVideo(i), 0, 0, 0L)))
    val q = streamed.writeStream.format("memory").queryName("vhash_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("vhash_stream")
        .as[(Long, Int, Int, String)].collect().toSet
      val batch = Multimodal.videoFrameHashes(spark.range(40).map(i =>
          Multimodal.MediaRow(i, "synth", MediaSynth.nearDupVideo(i), 0, 0, 0L)))
        .collect().map(r => (r.media_id, r.frame_idx, r.n_sampled, r.dhash)).toSet
      assert(got == batch, "streaming videoFrameHashes diverged from batch")
    } finally q.stop()
  }

  test("videoNearDup: same-group variants pair by majority vote, cross-group don't") {
    val n = 100
    val media = spark.range(n).map(i => Multimodal.MediaRow(
      i, "synth", MediaSynth.nearDupVideo(i), 0, 0, 0L))
    val fh = Multimodal.videoFrameHashes(media, frameStride = 2)
    val got = Multimodal.videoNearDup(fh)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "corpus must produce near-dup pairs")
    // every reported pair is intra-group (the motion term separates groups)
    got.foreach { case (a, b) =>
      assert(a / 5 == b / 5, s"cross-group pair ($a,$b) survived the majority vote")
    }
    // the exact-identical-base pair (v=0 vs v=1 global offset) is found
    // for most groups: offset +3 only flips comparisons at mod-256 wraps
    val v01 = (0L until n by 5L).count(g0 => got.contains((g0, g0 + 1)))
    assert(v01 >= (n / 5) * 2 / 3, s"only $v01 of ${n / 5} (v0,v1) pairs found")
  }
}
