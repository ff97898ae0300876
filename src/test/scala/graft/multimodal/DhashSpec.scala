package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** dHash image fingerprinting: container-independence (the same pixels
  * through PNG / GIF / both BMP orientations / an independent imageio
  * encoder hash identically), the gradient-invariance property that makes
  * dHash a perceptual hash, and total banded-join recall up to the
  * pigeonhole radius on the q75 near-dup corpus. */
class DhashSpec extends SparkSpec {
  import spark.implicits._

  private val id = 7L
  private val w = MediaSynth.nearDupWidth(id)
  private val h = MediaSynth.nearDupHeight(id)
  private def gray(x: Int, y: Int): Int = MediaSynth.nearDupGray(id, x, y)

  private def dhashOf(bytes: Array[Byte]): String =
    Multimodal.dhashBits(Multimodal.decodeImagePixels(bytes).get._2)

  test("the same pixels hash identically through every container and orientation") {
    val png = dhashOf(MediaSynth.pngOf(w, h, gray, gray, gray))
    val gif = dhashOf(MediaSynth.gifOf(w, h, gray, i => i, i => i, i => i))
    val bmpTop = dhashOf(MediaSynth.bmpOf(w, h, topDown = true, gray, gray, gray))
    val bmpBottom = dhashOf(MediaSynth.bmpOf(w, h, topDown = false, gray, gray, gray))
    assert(png.length == 64 && png.matches("[01]{64}"))
    assert(gif == png, "GIF decode disagrees with PNG decode")
    assert(bmpTop == png, "top-down BMP decode disagrees")
    assert(bmpBottom == png, "bottom-up BMP rows were not flipped")
    // an INDEPENDENT encoder: imageio writes the same pixels (PNG and GIF
    // — its GIF writer interlaces, exercising the deinterlace path)
    for (fmt <- Seq("png", "gif")) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val v = gray(x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val buf = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      assert(dhashOf(buf.toByteArray) == png,
        s"imageio-encoded $fmt hashed differently (orientation/decode bug)")
    }
  }

  test("orientation matters: a vertically flipped image hashes differently") {
    val flipped = dhashOf(MediaSynth.pngOf(w, h,
      (x, y) => gray(x, h - 1 - y), (x, y) => gray(x, h - 1 - y),
      (x, y) => gray(x, h - 1 - y)))
    assert(flipped != dhashOf(MediaSynth.pngOf(w, h, gray, gray, gray)),
      "dHash failed to notice a vertical flip — row order is being ignored")
  }

  test("dHash is invariant to a global brightness shift (no wrap)") {
    val dim = (x: Int, y: Int) => gray(x, y) % 200
    val brighter = (x: Int, y: Int) => dim(x, y) + 40
    assert(dhashOf(MediaSynth.pngOf(w, h, dim, dim, dim)) ==
      dhashOf(MediaSynth.pngOf(w, h, brighter, brighter, brighter)),
      "difference hash must depend on gradients, not absolute brightness")
  }

  test("banded join recall is total up to hamming <= bands-1 on the q75 corpus") {
    val n = 300
    val media = spark.range(n).map(i => Multimodal.MediaRow(
      i, "synth", MediaSynth.nearDupImage(i), 0, 0, 0L))
    val fps = Multimodal.dhash(media).collect()
      .map(r => r.media_id -> r.dhash).toMap
    assert(fps.size == n && fps.values.forall(_ != null), "every image must decode")
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    val exact = (for {
      a <- 0L until n; b <- (a + 1) until n
      hd = hamming(fps(a), fps(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    assert(exact.nonEmpty, "corpus must contain close pairs for the test to bite")
    val banded = Dedup.bandedHammingPairs(
        media.map(r => (r.media_id, fps(r.media_id))).toDF("sid", "fp"), 64, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt))
    val bandedSet = banded.toSet
    exact.foreach { case p @ (a, b, hd) =>
      assert(bandedSet.contains(p),
        s"pair ($a,$b) at hamming $hd missed — pigeonhole recall broken")
    }
    // and every reported hamming is the true hamming
    banded.foreach { case (a, b, hd) =>
      assert(hd == hamming(fps(a), fps(b)), s"wrong hamming for ($a,$b)")
    }
  }

  test("dhash runs stateless on a stream and matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("dhash_stream_").toString + "/in"
    spark.range(60).map(i => i).write.parquet(dir)
    val streamed = Multimodal.dhash(
      spark.readStream.schema("value BIGINT").parquet(dir)
        .as[java.lang.Long].map(i => Multimodal.MediaRow(i, "synth",
          MediaSynth.nearDupImage(i), 0, 0, 0L)))
    val q = streamed.writeStream.format("memory").queryName("dhash_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dhash_stream")
        .select("media_id", "dhash").as[(Long, String)].collect().toMap
      val batch = Multimodal.dhash(spark.range(60).map(i =>
          Multimodal.MediaRow(i, "synth", MediaSynth.nearDupImage(i), 0, 0, 0L)))
        .collect().map(r => r.media_id -> r.dhash).toMap
      assert(got == batch, "streaming dhash diverged from batch")
    } finally q.stop()
  }
}
