package graft.multimodal

import graft.SparkSpec
import graft.operators.Dedup

/** Frame-energy audio fingerprinting: sample decode cross-validated
  * against javax.sound (an independent WAV reader), the gain-invariance
  * property that makes the energy-difference hash perceptual, and total
  * banded-join recall up to the pigeonhole radius on the q79 near-dup
  * corpus. */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def samplesOf(bytes: Array[Byte]): Array[Int] =
    HeaderCodec.decodeWavSamples(bytes).get.samples

  test("decodeWavSamples round-trips the generator and matches javax.sound") {
    val id = 11L
    val bytes = MediaSynth.nearDupWav(id)
    val got = samplesOf(bytes)
    val want = (0 until MediaSynth.nearDupWavN(id))
      .map(j => MediaSynth.nearDupSample(id, j)).toArray
    assert(got.sameElements(want), "decoded samples differ from the formula")
    // an INDEPENDENT reader: javax.sound parses the same bytes
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
    val raw = ais.readAllBytes()
    val viaSound = Array.tabulate(raw.length / 2) { j =>
      val lo = raw(2 * j) & 0xff
      val hi = raw(2 * j + 1).toInt
      (hi << 8) | lo
    }
    assert(viaSound.sameElements(want), "javax.sound disagrees with the generator")
    // and the negative/sign-extension path, via the q58 wav corpus
    val id58 = 9L
    val got58 = samplesOf(MediaSynth.wav(id58))
    val want58 = (0 until MediaSynth.wavSamples(id58))
      .map(j => MediaSynth.sample(id58, j)).toArray
    assert(got58.sameElements(want58), "sign-extension of negative samples broken")
  }

  test("energy hash is invariant to amplitude scaling and uniform-frame offset") {
    val base = Array.tabulate(260)(j => MediaSynth.nearDupSample(15L, j))
    val fp = Multimodal.energyHashBits(base)
    assert(fp.length == 64 && fp.matches("[01]{64}"))
    // scaling: |c·s| = c·|s| preserves every strict inequality AND tie
    assert(Multimodal.energyHashBits(base.map(_ * 3)) == fp,
      "energy-difference hash must depend on the envelope shape, not gain")
    // uniform offset on a 260-sample signal: 65 frames × exactly 4
    // samples, so +k shifts every frame energy by 4k — comparisons hold
    assert(Multimodal.energyHashBits(base.map(_ + 100)) == fp,
      "uniform offset on uniform frames must not change the hash")
  }

  test("frame assignment is floor(65j/n) — a boundary shift changes bits") {
    // a constant signal over UNIFORM frames (260 = 65×4) ties every
    // comparison → all zeros; over NON-uniform frames (n=300: frame
    // sizes alternate 4 and 5) the same constant exposes the size
    // pattern — pinning that frame membership really is floor(65j/n)
    assert(Multimodal.energyHashBits(Array.fill(260)(7)) == "0" * 64,
      "equal adjacent energies must compare as 0 (strict <)")
    val n = 300
    val expected = (0 until 64).map { f =>
      def sz(k: Int) = (0 until n).count(j => j.toLong * 65 / n == k)
      if (sz(f) < sz(f + 1)) '1' else '0'
    }.mkString
    assert(Multimodal.energyHashBits(Array.fill(n)(7)) == expected,
      "frame sizes must follow the floor(65j/n) assignment")
    assert(Multimodal.energyHashBits(Array.emptyIntArray) == null)
  }

  test("banded join recall is total up to hamming <= bands-1 on the q79 corpus") {
    val n = 300
    val media = spark.range(n).map(i => Multimodal.MediaRow(
      i, "synth", MediaSynth.nearDupWav(i), 0, 0, 0L))
    val fps = Multimodal.audioHash(media).collect()
      .map(r => r.media_id -> r.ahash).toMap
    assert(fps.size == n && fps.values.forall(_ != null), "every wav must decode")
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
    banded.foreach { case (a, b, hd) =>
      assert(hd == hamming(fps(a), fps(b)), s"wrong hamming for ($a,$b)")
    }
    // the corpus separates: same-group variants sit close, cross-group
    // pairs almost never fall inside the near-dup radius
    val sameGroup = exact.filter { case (a, b, _) => a / 5 == b / 5 }
    assert(sameGroup.nonEmpty, "perturbed variants must land near their base")
  }

  test("audioHash runs stateless on a stream and matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("ahash_stream_").toString + "/in"
    spark.range(60).map(i => i).write.parquet(dir)
    val streamed = Multimodal.audioHash(
      spark.readStream.schema("value BIGINT").parquet(dir)
        .as[java.lang.Long].map(i => Multimodal.MediaRow(i, "synth",
          MediaSynth.nearDupWav(i), 0, 0, 0L)))
    val q = streamed.writeStream.format("memory").queryName("ahash_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ahash_stream")
        .select("media_id", "ahash").as[(Long, String)].collect().toMap
      val batch = Multimodal.audioHash(spark.range(60).map(i =>
          Multimodal.MediaRow(i, "synth", MediaSynth.nearDupWav(i), 0, 0, 0L)))
        .collect().map(r => r.media_id -> r.ahash).toMap
      assert(got == batch, "streaming audioHash diverged from batch")
    } finally q.stop()
  }
}
