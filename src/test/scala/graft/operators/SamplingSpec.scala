package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Properties the deterministic sampler must guarantee (reproducible
  * training mixes): determinism, superset-on-ramp-up, seed independence,
  * stratified rate targeting, quota bounds, and mix provenance. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 4000L).map(i =>
    (i, if (i % 3 == 0) "en" else "zh", s"src${i % 4}", i % 977)).toDF(
    "doc_id", "lang", "source", "n_chars").cache()

  test("sample is deterministic and fraction-accurate") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2, "s").cache()
    val b = Sampling.deterministicSample(docs, "doc_id", 0.2, "s")
    assert(a.select("doc_id").as[Long].collect().toSet ==
      b.select("doc_id").as[Long].collect().toSet)
    val n = a.count().toDouble
    assert(math.abs(n / 4000.0 - 0.2) < 0.03, s"rate ${n / 4000.0}")
  }

  test("larger fraction with the same seed is a strict superset (ramp-up)") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1, "s")
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.3, "s")
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big))
    assert(big.size > small.size)
  }

  test("different seeds are (near-)independent") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.5, "seedA")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5, "seedB")
      .select("doc_id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble / 4000.0
    assert(math.abs(overlap - 0.25) < 0.05, s"overlap $overlap") // 0.5*0.5
  }

  test("stratified sampling hits per-stratum rates") {
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.6), defaultFraction = 0.1, seed = "s")
    val byLang = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en").toDouble / totals("en") - 0.6) < 0.05)
    assert(math.abs(byLang("zh").toDouble / totals("zh") - 0.1) < 0.05)
  }

  test("quotaPerGroup caps each group and keeps the top rows") {
    val q = Sampling.quotaPerGroup(docs, "source", 7,
      col("n_chars").desc, col("doc_id").asc)
    val counts = q.groupBy("source").count().as[(String, Long)].collect()
    assert(counts.forall(_._2 == 7))
    // kept rows are the maxima: every kept n_chars >= every dropped one
    val keptMin = q.groupBy("source").agg(min("n_chars").as("m"))
    val joined = docs.join(q.select(col("doc_id").as("kept_id")),
        col("doc_id") === col("kept_id"), "left_anti")
      .groupBy("source").agg(max("n_chars").as("dropped_max"))
      .join(keptMin, "source")
      .filter(col("dropped_max") > col("m"))
    assert(joined.count() == 0)
  }

  test("packSequences: contiguous offsets per shard, correct bin spans") {
    import spark.implicits._
    val in = Seq((1L, 100), (2L, 600), (3L, 0), (4L, 512), (5L, 50))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packSequences(in, col("doc_id"), col("n_tokens"),
        col("doc_id"), budget = 512L, numShards = 1, seed = "t")
      .orderBy("doc_id")
      .select("doc_id", "tok_offset", "first_bin", "last_bin", "n_bins")
      .as[(Long, Long, Long, Long, Long)].collect()
    // single shard → offsets are the running token sum in doc_id order
    assert(out.map(_._2).toSeq == Seq(0L, 100L, 700L, 700L, 1212L))
    // doc 2 (600 tokens at offset 100) spans bins 0..1
    assert(out(1) == ((2L, 100L, 0L, 1L, 2L)))
    // zero-token doc occupies exactly its start bin
    assert(out(2) == ((3L, 700L, 1L, 1L, 1L)))
    // doc 4 (512 at 700) ends at token 1211 → bins 1..2
    assert(out(3) == ((4L, 700L, 1L, 2L, 2L)))
    // offsets restart per shard: with many shards each shard cumsum is
    // independent and every shard's first doc has offset 0
    val sharded = Sampling.packSequences(in, col("doc_id"), col("n_tokens"),
        col("doc_id"), budget = 512L, numShards = 4, seed = "t")
    val firsts = sharded.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")))
      .filter(col("rn") === 1).select("tok_offset").as[Long].collect()
    assert(firsts.forall(_ == 0L))
  }

  test("packManifest: spanning docs appear in every bin they overlap, in order") {
    import spark.implicits._
    val in = Seq((1L, 100), (2L, 600), (3L, 0), (4L, 512), (5L, 50))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.packManifest(
        Sampling.packSequences(in, col("doc_id"), col("n_tokens"),
          col("doc_id"), budget = 512L, numShards = 1, seed = "t"))
      .orderBy("bin")
      .select("bin", "n_docs", "doc_ids")
      .as[(Long, Long, String)].collect()
    // offsets: 1@0, 2@100 (spans 0-1), 3@700, 4@700 (spans 1-2), 5@1212
    assert(out.toSeq == Seq(
      (0L, 2L, "1,2"),
      (1L, 3L, "2,3,4"),
      (2L, 2L, "4,5")))
  }

  test("temperatureMixSqrt flattens: small sources keep a higher rate, thresholds exact") {
    import org.apache.spark.sql.functions.col
    // A: 400 rows, B: 25 rows → w = 20, 5; N = 425, W = 25
    // threshA = ppm·425·20/(400·25) = ppm·0.85, threshB = ppm·425·5/(25·25) = ppm·3.4
    val df = ((0 until 400).map(i => (i.toLong, "A")) ++
      (1000 until 1025).map(i => (i.toLong, "B"))).toDF("id", "source")
    val ppm = 200000L
    val got = Sampling.temperatureMixSqrt(df, "source", "id", ppm, "tm")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (a, b) = (got.count(_._2 == "A"), got.count(_._2 == "B"))
    // exact replay of the integer thresholds through the same bucket hash
    def kept(ids: Seq[Long], thresh: Long) = ids.map(i =>
      spark.range(1).select(Sampling.hashBucket(lit(i), "tm")).head.getLong(0))
      .count(_ < thresh)
    assert(a == kept((0L until 400L).toSeq, 200000L * 425 * 20 / (400 * 25)))
    assert(b == kept((1000L until 1025L).toSeq, 200000L * 425 * 5 / (25 * 25)))
    // the flattening property: B's keep RATE beats A's (3.4/0.85 = 4×)
    assert(b.toDouble / 25 > 2.0 * a.toDouble / 400,
      s"small source not over-sampled: A $a/400, B $b/25")
  }

  test("chunkDocuments: stride windows cover every token, no redundant tail") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (0 until 10).map(i => s"t$i").mkString(" ")), // 10 toks → 3 chunks
      (2L, (0 until 4).map(i => s"u$i").mkString(" ")),  // 4 toks → 1 chunk
      (3L, (0 until 12).map(i => s"v$i").mkString(" ")), // 12 toks → 4 chunks
      (4L, "   ")).toDF("doc_id", "text")                // empty → none
    val got = Sampling.chunkDocuments(docs, col("doc_id"), col("text"),
        maxTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.map(g => (g._1, g._2)).toSeq ==
      Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L),
        (3L, 0L), (3L, 1L), (3L, 2L), (3L, 3L)))
    // doc 1: [0,4) [3,7) [6,10) — full coverage, 1-token overlaps
    assert(got.filter(_._1 == 1L).map(g => (g._3, g._4)).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 4L)))
    assert(got.find(g => g._1 == 1L && g._2 == 2L).get._5 == "t6 t7 t8 t9")
    // doc 3's last chunk is the short tail [9,12) — new tokens only
    assert(got.filter(_._1 == 3L).last._4 == 3L)
  }

  test("weightedMix tags provenance and respects per-source rates") {
    val web = docs.filter(col("source") === "src0")
    val rest = docs.filter(col("source") =!= "src0")
    val mix = Sampling.weightedMix(
      Seq(("web", web, 0.5), ("rest", rest, 1.0)), "doc_id", "s").cache()
    assert(mix.filter(col("mix_source") === "rest").count() == rest.count())
    val webN = mix.filter(col("mix_source") === "web").count().toDouble
    assert(math.abs(webN / web.count() - 0.5) < 0.07)
  }

  test("weightedReservoir matches a driver-side replay of A-Res exactly") {
    val k = 7
    val got = Sampling.weightedReservoir(docs.filter(col("n_chars") > 0),
        "doc_id", "source", col("n_chars"), k, "wr")
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    // independent replay of the same deterministic math on the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(seed: String, key: Long): Long = {
      val hex = md.digest(s"$seed$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val want = docs.filter(col("n_chars") > 0)
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)]
      .collect().toSeq.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.map { case (_, id, w) =>
          val u = (bucket("wr", id) + 1).toDouble / 1000000.0
          (id, math.log(u) / w.toDouble)
        }.sortBy { case (id, key) => (-key, id) }.take(k).map(p => (src, p._1))
      }.toSet
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.size == k))
  }

  test("groupedSplit: every group lands wholly in one split, fractions hold") {
    val df = (1L to 6000L).map(i => (i, s"host${i % 300}"))
      .toDF("doc_id", "host")
    val split = Sampling.groupedSplit(df, "host", "sp",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    // leakage safety: a group is never divided
    val perGroup = split.groupBy("host")
      .agg(countDistinct(col("split")).as("n")).agg(max("n")).as[Long].head()
    assert(perGroup == 1L, "a group straddles a split boundary")
    // fractions are met at the GROUP level (300 groups, ±10 pp)
    val byName = split.select("host", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(byName("train") / 300.0 - 0.8) < 0.1, byName.toString)
    assert(byName.values.sum == 300L)
    // stability under growth: adding rows never reassigns a group
    val grown = Sampling.groupedSplit(
      df.unionByName((6001L to 9000L).map(i => (i, s"host${i % 300}"))
        .toDF("doc_id", "host")),
      "host", "sp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val before = split.select("host", "split").distinct()
      .as[(String, String)].collect().toMap
    val after = grown.select("host", "split").distinct()
      .as[(String, String)].collect().toMap
    assert(before.forall { case (h, sp) => after(h) == sp })
  }

  test("groupedSplit rejects fractions that do not sum to 1") {
    assertThrows[IllegalArgumentException] {
      Sampling.groupedSplit(docs, "source", "sp", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("weightedReservoir prefers heavier rows proportionally, not rank-wise") {
    // two weight classes in one group: heavy (w=1000) vs light (w=10).
    // A-Res: heavy rows should dominate the reservoir but light rows must
    // still appear across seeds (it's a sample, not a top-k).
    val df = (1L to 2000L).map(i =>
      (i, "g", if (i <= 1000) 1000L else 10L)).toDF("doc_id", "source", "w")
    val picks = (1 to 5).flatMap { s =>
      Sampling.weightedReservoir(df, "doc_id", "source", col("w"), 50, s"seed$s")
        .select("doc_id").as[Long].collect()
    }
    val heavy = picks.count(_ <= 1000).toDouble / picks.size
    assert(heavy > 0.85, s"heavy share $heavy")   // w-ratio 100:1 dominates
    assert(picks.exists(_ > 1000), "light rows must still be sampleable")
  }
}
