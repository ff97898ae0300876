package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hot-bucket hardening of the banded hamming family
  * ([[Dedup.bandedHammingPairsGuarded]] / [[Dedup.nearDupClusters]]):
  * the adversarial shape is a real web corpus's boilerplate — thousands
  * of byte-identical fingerprints (identical thumbnails) and thousands
  * of DISTINCT fingerprints sharing one boilerplate band (shared site
  * chrome dominating one band's bits). The plain banded self-join pays
  * members² × bands candidate rows on the first and Σ bucket² on the
  * second; the guarded form pays groups² and a capped bucket join, and
  * reports what a cap dropped instead of silently losing recall. */
class BandedGuardSpec extends SparkSpec {
  import spark.implicits._

  private def bitString(v: Long, bits: Int): String = {
    val s = v.toBinaryString
    "0" * (bits - s.length) + s
  }

  /** Brute-force reference semantics of the UNGUARDED banded join:
    * candidate pairs sharing ≥1 band chunk, exact hamming. */
  private def brutePairs(fps: Seq[(Long, String)], bits: Int,
                         bands: Int): Set[(Long, Long, Long)] = {
    val w = bits / bands
    (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b
      chunksA = (0 until bands).map(i => fa.substring(i * w, (i + 1) * w))
      chunksB = (0 until bands).map(i => fb.substring(i * w, (i + 1) * w))
      if chunksA.zip(chunksB).exists { case (x, y) => x == y }
    } yield (a, b, fa.zip(fb).count { case (x, y) => x != y }.toLong)).toSet
  }

  // 16 distinct base fingerprints, far apart (random-ish high bits per
  // band), each replicated 625 times → 10,000 byte-identical members per
  // the adversarial brief; plus 3 planted near-dups of base group 0.
  private val bits = 64
  private val rnd = new scala.util.Random(7)
  private val bases: IndexedSeq[Long] =
    IndexedSeq.fill(16)(rnd.nextLong())
  private lazy val identicalCorpus: DataFrame = {
    val members = for {
      g <- 0 until 16; j <- 0 until 625
    } yield (g * 1000L + j, bitString(bases(g), bits))
    val planted = Seq(
      (900001L, bitString(bases(0) ^ 1L, bits)),          // hamming 1 vs g0
      (900002L, bitString(bases(0) ^ (1L << 40), bits)),  // hamming 1 vs g0
      (900003L, bitString(bases(1) ^ 3L, bits)))          // hamming 2 vs g1
    (members ++ planted).toDF("sid", "fp")
  }

  test("guarded pairs stay at the representative level: O(groups²), not members²") {
    val g = Dedup.bandedHammingPairsGuarded(identicalCorpus, Nil, bits, 4)
    val reps = g.pairs.collect()
    // 19 distinct fingerprints → at most 19*18/2 = 171 candidate rows;
    // the unguarded form would hold 16 buckets of 626 members in EVERY
    // band (Σ bucket² ≈ 6.3M candidates before distinct)
    assert(reps.length <= 171, s"rep-level pair list blew up: ${reps.length}")
    // recall on the planted near-dups is intact at the rep level
    val repPairs = reps.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("hamming"))).toSet
    assert(repPairs.exists(p => p._2 == 900001L && p._3 == 1L))
    assert(repPairs.exists(p => p._2 == 900002L && p._3 == 1L))
    assert(repPairs.exists(p => p._2 == 900003L && p._3 == 2L))
    // membership covers every input row exactly once
    assert(g.membership.count() == identicalCorpus.count())
    assert(g.membership.select("sid").distinct().count() == identicalCorpus.count())
    // multiMembers holds exactly the 16×625 identical members — the 3
    // planted singletons stay out of the re-expansion side
    assert(g.multiMembers.count() == 10000L)
    assert(g.droppedBuckets.count() == 0L) // uncapped → nothing dropped
  }

  test("nearDupClusters re-expands linearly: one cluster row per member") {
    val clusters = Dedup.nearDupClusters(identicalCorpus, bits, 4, maxHamming = 3)
    assert(clusters.count() == identicalCorpus.count())
    val byCluster = clusters.groupBy("cluster").count()
      .as[(Long, Long)].collect().toMap
    // group 0 (625 members + 2 planted near-dups) and group 1 (625 + 1)
    // each collapse to one cluster labeled by the smallest sid
    assert(byCluster(0L) == 627L)
    assert(byCluster(1000L) == 626L)
    // remaining 14 groups: 625 identical members each
    assert(byCluster.values.count(_ == 625L) == 14)
  }

  test("bucket cap drops the boilerplate band but other-band recall survives") {
    // 1,000 DISTINCT fingerprints all sharing band 0 (boilerplate chrome),
    // random bands 1-3 — the Σ bucket² blowup lives in (band 0, value 0).
    // One planted near-dup pair (ids 2000/2001) also matches in band 2.
    val r2 = new scala.util.Random(11)
    val boiler = (0 until 1000).map { i =>
      (i.toLong, bitString(r2.nextLong() & 0x0000ffffffffffffL, bits))
    }
    val base = r2.nextLong() & 0x0000ffffffffffffL
    val planted = Seq(
      (2000L, bitString(base, bits)),
      (2001L, bitString(base ^ (1L << 46), bits))) // differs only in band 1
    val fps = (boiler ++ planted).toDF("sid", "fp")
    val g = Dedup.bandedHammingPairsGuarded(fps, Nil, bits, 4, maxBucket = 50)
    val dropped = g.droppedBuckets.collect()
    assert(dropped.length == 1, s"expected exactly the boilerplate bucket: ${dropped.toSeq}")
    assert(dropped.head.getAs[Int]("band") == 0)
    assert(dropped.head.getAs[Long]("n_reps") == 1002L)
    // the planted pair is still found through its band-2 collision
    val pairs = g.pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2000L, 2001L)))
    // and pair volume is the capped buckets' residue, not 1002²/2
    assert(g.pairs.count() < 5000)
  }

  test("bandedHammingPairsBy matches brute-force reference semantics") {
    // random small corpus with engineered collisions: members drawn from
    // 8 byte-identical groups plus noise sharing low-entropy band chunks
    val r3 = new scala.util.Random(23)
    val groups = IndexedSeq.fill(8)(r3.nextLong())
    val fps = (0 until 60).map { i =>
      val v = if (i < 24) groups(i % 8)                   // identical groups
      else if (i < 40) groups(i % 8) ^ (1L << (i % 60))   // near-dups
      else r3.nextLong() & 0xffffL                        // shared high bands (zeros)
      (i.toLong, bitString(v, bits))
    }
    val got = Dedup.bandedHammingPairs(fps.toDF("sid", "fp"), bits, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brutePairs(fps, bits, 4))
  }

  test("bandedHammingPairsBy keyed: parity within key groups, no cross-key pairs") {
    val r4 = new scala.util.Random(31)
    val perKey = (0 until 3).map { k =>
      val base = r4.nextLong()
      (0 until 12).map(i => (k * 100L + i,
        bitString(if (i < 6) base else base ^ (1L << i), bits), k))
    }
    val fps = perKey.flatten.toDF("sid", "fp", "grp")
    val got = Dedup.bandedHammingPairsBy(fps, Seq("grp"), bits, 4)
      .as[(Int, Long, Long, Long)].collect().toSet
    val want = perKey.zipWithIndex.flatMap { case (rows, k) =>
      brutePairs(rows.map(r => (r._1, r._2)), bits, 4)
        .map(p => (k, p._1, p._2, p._3))
    }.toSet
    assert(got == want)
    assert(got.forall { case (k, a, b, _) => a / 100 == k && b / 100 == k })
  }

  test("reserved key names are rejected loudly; benign names pass") {
    val fps = Seq((1L, bitString(5L, 64), 0)).toDF("sid", "fp", "Band")
    val e = intercept[IllegalArgumentException] {
      Dedup.bandedHammingPairsBy(fps, Seq("Band"), 64, 4)
    }
    assert(e.getMessage.contains("reserved"))
    // a previously-colliding-with-internals name now just works
    val ok = Seq((1L, bitString(5L, 64), 7), (2L, bitString(5L, 64), 7))
      .toDF("sid", "fp", "bv2")
    // "bv" itself is reserved (output of droppedBuckets); "bv2" is not
    assert(Dedup.bandedHammingPairsBy(ok, Seq("bv2"), 64, 4).count() == 1L)
  }
}
