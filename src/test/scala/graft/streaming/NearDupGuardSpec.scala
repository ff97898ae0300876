package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** Streaming near-dup eval-set protection ≡ the batch kernel: the
  * stream-static banded join must emit exactly the cross pairs the
  * batch simhash kernel finds between arrivals and the protected set —
  * across micro-batch splits, exactly once per pair even when
  * fingerprints collide on every band, and with NO state store. */
class NearDupGuardSpec extends SparkSpec {
  import spark.implicits._

  // protected "eval" docs plus arrivals: one near-dup (first word
  // dropped), one EXACT dup (collides on all 4 bands — the
  // exactly-once trap), one unrelated
  private val evalDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different content about spark plans and shuffle exchanges"),
    (3L, "a third protected document with enough words to shingle cleanly"))
  private val arrivals = Seq(
    (101L, "quick brown fox jumps over the lazy dog near the river bank"), // near-dup of 1
    (102L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (103L, "an entirely unrelated arrival about io throughput and parquet")) // clean

  private lazy val protectedFps =
    Dedup.simhashFps(evalDocs.toDF("pid", "text"), col("text"), col("pid"))

  private def batchExpected: Set[(Long, Long, Long)] = {
    // independent reference: the batch self-join kernel over the union
    // (arrival ids offset out of the protected id space), restricted to
    // cross pairs
    val union = evalDocs.toDF("doc_id", "text")
      .unionByName(arrivals.toDF("doc_id", "text"))
    Dedup.simhashCandidatePairs(union, col("text"), col("doc_id"))
      .filter(col("hamming") <= 3)
      .filter(col("id_a") <= 3L && col("id_b") >= 101L) // protected × arrival
      .select(col("id_b"), col("id_a"), col("hamming"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("stream guard == batch cross pairs; exactly-once; zero state") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = CorpusStreams.nearDupGuard(
      mem.toDF().toDF("doc_id", "text"), col("text"), protectedFps)
    val query = out.writeStream
      .format("memory").queryName("ndguard").outputMode("append").start()
    try {
      mem.addData(arrivals.take(1): _*)
      query.processAllAvailable()
      mem.addData(arrivals.drop(1): _*)
      query.processAllAvailable()
      val got = spark.table("ndguard")
        .as[(Long, Long, Long)].collect().toSeq
      // exactly once per pair — the exact dup collides on ALL bands and
      // must still emit a single row (the canonical-band filter)
      assert(got.size == got.toSet.size, s"duplicate emissions: $got")
      assert(got.toSet == batchExpected,
        s"stream ${got.toSet} != batch $batchExpected")
      assert(got.exists(r => r._1 == 102L && r._3 == 0L),
        "exact dup must flag at hamming 0")
      assert(!got.exists(_._1 == 103L), "clean arrival must not flag")
      assert(query.lastProgress.stateOperators.isEmpty,
        "near-dup guard must hold no streaming state")
    } finally query.stop()
  }

  test("maxHamming beyond the pigeonhole bound (bands-1) is rejected at build") {
    // 4 bands guarantee recall only up to hamming 3: a pair at hamming
    // 4-5 CAN differ in every band and slip the guard — the silent
    // incomplete-recall mode the operator exists to prevent, so the
    // baked-in cut must refuse instead of under-delivering
    val e = intercept[IllegalArgumentException] {
      CorpusStreams.nearDupGuard(arrivals.toDF("doc_id", "text"),
        col("text"), protectedFps, bits = 128, bands = 4, maxHamming = 5)
    }
    assert(e.getMessage.contains("pigeonhole"), e.getMessage)
    // deriving more bands restores the same request legally
    CorpusStreams.nearDupGuard(arrivals.toDF("doc_id", "text"),
      col("text"), protectedFps, bits = 128, bands = 8, maxHamming = 5)
  }

  test("null-text arrival fails loudly per row instead of bypassing the guard") {
    // a null fingerprint nulls the band chunks and drops out of the
    // (band, bv) equi-join with no signal — the arrival-side twin of the
    // protected-side width require (which is eager; arrivals are
    // unbounded so the check rides the row)
    val withNull = arrivals.toDF("doc_id", "text")
      .unionByName(Seq((999L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val e = intercept[Exception] {
      CorpusStreams.nearDupGuard(withNull, col("text"), protectedFps)
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("nearDupGuard") &&
      m.contains("999")), chain(e).mkString("; "))
  }

  test("raise mode survives column pruning: consumers that never read doc_id still fail") {
    // the regression shape this pins: a raise riding the projected
    // doc_id column dies to Catalyst column pruning when the consumer
    // drops that column (a protected_id-only projection, a bare count),
    // silently emitting the null-keyed row raise mode exists to forbid.
    // Anchored in the emission filter, the raise must fire under BOTH
    // consumers.
    val withNull = arrivals.toDF("doc_id", "text")
      .unionByName(Seq((999L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val guard = CorpusStreams.nearDupGuard(withNull, col("text"), protectedFps)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e1 = intercept[Exception] { guard.select("protected_id").collect() }
    assert(chain(e1).exists(m => m.contains("nearDupGuard") && m.contains("999")),
      s"protected_id-only projection let the invalid arrival through: " +
        chain(e1).mkString("; "))
    val e2 = intercept[Exception] { guard.count() }
    assert(chain(e2).exists(m => m.contains("nearDupGuard") && m.contains("999")),
      s"count() let the invalid arrival through: " + chain(e2).mkString("; "))
    // and clean inputs stay clean under the same pruned consumers
    val cleanGuard = CorpusStreams.nearDupGuard(
      arrivals.toDF("doc_id", "text"), col("text"), protectedFps)
    assert(cleanGuard.count() == batchExpected.size.toLong,
      "pruned-consumer plan changed the flag set on valid arrivals")
  }

  test("dead-letter mode: invalid arrivals emit in-band null rows instead of failing") {
    // raiseOnInvalidArrival = false is the streaming deployment shape:
    // a poisoned document must not fail the micro-batch (checkpoint
    // replay would fail it again forever, taking the guard offline) —
    // it comes back as (doc_id, null, null), which cannot be mistaken
    // for either a pass (clean docs emit NOTHING) or a flag (genuine
    // flags carry a non-null protected_id)
    val withNull = arrivals.toDF("doc_id", "text")
      .unionByName(Seq((999L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val out = CorpusStreams.nearDupGuard(withNull, col("text"), protectedFps,
        raiseOnInvalidArrival = false)
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(out.contains((999L, None, None)), s"dead-letter row missing: $out")
    // the valid arrivals' flags are byte-identical to the default mode
    val expected = batchExpected.map { case (a, p, h) => (a, Some(p), Some(h)) }
    assert(out - ((999L, None, None)) == expected,
      s"flags diverged from the batch kernel: $out vs $expected")
    // and on a genuine STREAM the mode holds append semantics with no state
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val query = CorpusStreams.nearDupGuard(
        mem.toDF().toDF("doc_id", "text"), col("text"), protectedFps,
        raiseOnInvalidArrival = false)
      .writeStream.format("memory").queryName("nddead")
      .outputMode("append").start()
    try {
      mem.addData((999L, null.asInstanceOf[String]), arrivals.head)
      query.processAllAvailable()
      val got = spark.table("nddead")
        .as[(Long, Option[Long], Option[Long])].collect().toSet
      assert(got.contains((999L, None, None)))
      assert(query.lastProgress.stateOperators.isEmpty,
        "dead-letter mode must stay stateless")
    } finally query.stop()
  }

  test("mis-width fp: raises in raise mode, dead-letters in-band in dead-letter mode") {
    // SimhashBitsExpr's contract makes a non-null mis-width fp
    // impossible from the public API, so the defense-in-depth width
    // check is exercised through the private kernel seam with a
    // hand-made 20-char fingerprint. Both modes must handle it per
    // their contract — neither may silently drop it (the pre-r13 form
    // filtered it out in dead-letter mode: flagged nowhere, raised
    // nowhere, dead-lettered nowhere).
    val misWidth = Seq((7L, "01" * 10), // 20 chars ≠ 128
      (8L, "1" * 128)) // a valid-width control that matches nothing
    val fps = misWidth.toDF("doc_id", "fp")
    val e = intercept[Exception] {
      CorpusStreams.nearDupGuardFromFps(fps, protectedFps,
        bits = 128, bands = 4, maxHamming = 3,
        raiseOnInvalidArrival = true).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("nearDupGuard") && m.contains("7")),
      chain(e).mkString("; "))
    val out = CorpusStreams.nearDupGuardFromFps(fps, protectedFps,
        bits = 128, bands = 4, maxHamming = 3,
        raiseOnInvalidArrival = false)
      .as[(Long, Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((7L, None, None)),
      s"mis-width fp must emit exactly one dead-letter row (and the " +
        s"valid non-matching control none): $out")
  }

  test("property: random corpora, random batch splits — stream == batch kernel (3 seeds)") {
    // the encode is deliberately shared (Dedup.bandExplode); what this
    // fuzzes is the JOIN + dedup logic: stream-static canonical-band
    // emission vs the batch self-join + distinct
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    for (seed <- Seq(11, 99, 20260815)) {
      val rnd = new scala.util.Random(seed)
      def doc(): String =
        (0 until (6 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      val prot = (1L to 20L).map(i => (i, doc()))
      // arrivals: mutated protected copies (guaranteed near/exact dups),
      // exact copies, and fresh docs
      val arrivals = rnd.shuffle(
        prot.take(8).map { case (i, t) =>
          (100L + i, t.split(" ").drop(1).mkString(" ")) } ++ // near-dup
        prot.slice(8, 12).map { case (i, t) => (200L + i, t) } ++ // exact
        (301L to 312L).map(i => (i, doc())))
      val protFps = Dedup.simhashFps(prot.toDF("pid", "text"),
        col("text"), col("pid"))
      val expected = {
        val union = prot.toDF("doc_id", "text")
          .unionByName(arrivals.toDF("doc_id", "text"))
        Dedup.simhashCandidatePairs(union, col("text"), col("doc_id"))
          .filter(col("hamming") <= 3)
          .filter(col("id_a") <= 20L && col("id_b") >= 101L)
          .select(col("id_b"), col("id_a"), col("hamming"))
          .as[(Long, Long, Long)].collect().toSet
      }
      implicit val sq = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val out = CorpusStreams.nearDupGuard(
        mem.toDF().toDF("doc_id", "text"), col("text"), protFps)
      val query = out.writeStream
        .format("memory").queryName(s"ndprop$seed").outputMode("append").start()
      try {
        // 1–3 random micro-batch splits
        val cuts = rnd.shuffle(arrivals.indices.toList).take(rnd.nextInt(3))
          .sorted :+ arrivals.size
        var from = 0
        cuts.foreach { to =>
          if (to > from) { mem.addData(arrivals.slice(from, to): _*); from = to }
          query.processAllAvailable()
        }
        val got = spark.table(s"ndprop$seed")
          .as[(Long, Long, Long)].collect().toSeq
        assert(got.size == got.toSet.size, s"seed $seed: duplicate emissions")
        assert(got.toSet == expected,
          s"seed $seed: stream ${got.toSet} != batch $expected")
      } finally query.stop()
    }
  }
}
