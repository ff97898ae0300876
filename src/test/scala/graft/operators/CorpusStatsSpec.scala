package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("unigramQuality: common-token docs score high, rare-token docs low") {
    // corpus: 'the' appears 6×, each gibberish token once → N = 9
    val docs = Seq(
      (1L, "the the the"),          // all common
      (2L, "zxq wvu qqj"),          // all rare (cnt 1 each)
      (3L, "the the zxq8")          // mixed; note zxq8 ≠ zxq
    ).toDF("doc_id", "text")
    val out = CorpusStats.unigramQuality(docs, $"text", $"doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    val n = 9.0
    val theP = 5.0 / n // 'the' occurs 5× total (3 in doc1, 2 in doc3)
    assert(out(0)._2 == 3L)
    assert(math.abs(out(0)._3 - theP) < 1e-9) // every token is 'the'
    assert(out(0)._4 == 0.0)                  // nothing rare
    assert(math.abs(out(1)._3 - 1.0 / n) < 1e-9) // all singletons
    assert(out(1)._4 == 1.0)
    assert(out(2)._4 > 0.0 && out(2)._4 < 1.0) // one rare of three
    // the ordering a quality gate relies on: common ≫ mixed ≫ gibberish
    assert(out(0)._3 > out(2)._3 && out(2)._3 > out(1)._3)
  }

  test("ngramRepetition: repeated docs flag, varied docs pass, short docs drop") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),   // 7 bigrams, 'buy now' ×4, 'now buy' ×3
      (2L, "one two three four five six seven"), // all bigrams distinct
      (3L, "single")                             // < 2 words → no row
    ).toDF("doc_id", "text")
    val out = CorpusStats.ngramRepetition(docs, $"text", $"doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out(0)._2 == 7L)
    assert(math.abs(out(0)._3 - 4.0 / 7.0) < 1e-9) // top gram 'buy now'
    assert(math.abs(out(0)._4 - 5.0 / 7.0) < 1e-9) // 7 instances - 2 distinct
    assert(out(1)._3 < 0.2 && out(1)._4 == 0.0)    // Gopher keep-regime
  }

  test("linearScore: weighted token sums with OOV-as-zero serving semantics") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "good good bad unk"),
      (2L, "unk unk"),
      (3L, "bad")).toDF("doc_id", "text")
    val weights = Seq(("good", 5L), ("bad", -3L)).toDF("term", "weight")
    val got = CorpusStats.linearScore(docs, col("text"), col("doc_id"), weights)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: 2·good + 1·bad + 1·unk → n=4, hit=3, score=2·5−3=7
    // doc 2: all OOV → score 0; doc 3: one bad → −3
    assert(got.toSeq == Seq((1L, 4L, 3L, 7L), (2L, 2L, 0L, 0L), (3L, 1L, 1L, -3L)),
      s"got ${got.toSeq}")
    // review-caught: a duplicated term row must not fan out the count
    // rows (n_tokens corrupted); duplicates SUM deterministically
    val dup = Seq(("good", 5L), ("good", 5L), ("bad", -3L)).toDF("term", "weight")
    val got2 = CorpusStats.linearScore(docs, col("text"), col("doc_id"), dup)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got2.toSeq == Seq((1L, 4L, 3L, 17L), (2L, 2L, 0L, 0L), (3L, 1L, 1L, -3L)),
      s"got ${got2.toSeq}")
  }

  test("dropRepeatedSpans strips corpus-wide boilerplate, keeps own spans in order") {
    val banner = "one two three four" // 4-word span (spanWords = 4)
    val docs = Seq(
      (1L, s"$banner alpha beta gamma delta"),
      (2L, s"$banner epsilon zeta eta theta"),
      (3L, s"$banner iota kappa lambda mu"),
      (4L, "nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text")
    val out = CorpusStats.dropRepeatedSpans(docs, $"text", $"doc_id",
        spanWords = 4, maxOccur = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // the banner span occurs 3 > 2 times → stripped everywhere
    assert(out(0) == ((1L, "alpha beta gamma delta", 2L, 1L)))
    assert(out(1) == ((2L, "epsilon zeta eta theta", 2L, 1L)))
    assert(out(2) == ((3L, "iota kappa lambda mu", 2L, 1L)))
    // unique doc: both spans survive, original order preserved
    assert(out(3) == ((4L, "nu xi omicron pi rho sigma tau upsilon", 2L, 0L)))
  }
}
