package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The cut half of Lee et al. substring dedup
  * ([[Dedup.cutDuplicateSpans]]): duplicated spans keep their
  * corpus-wide first occurrence, later occurrences are cut with exact
  * ordered reassembly, and re-running the detector on the cut corpus
  * finds nothing. L = 5 keeps fixtures readable; q80b gates the
  * default 13 against the DuckDB oracle. */
class SpanCutSpec extends SparkSpec {
  import spark.implicits._

  private val L = 5
  private val docs = Seq(
    (1L, "a1 a2 a3 a4 a5 a6 a7 S1 S2 S3 S4 S5 S6 b1 b2"), // first occurrence of S
    (2L, "c1 c2 S1 S2 S3 S4 S5 S6 d1 d2 d3"),             // later occurrence → cut
    (3L, "e1 e2 e3 e4 e5 e6 e7 e8"),                       // clean
    (4L, "x1 x2 T1 T2 T3 T4 T5 y1 T1 T2 T3 T4 T5 y2"),    // within-doc repeat
    (5L, "z1 z2 z3 z4 z5 z6"),                             // identical pair: kept
    (6L, "z1 z2 z3 z4 z5 z6")                              // identical pair: erased
  ).toDF("doc_id", "text")

  private lazy val cut = Dedup.cutDuplicateSpans(
    docs, $"text", $"doc_id", spanTokens = L, minOccur = 2)
    .collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("clean_text"), r.getAs[Long]("n_cut_grams"))).toMap

  test("corpus-wide first occurrence survives; later occurrences are cut") {
    assert(cut(1L)._1 == "a1 a2 a3 a4 a5 a6 a7 S1 S2 S3 S4 S5 S6 b1 b2")
    assert(cut(1L)._2 == 0L)
    // doc 2 loses exactly S1..S6 (two overlapping duplicated 5-grams)
    assert(cut(2L) == (("c1 c2 d1 d2 d3", 2L)))
    assert(cut(3L) == (("e1 e2 e3 e4 e5 e6 e7 e8", 0L)))
  }

  test("within-doc repeats keep the first copy") {
    assert(cut(4L) == (("x1 x2 T1 T2 T3 T4 T5 y1 y2", 1L)))
  }

  test("a fully-duplicated document is erased, its first twin kept") {
    assert(cut(5L) == (("z1 z2 z3 z4 z5 z6", 0L)))
    assert(cut(6L) == (("", 2L)))
  }

  test("re-running duplicateSpans on the cut corpus finds nothing") {
    val cutDf = Dedup.cutDuplicateSpans(
      docs, $"text", $"doc_id", spanTokens = L, minOccur = 2)
    assert(Dedup.duplicateSpans(
      cutDf, $"clean_text", $"doc_id", spanTokens = L, minOccur = 2).count() == 0L)
  }

  test("reassembly is whitespace-normalizing even with nothing to cut") {
    val messy = Seq((1L, "  w1   w2  w3 ")).toDF("doc_id", "text")
    val r = Dedup.cutDuplicateSpans(messy, $"text", $"doc_id",
      spanTokens = L, minOccur = 2).collect().head
    assert(r.getAs[String]("clean_text") == "w1 w2 w3")
  }
}
