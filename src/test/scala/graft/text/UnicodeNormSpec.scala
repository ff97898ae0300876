package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TextFunctions.{nfcNormalize, nfkcNormalize, stripInvisibles}

/** UAX #15 normalization kernels. NFC is additionally pinned cross-engine
  * by the q95 oracle (DuckDB's utf8proc nfc_normalize); NFKC has no DuckDB
  * twin, so the published compatibility foldings are pinned here. All
  * non-ASCII goes through \\u escapes — composed-vs-decomposed source
  * literals are invisible to review. */
class UnicodeNormKernelSpec extends AnyFunSuite {

  test("NFC composes combining sequences (UAX #15 canonical examples)") {
    assert(UnicodeNorm.nfc("e\u0301") == "\u00e9")        // e + acute → é
    assert(UnicodeNorm.nfc("A\u030a") == "\u00c5")        // A + ring → Å
    assert(UnicodeNorm.nfc("c\u0327") == "\u00e7")        // c + cedilla → ç
    // already-composed + non-combinable input is the identity
    assert(UnicodeNorm.nfc("caf\u00e9 fi") == "caf\u00e9 fi")
  }

  test("NFC does NOT fold compatibility characters; NFKC does") {
    assert(UnicodeNorm.nfc("\ufb01") == "\ufb01")         // ﬁ stays under NFC
    assert(UnicodeNorm.nfkc("\ufb01") == "fi")            // ﬁ → fi
    assert(UnicodeNorm.nfkc("\uff46") == "f")             // fullwidth ｆ → f
    assert(UnicodeNorm.nfkc("\u00b2") == "2")             // superscript ² → 2
    assert(UnicodeNorm.nfkc("\u2115") == "N")             // ℕ → N
    assert(UnicodeNorm.nfkc("\u2460") == "1")             // ① → 1
    // NFKC also composes canonically after folding
    assert(UnicodeNorm.nfkc("e\u0301") == "\u00e9")
  }

  test("normalization is idempotent; already-normalized input is no-copy") {
    val ascii = "plain ascii text 123"
    assert(UnicodeNorm.nfc(ascii) eq ascii)
    assert(UnicodeNorm.nfkc(ascii) eq ascii)
    val once = UnicodeNorm.nfc("e\u0301e\u0301")
    assert(UnicodeNorm.nfc(once) == once)
  }

  test("StripPattern removes controls/zero-widths/BOM but keeps \\t\\n\\r") {
    val p = UnicodeNorm.StripPattern
    val dirty = "ab\u009fc\u200bd\u200ce\u200df\u2060g\ufeffh\tz\nw\rv"
    val cleaned = dirty.replaceAll(p, "")
    assert(cleaned == "abcdefgh\tz\nw\rv")
  }
}

/** Column-level wrappers: codegen ≡ interpreted ≡ kernel, and the SQL
  * registration resolves. */
class UnicodeNormColumnSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    "e\u0301clair",            // decomposed accent
    "\ufb01ne print \uff41",   // ligature + fullwidth a
    "ascii only",
    "zero\u200bwidth\ufeff",   // invisibles
    null)

  test("nfcNormalize/nfkcNormalize match the kernel row-for-row (codegen on)") {
    val df = rows.toDF("s")
    val got = df.select(nfcNormalize($"s").as("c"), nfkcNormalize($"s").as("k"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    val want = rows.map(s => (
      Option(s).map(UnicodeNorm.nfc), Option(s).map(UnicodeNorm.nfkc)))
    assert(got.toSeq == want)
  }

  test("codegen and interpreted paths agree") {
    val df = rows.toDF("s")
    val on = df.select(nfcNormalize($"s")).collect().map(_.get(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.select(nfcNormalize($"s")).collect().map(_.get(0)).toSeq
      assert(on == off)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("stripInvisibles + NFC is the q95 hygiene composition") {
    val out = Seq("a\u200bb\u0301\ufeffc").toDF("s")
      .select(nfcNormalize(stripInvisibles($"s"))).as[String].head()
    // ZWSP/BOM strip first, then b+U+0301 (no precomposed form) survives
    assert(out == "ab\u0301c")
  }
}
