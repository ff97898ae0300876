package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Ref semantics: omim2obo/parsers/omim_entry_parser.py:163-383. */
class TitlesSpec extends AnyFunSuite {

  private val caps = Map("danlos" -> "Danlos", "marfan" -> "Marfan")

  test("cleanupTitle lowercases and converts roman numerals with suffix") {
    assert(Titles.cleanupTitle("MARFAN SYNDROME, TYPE III", caps) ==
      "Marfan syndrome, type 3")
    assert(Titles.cleanupTitle("SYNDROME TYPE IIIB", caps) == "syndrome type 3b".replace("3b", "3b"))
  }

  test("cleanupTitle keeps first word un-arabized (X inactivation)") {
    assert(Titles.cleanupTitle("X INACTIVATION", Map.empty) == "x inactivation")
  }

  test("cleanupTitle keeps SYNDROME C (C=100 not <100)") {
    assert(Titles.cleanupTitle("SYNDROME C", Map.empty) == "syndrome c")
  }

  test("cleanupTitle applies known capitalizations after lowering") {
    assert(Titles.cleanupTitle("EHLERS DANLOS", caps) == "ehlers Danlos")
  }

  test("cleanupTitle idempotent on cleaned strings") {
    val once = Titles.cleanupTitle("MARFAN SYNDROME, TYPE II", caps)
    assert(Titles.cleanupTitle(once, caps) == once)
  }

  test("detectAbbreviations finds ALLCAPS runs unless largely uppercase") {
    assert(Titles.detectAbbreviations("Marfan syndrome MFS type").contains("MFS"))
    // >= 75% fully-uppercase words suppresses ALL-CAPS inference
    assert(!Titles.detectAbbreviations("MARFAN SYNDROME MFS TYPE").contains("MFS"))
  }

  test("detectAbbreviations dotted acronyms use Python group semantics") {
    // findall on a grouped pattern returns the group (last 'X.' repetition)
    assert(Titles.detectAbbreviations("The U.S.A. study") == Seq("A."))
  }

  test("detectAbbreviations title-cased-dot") {
    assert(Titles.detectAbbreviations("blah Abc. blah").contains("Abc."))
  }

  test("recapitalizeAcronyms replaces lowercase forms of known abbrevs") {
    assert(Titles.recapitalizeAcronyms("marfan mfs2 syndrome", Set("MFS2")) ==
      "marfan MFS2 syndrome")
    assert(Titles.recapitalizeAcronyms("no match here", Set("XYZ")) == "no match here")
  }

  test("removeIncludedAndFormerlySuffixes is case-sensitive, max 2 (ref quirk)") {
    assert(Titles.removeIncludedAndFormerlySuffixes("NAME, FORMERLY") == "NAME")
    assert(Titles.removeIncludedAndFormerlySuffixes("NAME, INCLUDED") == "NAME")
    // lowercase suffix survives (reference passes IGNORECASE as count)
    assert(Titles.removeIncludedAndFormerlySuffixes("NAME, formerly") == "NAME, formerly")
    // third occurrence survives the 2-replacement cap
    assert(Titles.removeIncludedAndFormerlySuffixes("A, FORMERLY B, FORMERLY C, FORMERLY") ==
      "A B C, FORMERLY")
  }

  test("parseTitleSymbolPairs splits ;; pairs and ; symbols with strip") {
    val (t, s) = Titles.parseTitleSymbolPairs(
      "ACROCEPHALOSYNDACTYLY, TYPE V; ACS5;; ACS V;; NOACK SYNDROME")
    assert(t == Seq("ACROCEPHALOSYNDACTYLY, TYPE V", "ACS V", "NOACK SYNDROME"))
    assert(s == Seq("ACS5"))
  }

  test("separateFormer partitions on case-insensitive ', FORMERLY'") {
    val (ct, cs, ft, fs) = Titles.separateFormer(
      Seq("KEEP", "OLD NAME, formerly"), Seq("SYM", "OSYM, Formerly"))
    assert(ct == Seq("KEEP") && cs == Seq("SYM"))
    assert(ft == Seq("OLD NAME, formerly") && fs == Seq("OSYM, Formerly"))
  }

  test("altAndIncludedTitlesAndSymbols end-to-end") {
    val (t, s, ft, fs) = Titles.altAndIncludedTitlesAndSymbols(
      "MARFAN DISEASE, FORMERLY; MFS2;; MARFANOID HABITUS", Map("marfan" -> "Marfan"))
    assert(t == Seq("marfanoid habitus"))
    assert(s == Seq("MFS2"))
    assert(ft == Seq("Marfan disease"))
    assert(fs.isEmpty)
  }
}
