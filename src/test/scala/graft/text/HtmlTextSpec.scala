package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.text.HtmlText._

class HtmlTextSpec extends AnyFunSuite {

  private val page =
    """<html><head><title>My  Page</title><script>var x = "<p>not text</p>";</script>
      |<style>.nav { color: red }</style></head>
      |<body><nav><a href="/">Home</a> <a href="/about">About</a></nav>
      |<article><p>This is the long main content paragraph of the page body.</p>
      |<p>Second real paragraph with plenty of visible characters here.</p></article>
      |<div class="promo"><a href="/buy">Buy now</a> <a href="/o">Offer</a></div>
      |<footer><a href="/tos">Terms</a></footer></body></html>""".stripMargin

  test("extract keeps content blocks, drops nav/promo/footer by link density") {
    val r = extract(page)
    assert(r.title == "My Page")
    assert(r.main_text ==
      "This is the long main content paragraph of the page body.\n" +
        "Second real paragraph with plenty of visible characters here.")
    assert(r.n_kept == 2)
  }

  test("script and style subtrees are skipped whole, including tag-soup inside") {
    val bs = blocks(page)
    assert(!bs.exists(_.text.contains("not text")))
    assert(!bs.exists(_.text.contains("color")))
  }

  test("block count covers every non-empty visible block") {
    val bs = blocks(page)
    // title, nav, two article paragraphs, promo, footer
    assert(bs.length == 6)
  }

  test("link density is counted from anchor spans only") {
    val bs = blocks("""<div><a href="/x">link text</a> and trailing prose</div>""")
    assert(bs.length == 1)
    assert(bs.head.text == "link text and trailing prose")
    assert(bs.head.nLinkChars == "link text".length)
  }

  test("entities round-trip through escape/unescape and decode in text runs") {
    val s = "a < b & c > d \"quoted\" 'x'"
    assert(unescape(escape(s)) == s)
    assert(unescape("&#65;&#x42;&amp;") == "AB&")
    assert(unescape("&unknown; &#zz; & alone") == "&unknown; &#zz; & alone")
  }

  test("whitespace collapses to single spaces, cross-engine-safe class") {
    assert(collapse("  a\t\tb\r\nc  ") == "a b c")
    assert(collapse("\n\n") == "")
  }

  test("inline tags do not split blocks; br does") {
    val bs = blocks("<p>one <b>bold</b> run</p><p>two<br>three</p>")
    assert(bs.map(_.text) == Seq("one bold run", "two", "three"))
  }

  test("comments are skipped; truncated tag drops the tail instead of looping") {
    assert(blocks("<p>keep<!-- <p>gone</p> --> this</p>").map(_.text) == Seq("keep this"))
    assert(blocks("<p>ok</p><div unterminated").map(_.text) == Seq("ok"))
  }

  test("min length and link density dials behave as integer thresholds") {
    // 11 visible chars, 4 link chars → ~36% > 30% default: dropped
    val html = """<p><a href="/">link</a>-and-it</p>"""
    assert(extract(html, minTextLen = 5).n_kept == 0)
    assert(extract(html, minTextLen = 5, maxLinkPct = 40).n_kept == 1)
  }

  test("title absent or malformed yields empty, never throws") {
    assert(title("<html><body><p>x</p></body></html>") == "")
    assert(title("<title>unclosed") == "")
  }
}
