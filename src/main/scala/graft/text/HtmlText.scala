package graft.text

/** HTML main-content extraction — the boilerplate-removal stage between
  * WARC ingestion and text hygiene in a web-corpus pipeline.
  *
  * The heuristic is the published block-classification family (Arc90
  * readability / jusText / boilerpipe): segment the page into text blocks
  * at block-level tag boundaries, score each block by visible text length
  * and LINK DENSITY (share of characters inside `<a>`), and keep the
  * content-dense blocks. All decisions are integer comparisons
  * (`linkChars * 100 <= maxLinkPct * chars`) — transcendental-free, so
  * results are bit-identical across engines and partitionings.
  *
  * Scale shape: pure per-row string scanning, map-only inside
  * `mapPartitions`/codegen'd UDF — no shuffle, no state; the scanner is
  * single-pass O(bytes) with no backtracking and bounded buffers.
  *
  * Parser remit (documented, like the multimodal codecs): real-world tag
  * soup parses best-effort — attribute values containing `>` end the tag
  * early, unclosed `<a>` runs to the next block boundary. Structural
  * HTML (the synth corpus and most machine-generated pages) extracts
  * exactly.
  */
object HtmlText {

  /** One segmented text block: collapsed visible text + link-char count. */
  final case class Block(text: String, nLinkChars: Int)

  final case class ExtractResult(title: String, n_blocks: Int, n_kept: Int,
                                 main_text: String)

  /** Tags that terminate a text block (display:block elements + title). */
  private val BlockTags: Set[String] = Set(
    "p", "div", "article", "section", "aside", "header", "footer", "nav",
    "main", "ul", "ol", "li", "dl", "dt", "dd", "h1", "h2", "h3", "h4",
    "h5", "h6", "table", "thead", "tbody", "tr", "td", "th", "blockquote",
    "pre", "br", "hr", "title", "head", "body", "html", "figure",
    "figcaption", "form")

  /** Extract main text: segment → score → keep. `minTextLen` and
    * `maxLinkPct` are the two published dials (jusText's length_low and
    * max_link_density). */
  def extract(html: String, minTextLen: Int = 25, maxLinkPct: Int = 30): ExtractResult = {
    val bs = blocks(html)
    val kept = bs.filter(b =>
      b.text.length >= minTextLen && b.nLinkChars * 100 <= maxLinkPct.toLong * b.text.length)
    ExtractResult(title(html), bs.length, kept.length, kept.map(_.text).mkString("\n"))
  }

  /** First `<title>` content (collapsed), or "". */
  def title(html: String): String = {
    val lower = html.toLowerCase
    val i = lower.indexOf("<title")
    if (i < 0) return ""
    val open = html.indexOf('>', i)
    if (open < 0) return ""
    val close = lower.indexOf("</title", open)
    if (close < 0) return ""
    collapse(unescape(html.substring(open + 1, close)))
  }

  /** Segment into non-empty text blocks with link-char counts. One pass:
    * comments and script/style subtrees are skipped whole; block-level
    * tags flush the current buffer; `<a>`…`</a>` spans count their
    * visible chars as link chars. */
  def blocks(html: String): Seq[Block] = {
    val out = Seq.newBuilder[Block]
    val text = new StringBuilder
    val linkText = new StringBuilder
    var inAnchor = false
    var i = 0
    val n = html.length

    def flush(): Unit = {
      val t = collapse(text.toString)
      if (t.nonEmpty) out += Block(t, collapse(linkText.toString).length)
      text.clear(); linkText.clear()
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i)
          if (close < 0) { i = n } // truncated tag: drop the tail
          else {
            val body = html.substring(i + 1, close)
            val isEnd = body.startsWith("/")
            val name = tagName(body)
            i = close + 1
            name match {
              case "script" | "style" if !isEnd =>
                // skip the whole subtree, case-insensitively
                val endTag = s"</$name"
                val lower = html.toLowerCase
                val j = lower.indexOf(endTag, i)
                i = if (j < 0) n else {
                  val gt = html.indexOf('>', j)
                  if (gt < 0) n else gt + 1
                }
              case "a" =>
                inAnchor = !isEnd
              case t if BlockTags.contains(t) =>
                flush(); inAnchor = false
              case _ => () // inline tag: no block boundary
            }
          }
        }
      } else {
        val next = html.indexOf('<', i)
        val end = if (next < 0) n else next
        val run = unescape(html.substring(i, end))
        text.append(run)
        if (inAnchor) linkText.append(run)
        i = end
      }
    }
    flush()
    out.result()
  }

  private def tagName(tagBody: String): String = {
    val s = if (tagBody.startsWith("/")) tagBody.substring(1) else tagBody
    var j = 0
    while (j < s.length && (s.charAt(j).isLetterOrDigit)) j += 1
    s.substring(0, j).toLowerCase
  }

  /** Collapse [ \t\n\r]+ to one space and trim (the cross-engine-safe
    * whitespace class — no \v/\f ambiguity between regex dialects). */
  def collapse(s: String): String = {
    val sb = new StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pendingSpace = sb.nonEmpty
      else { if (pendingSpace) { sb.append(' '); pendingSpace = false }; sb.append(c) }
      i += 1
    }
    sb.toString
  }

  /** Minimal HTML entity decode: the five named entities plus numeric
    * (decimal and hex) references. Unknown entities pass through
    * verbatim. */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.substring(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Escape text for embedding in synth HTML (the inverse of the three
    * structural entities; round-trips byte-exactly with [[unescape]]). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}
