package graft.text

import scala.util.matching.Regex

/** The OMIM title-normalization pipeline, reimplemented as pure Scala
  * functions (ref: omim2obo/parsers/omim_entry_parser.py:163-383).
  *
  * Pure functions first (unit/property-testable with no Spark dependency),
  * registered as UDFs in [[graft.functions.OmimFunctions]].
  *
  * Reference quirks preserved bug-for-bug (SURVEY.md §7.4) and documented
  * where we deliberately diverge:
  *  - `removeIncludedAndFormerlySuffixes`: the reference passes
  *    `re.IGNORECASE` as `re.sub`'s COUNT argument (==2), so matching is
  *    case-SENSITIVE and capped at 2 replacements per suffix — mirrored.
  *  - `detectAbbreviations`: Python `findall` returns group matches for the
  *    dotted-acronym pattern (which has a capture group), i.e. only the
  *    LAST "X." repetition of e.g. "U.S.A." — mirrored.
  *  - `recapitalizeAcronyms`: the reference iterates a Python set
  *    (nondeterministic order) when several abbreviations lower-case to the
  *    same word; we iterate in sorted order for determinism — divergence,
  *    affects only ambiguous-case tie-breaks.
  */
object Titles {

  val conjunctions: Set[String] = Set("and", "but", "yet", "for", "nor", "so")
  val littlePreps: Set[String] =
    Set("at", "by", "in", "of", "on", "to", "up", "as", "it", "or")
  val articles: Set[String] = Set("a", "an", "the")
  private val alwaysLower = conjunctions ++ littlePreps ++ articles

  /** Ref: cleanup_title (omim_entry_parser.py:194-270), default
    * replacement_case_method='lower'. Word-wise: roman→arabic for words
    * 2..n when value 1..99 (suffix preserved), lowercase, then
    * known-capitalization dictionary replacement. */
  def cleanupTitle(title: String, capitalizations: Map[String, String]): String = {
    val words = title.split("\\s+").filter(_.nonEmpty)
    val fixed = words.zipWithIndex.map { case (w0, i) =>
      val w1 = if (i > 0) Roman.arabize(w0) else w0
      val w2 = w1.toLowerCase
      // conjunction/prep/article forced lower except first word — a no-op
      // under the 'lower' method, kept for parity with the reference flow
      val w3 = if (i > 0 && alwaysLower.contains(w2)) w2.toLowerCase else w2
      capitalizations.getOrElse(w3, w3)
    }
    fixed.mkString(" ")
  }

  private val acronymsNoPeriods: Regex = "[A-Z][A-Z0-9]+".r
  private val acronymsWithPeriods: Regex = "[A-Z]\\.(?:[A-Z0-9]\\.)+".r
  private val acronymsWithPeriodsGroup: Regex = "[A-Z]\\.([A-Z0-9]\\.)+".r
  private val titleCasedAbbrev: Regex = "[A-Z][a-zA-Z]+\\.".r

  /** Ref: detect_abbreviations (omim_entry_parser.py:163-190). Order:
    * dotted acronyms (group semantics — last repetition only), then
    * ALL-CAPS runs (suppressed when ≥ threshold of words are fully
    * uppercase), then TitleCase-dot abbreviations. */
  def detectAbbreviations(label: String,
                          capitalizationThreshold: Double = 0.75): Seq[String] = {
    val words = label.split("\\s+").filter(_.nonEmpty)
    val fullyCapitalized = words.count(w => w.toUpperCase == w)
    val isLargelyUppercase =
      words.nonEmpty && fullyCapitalized.toDouble / words.length >= capitalizationThreshold

    val noPeriods =
      if (isLargelyUppercase) Seq.empty
      else acronymsNoPeriods.findAllIn(label).toSeq
    // Python findall with one group returns the group text (the final
    // "X." repetition), not the whole match
    val withPeriods = acronymsWithPeriodsGroup
      .findAllMatchIn(label).map(_.group(1)).toSeq
    val titleCased = titleCasedAbbrev.findAllIn(label).toSeq
    withPeriods ++ noPeriods ++ titleCased
  }

  /** Ref: recapitalize_acronyms_in_title (omim_entry_parser.py:273-304):
    * replace any word equal to an abbreviation's lowercase form with the
    * canonical abbreviation. */
  def recapitalizeAcronyms(title: String, knownAbbrevs: Set[String],
                           capitalizationThreshold: Double = 0.75): String = {
    val abbrevs = knownAbbrevs ++ detectAbbreviations(title, capitalizationThreshold)
    if (abbrevs.isEmpty) return title
    val sortedAbbrevs = abbrevs.toSeq.sorted // deterministic (see scaladoc)
    title.split("\\s+").filter(_.nonEmpty).map { word =>
      sortedAbbrevs.find(_.toLowerCase == word).getOrElse(word)
    }.mkString(" ")
  }

  /** Ref: remove_included_and_formerly_suffixes (omim_entry_parser.py:
    * 316-320) — case-sensitive, ≤2 replacements per suffix (see scaladoc). */
  def removeIncludedAndFormerlySuffixes(title: String): String = {
    var t = title
    Seq("FORMERLY", "INCLUDED").foreach { suffix =>
      val re = (",\\s*" + suffix).r
      var i = 0
      while (i < 2 && re.findFirstIn(t).isDefined) {
        t = re.replaceFirstIn(t, "")
        i += 1
      }
    }
    t
  }

  /** Ref: parse_title_symbol_pairs (omim_entry_parser.py:344-369):
    * ';;'-separated pairs; within a pair the first ';'-element is a title,
    * the rest are symbols; all elements stripped. */
  def parseTitleSymbolPairs(s: String): (Seq[String], Seq[String]) = {
    val titles = Seq.newBuilder[String]
    val symbols = Seq.newBuilder[String]
    s.split(";;", -1).foreach { pairStr =>
      val parts = pairStr.split(";", -1).map(_.trim)
      titles += parts.head
      symbols ++= parts.tail
    }
    (titles.result(), symbols.result())
  }

  /** Ref: separate_former_titles_and_symbols (omim_entry_parser.py:
    * 323-331): partition by case-insensitive ", FORMERLY" marker. */
  def separateFormer(titles: Seq[String], symbols: Seq[String])
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    def isFormer(x: String) = x.toUpperCase.contains(", FORMERLY")
    (titles.filterNot(isFormer), symbols.filterNot(isFormer),
      titles.filter(isFormer), symbols.filter(isFormer))
  }

  /** Ref: clean_alt_and_included_titles (omim_entry_parser.py:334-341). */
  def cleanAltAndIncludedTitles(titles: Seq[String], symbols: Seq[String],
                                caps: Map[String, String]): (Seq[String], Seq[String]) =
    (titles.map(removeIncludedAndFormerlySuffixes).map(cleanupTitle(_, caps)),
      symbols.map(removeIncludedAndFormerlySuffixes))

  /** Ref: get_alt_and_included_titles_and_symbols (omim_entry_parser.py:
    * 372-383): parse → separate former → clean. Returns (titles, symbols,
    * formerTitles, formerSymbols). */
  def altAndIncludedTitlesAndSymbols(s: String, caps: Map[String, String])
      : (Seq[String], Seq[String], Seq[String], Seq[String]) = {
    if (s == null || s.isEmpty) return (Nil, Nil, Nil, Nil)
    val (titles0, symbols0) = parseTitleSymbolPairs(s)
    val (cur_t, cur_s, for_t, for_s) = separateFormer(titles0, symbols0)
    val (t, sy) = cleanAltAndIncludedTitles(cur_t, cur_s, caps)
    val (ft, fs) = cleanAltAndIncludedTitles(for_t, for_s, caps)
    (t, sy, ft, fs)
  }
}
