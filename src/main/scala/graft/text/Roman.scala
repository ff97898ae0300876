package graft.text

import scala.util.matching.Regex

/** Roman-numeral codec with the reference's "one trailing suffix letter"
  * tolerance (ref: omim2obo/utils/romanplus.py:23-83).
  *
  * Quirks preserved exactly:
  *  - the validation pattern REQUIRES one final `[A-Z]` which may be the
  *    numeral's own last letter ("III" validates as "II"+suffix "I"), so a
  *    bare numeral like "VI" passes while "V" alone relies on the suffix
  *    position ("V" = empty numeral + suffix V, decoding to 0);
  *  - decoding parses greedily from the start and ignores whatever trails.
  */
object Roman {

  val numeralMap: Seq[(String, Int)] = Seq(
    "M" -> 1000, "CM" -> 900, "D" -> 500, "CD" -> 400, "C" -> 100,
    "XC" -> 90, "L" -> 50, "XL" -> 40, "X" -> 10, "IX" -> 9,
    "V" -> 5, "IV" -> 4, "I" -> 1)

  /** 1..4999 → numeral (ref: romanplus.py toRoman). */
  def toRoman(num: Int): String = {
    require(num > 0 && num < 5000, s"number $num out of range (must be 1..4999)")
    val sb = new StringBuilder
    var n = num
    numeralMap.foreach { case (numeral, value) =>
      while (n >= value) { sb.append(numeral); n -= value }
    }
    sb.toString
  }

  /** Valid numeral + mandatory single suffix letter (ref: romanplus.py
    * romanNumeralPattern — the `[A-Z]` is not optional in the source). */
  val pattern: Regex =
    "^M{0,4}(CM|CD|D?C{0,3})(XC|XL|L?X{0,3})(IX|IV|V?I{0,3})[A-Z]$".r

  def matchesPattern(s: String): Boolean = pattern.findFirstIn(s).isDefined

  /** Greedy front parse; trailing suffix ignored (ref: romanplus.py
    * fromRoman). Caller must have validated with [[matchesPattern]]. */
  def fromRoman(s: String): Int = {
    require(s.nonEmpty, "Input can not be blank")
    var result = 0
    var index = 0
    numeralMap.foreach { case (numeral, value) =>
      while (s.startsWith(numeral, index)) {
        result += value
        index += numeral.length
      }
    }
    result
  }

  /** The cleanup_title word step (ref: omim_entry_parser.py:250-260): words
    * matching the pattern whose value is 1..99 become "<arabic><suffix>"
    * (IIIB→3B, IVA→4A, VI→6); everything else unchanged. ("SYNDROME C"
    * stays because C=100.) */
  def arabize(word: String): String =
    if (!matchesPattern(word)) word
    else {
      val num = fromRoman(word)
      if (num > 0 && num < 100) s"$num${word.replaceFirst(toRoman(num), "")}"
      else word
    }
}
