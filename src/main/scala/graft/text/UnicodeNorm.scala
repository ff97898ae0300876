package graft.text

import java.text.Normalizer

/** Unicode text normalization kernels for the corpus-hygiene family.
  *
  * Real-web corpora arrive in mixed normalization forms (decomposed macOS
  * filenames, NFKC-folded ligatures/width variants, stray zero-width and
  * control characters). A training-data pipeline canonicalizes before
  * hashing/dedup — otherwise byte-distinct-but-canonically-equal documents
  * defeat exact dedup and fingerprinting.
  *
  * NFC/NFKC delegate to the JDK's `java.text.Normalizer` (UAX #15).
  * NFC output is pinned cross-engine by the q95 DuckDB oracle
  * (`nfc_normalize`, utf8proc); NFKC (which DuckDB lacks) is pinned by
  * UnicodeNormSpec against published UAX #15 examples.
  *
  * Everything is a pure per-row string kernel — map-only at any scale.
  */
object UnicodeNorm {

  /** Canonical composition (NFC): combining sequences → precomposed. */
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** Compatibility composition (NFKC): also folds ligatures (ﬁ→fi),
    * width variants (ｆ→f), super/subscripts (²→2), then composes. */
  def nfkc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFKC)

  /** Characters a hygiene pass removes outright: C0/C1 controls except
    * `\t\n\r`, zero-widths (ZWSP/ZWNJ/ZWJ/WORD JOINER), BOM. The `\x{...}`
    * escape form is the one char-class syntax BOTH java.util.regex (Spark)
    * and RE2 (DuckDB) accept, so the exact same pattern string runs in the
    * engine and the oracle. */
  val StripPattern: String =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F\\x{200B}-\\x{200D}\\x{2060}\\x{FEFF}]"
}
