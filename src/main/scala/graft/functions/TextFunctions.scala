package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, fingerprinting, quality scoring, language id).
  *
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * no UDFs — so the whole pipeline stays inside whole-stage codegen and is
  * expressible 1:1 in ANSI SQL for the DuckDB oracle. Where a faster
  * engine-specific variant exists (xxhash64 vs md5-hex minhash) it lives in
  * [[graft.operators.Dedup]] with these as the portable reference.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped (ref analog: comment/blank-row
    * filters, omim_txt_parser.py:331-336). */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Word n-grams ("shingles") as space-joined strings; empty array when the
    * document has fewer than `n` words. Pure per-row array ops: no shuffle.
    *
    * CALL CONTRACT: pass a BOUND array column (project `tokens(...)` to a
    * named column first, as q129 does) — the Column DSL substitutes the
    * `words` argument TEXTUALLY everywhere it appears, including inside
    * the per-element `element_at` lambda, so a nested expression like
    * `shingles(tokens(text), 2)` re-runs the whole tokenizer ~2× PER
    * SHINGLE (the CollapseProject-class trap PlanSpec pins for
    * NormalizeVector; measured 4.5× on the LM scorer at sf0.1 —
    * SOAK.md round 11). A bound attribute costs one array read. */
  def shingles(words: Column, n: Int): Column = {
    require(n >= 1)
    val out = transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + lit(k))): _*))
    when(size(words) >= n, out).otherwise(array().cast("array<string>"))
  }

  /** One MinHash row: the minimum md5 over seed-salted shingles. Hex-string
    * min is a valid uniform-hash min and is portable to any SQL engine.
    * Costs one md5 per (shingle × seed) — [[shingleHash]]+[[minhashInt]] is
    * the production path (one md5 per shingle total). */
  def minhashHex(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, x => md5(concat(x, lit("#" + seed)))))

  /** LSH band key over the hex minhash family (portable slow path). */
  def bandHash(shingleCol: Column, band: Int, rowsPerBand: Int): Column =
    md5(concat(
      (band * rowsPerBand until (band + 1) * rowsPerBand)
        .map(s => minhashHex(shingleCol, s)): _*))

  /** Prime modulus for the affine minhash permutation family (2^31 - 1).
    * (h % P) ≤ 2^31, times a small multiplier, stays well inside int64. */
  val MinhashP = 2147483647L

  /** 60-bit integer hash per shingle: first 15 md5 hex chars as a base-16
    * long. ONE md5 per shingle — every seed's permutation then reuses these
    * via cheap affine arithmetic, which is what makes 8-permutation minhash
    * affordable at corpus scale. Portable: `('0x' || substr(md5(x),1,15))
    * ::BIGINT` in DuckDB. */
  def shingleHash(shingleCol: Column): Column =
    transform(shingleCol, x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))

  /** MinHash under the seed-th affine permutation of the shingle hashes:
    * min over h of ((h mod P)·(37+61·seed) + (101+31·seed)) mod P. */
  def minhashInt(hashCol: Column, seed: Int): Column =
    array_min(transform(hashCol, h =>
      ((h % MinhashP) * lit(37L + 61L * seed) + lit(101L + 31L * seed)) % MinhashP))

  /** LSH band key: the band's `rowsPerBand` integer minhashes packed
    * positionally base-P (exact for rowsPerBand ≤ 2; wider bands fall back
    * to an md5 of the joined values). Collision iff all band rows agree. */
  def bandHashInt(hashCol: Column, band: Int, rowsPerBand: Int): Column = {
    val mhs = (band * rowsPerBand until (band + 1) * rowsPerBand)
      .map(s => minhashInt(hashCol, s))
    if (rowsPerBand == 1) mhs.head
    else if (rowsPerBand == 2) mhs.head * MinhashP + mhs(1)
    else conv(substring(md5(concat_ws("|", mhs: _*)), 1, 15), 16, 10).cast("long")
  }

  /** BPE-ish regex tokenizer: letter runs, digit runs, single other symbols.
    * Count only — the id assignment of a real BPE is out of scope. */
  val bpeTokenPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  /** GPT-2's actual pre-tokenizer pattern, RE2-safe: the original's
    * contraction/letter-run/digit-run/punct-run alternation WITHOUT the
    * lookahead branch (RE2 — DuckDB's engine — has no lookahead) and
    * with ASCII classes instead of \p{L}/\p{N} (Unicode tables differ
    * between regex engines across versions; ASCII is version-stable, so
    * both engines tokenize identically). Leftmost-first alternation is
    * shared by Java regex and RE2. */
  val Gpt2PrePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9]+| +"

  /** GPT-2-family pre-tokenization — the faithful upgrade of the simple
    * [[bpeTokenCount]] counter above: emits the actual token STRINGS a
    * BPE tokenizer would subword-merge, with leading spaces attached to
    * the following run (GPT-2 semantics), contractions split, and digit
    * runs separated from letter runs ("42nd" → 2, "test-case" → 3).
    * Whitespace-only matches drop. The honest pre-merge token budget
    * when the real BPE vocab isn't in the pipeline. */
  def gpt2PreTokens(text: Column): Column =
    filter(regexp_extract_all(text, lit(Gpt2PrePattern), lit(0)),
      t => length(trim(t)) > 0)

  /** Document fingerprint: md5 of whitespace-normalized lowercased text.
    * Deterministic across engines; the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Per-document simhash as a `bits`-length '0'/'1' string, computed with
    * portable arithmetic (hex-nibble bit extraction from md5). For each bit
    * b: sum over tokens of ±1 by the token-hash's bit b; sign → bit.
    * O(bits × tokens) per row but fully codegen'd and shuffle-free; the
    * 8× faster long-based variant is [[graft.operators.Dedup.simhash64]]. */
  def simhashBits(toks: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 128)
    val bitCols = transform(sequence(lit(0), lit(bits - 1)), b => {
      val hexPos = (b / 4).cast("int") + 1        // which hex char of md5
      val within = pmod(b, lit(4))                // which bit of that nibble
      val pw = element_at(array(lit(8), lit(4), lit(2), lit(1)), within + 1)
      val total = aggregate(toks, lit(0), (acc, t) => {
        val nib = conv(md5(t).substr(hexPos, lit(1)), 16, 10).cast("int")
        val bit = floor(nib / pw).cast("int") % 2
        acc + (bit * 2 - 1)
      })
      when(total >= 0, lit("1")).otherwise(lit("0"))
    })
    array_join(bitCols, "")
  }

  /** Tiny per-language marker lists for the n-gram/stopword language-id
    * heuristic. Deliberately small: the operator shape (score-and-argmax
    * over marker hits) is what scales, not the lexicon. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "ist", "mit", "das"),
    "fr" -> Seq("le", "et", "est", "avec", "les"),
    "es" -> Seq("el", "y", "es", "con", "los"))

  /** Count of tokens that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  // ---- Unicode hygiene (UAX #15 normalization + invisible-char strip) ----

  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Unicode NFC normalization (codegen; [[graft.text.UnicodeNorm.nfc]]).
    * Cross-engine parity with DuckDB's `nfc_normalize` pinned by q95. */
  def nfcNormalize(c: Column): Column =
    column(graft.expressions.NfcNormalizeExpr(expression(c)))

  /** Unicode NFKC normalization (codegen). DuckDB has no NFKC, so this is
    * pinned by UnicodeNormSpec against published UAX #15 foldings. */
  def nfkcNormalize(c: Column): Column =
    column(graft.expressions.NfkcNormalizeExpr(expression(c)))

  /** Drop controls/zero-widths/BOM ([[graft.text.UnicodeNorm.StripPattern]]
    * — same pattern string runs in the DuckDB oracle). */
  def stripInvisibles(c: Column): Column =
    regexp_replace(c, graft.text.UnicodeNorm.StripPattern, "")
}
