package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Corpus-level statistical scoring — quality signals that need a global
  * pass over the corpus before the per-doc score (unlike the purely
  * per-row q19 heuristics).
  */
object CorpusStats {

  /** Linear quality-classifier application — the fastText-shaped
    * model-based filter (RefinedWeb/FineWeb-style): a trained linear
    * model reduces, at serving time, to a (term → weight) table and a
    * per-doc weighted token sum (the logit; the sigmoid is monotone, so
    * thresholding the INTEGER logit is thresholding the probability —
    * and keeps the score transcendental-free, the q42/q69 stance).
    *
    * Emits one row per doc WITH TOKENS (a tokenless doc has no logit to
    * serve — left-join scores back and treat null as the OOV baseline,
    * the same convention as [[unigramQuality]]): n_tokens, n_hit
    * (tokens found in the table), and `score` = Σ weight(token) over
    * token INSTANCES (out-of-vocabulary tokens weigh 0, the standard
    * serving convention). Duplicate terms in the weight table are
    * SUMMED before the join (deterministic, and a duplicated row can
    * never fan out the count rows and corrupt n_tokens — review-caught).
    *
    * Scale shape: tokenize + explode into per-doc token counts
    * (map-side partials collapse repeats), then counts⋈weights on the
    * term — the weight table of a real classifier is ~1M terms, a
    * broadcast — and one per-doc agg. Integer weights make the score
    * exact on any engine and partitioning. */
  def linearScore(docs: DataFrame, text: Column, id: Column,
                  weights: DataFrame, termCol: String = "term",
                  weightCol: String = "weight"): DataFrame = {
    val counts = docs
      .select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("__cnt"))
    val uniq = weights
      .groupBy(col(termCol).as("__term"))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
    counts
      .join(broadcast(uniq), col("tok") === col("__term"), "left")
      .groupBy("doc_id")
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum(when(col("__w").isNotNull, col("__cnt")).otherwise(0L)).as("n_hit"),
        sum(col("__cnt") * coalesce(col("__w"), lit(0L))).as("score"))
  }

  /** Unigram-LM document quality: score each doc by how typical its
    * tokens are under the corpus's own unigram distribution — the
    * classic cheap LM-quality gate (boilerplate scores high, gibberish
    * and OCR noise score low) without any external model.
    *
    * Emits per doc: n_tokens, `mean_tok_prob` (mean over token INSTANCES
    * of cnt(token)/N — the rational form of unigram likelihood; the log
    * is monotone in it per token, and transcendentals are deliberately
    * avoided because engines differ in the last ulp — same stance as
    * q42's rational idf), and `rare_ratio` (share of tokens seen ≤
    * `rareMax` times corpus-wide — the OCR/gibberish signal).
    *
    * Scale shape: the corpus tokenizes and explodes ONCE into per-doc
    * token counts (map-side partials collapse repeats); the vocab and
    * its broadcast 1-row total re-aggregate from those counts, and the
    * join runs counts⋈vocab on the token — |distinct (doc, token)|
    * rows, not token instances (re-using the raw exploded frame on both
    * sides would recompute the tokenize/explode per subtree). Per-doc
    * means sum decimal(28,12) addends scaled by the exact integer
    * per-doc count — each addend is an IEEE division of the same exact
    * integers in any engine and decimal arithmetic is order-independent,
    * so scores are bit-identical across partitionings and engines. */
  def unigramQuality(docs: DataFrame, text: Column, id: Column,
                     rareMax: Long = 2): DataFrame = {
    val perDoc = docs
      .select(id.as("doc_id"), explode(tokens(text)).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("k"))
    val vocab = perDoc.groupBy("tok").agg(sum("k").as("cnt"))
    val total = vocab.agg(sum("cnt").as("n_total"))
    perDoc.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("k").as("n_tokens"),
        // multiply in DOUBLE (both factors exact, IEEE-identical in any
        // engine) and THEN cast the addend to decimal: decimal × bigint
        // overflows precision 38 and silently truncates the scale
        round(sum(((col("cnt").cast("double") / col("n_total")) * col("k"))
            .cast("decimal(28,12)")).cast("double") / sum(col("k")), 9)
          .as("mean_tok_prob"),
        round(sum(when(col("cnt") <= rareMax, col("k")).otherwise(0L))
            .cast("double") / sum(col("k")), 9)
          .as("rare_ratio"))
  }

  /** Within-document repetition filters (the Gopher/MassiveText rules —
    * Rae et al. 2021 §A1.1): documents dominated by repeated n-grams are
    * boilerplate/spam and get dropped before training. Per doc, for word
    * `n`-grams:
    *  - `top_ngram_frac`  — instances of the single most frequent n-gram
    *    / all n-gram instances (Gopher cuts at 0.2 for 2-grams);
    *  - `dup_ngram_frac`  — instances beyond each distinct n-gram's first
    *    / all instances (Gopher cuts at ~0.1–0.15 for larger n).
    * Docs with fewer than `n` words have no n-grams and are dropped
    * (nothing to measure — the q19 length floor handles them).
    *
    * Shape: MAP-ONLY — a per-doc statistic needs no shuffle. The codegen
    * kernel ([[graft.expressions.NgramRepExpr]]) builds each doc's gram
    * histogram in one string pass in a per-row hash map; the first cut
    * (explode + (doc, gram) aggregation) shuffled every bigram instance
    * and ran 41 s at sf1 vs ~4 s for this form. */
  def ngramRepetition(docs: DataFrame, text: Column, id: Column,
                      n: Int = 2): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    docs.select(id.as("doc_id"),
        column(graft.expressions.NgramRepExpr(expression(text), n)).as("__s"))
      .filter(size(col("__s")) > 0)
      .select(col("doc_id"),
        col("__s").getItem(0).as("n_grams"),
        round(col("__s").getItem(1).cast("double") / col("__s").getItem(0), 9)
          .as("top_ngram_frac"),
        round((col("__s").getItem(2)).cast("double") / col("__s").getItem(0), 9)
          .as("dup_ngram_frac"))
  }

  /** C4-style cross-corpus boilerplate removal: the document splits into
    * fixed `spanWords`-word spans, spans repeated more than `maxOccur`
    * times ACROSS THE CORPUS (nav bars, cookie banners, license
    * headers) are dropped, and the survivors reassemble in order.
    * (C4 used three-sentence spans; fixed word windows are the
    * tokenizer-free equivalent.)
    *
    * Returns (doc_id, clean_text, n_spans, n_dropped). Shape: ONE
    * aggregation over exploded spans builds the corpus span frequency
    * (map-side partials — boilerplate is by definition heavily
    * repeated, so the exchange compresses), one join back on the span,
    * and a per-doc ordered reassembly via sorted collect_list (grouped
    * by doc — never a global window). */
  def dropRepeatedSpans(docs: DataFrame, text: Column, id: Column,
                        spanWords: Int = 8, maxOccur: Long = 2): DataFrame = {
    require(spanWords > 0, "spanWords must be positive")
    // tokens bound to a column FIRST: the span lambda slices the word
    // array per element, and a nested tokens(text) there re-tokenizes
    // the document once per span (the shingles-scaladoc trap; measured
    // on the LM scorer, SOAK.md round 11). Bound here, each slice is
    // an array read.
    val words = col("__ws")
    val spanArr = when(size(words) > 0, transform(
      sequence(lit(0), ceil(size(words).cast("double") / spanWords).cast("int") - 1),
      i => concat_ws(" ", slice(words, i * spanWords + 1, lit(spanWords)))))
      .otherwise(array().cast("array<string>")) // wordless docs drop (no spans)
    val spans = docs
      .select(id.as("doc_id"), tokens(text).as("__ws"))
      .select(col("doc_id"), posexplode(spanArr).as(Seq("pos", "span")))
    val freq = spans.groupBy("span").agg(count(lit(1)).as("n_occ"))
    spans.join(freq, "span")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("n_occ") <= maxOccur,
            struct(col("pos"), col("span"))))),
          s => s.getField("span"))).as("clean_text"),
        count(lit(1)).as("n_spans"),
        sum(when(col("n_occ") > maxOccur, 1L).otherwise(0L)).as("n_dropped"))
  }
}
