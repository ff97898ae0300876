package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Streaming perplexity scoring with a pruned bigram LM — the production
  * shape q129b names: train ONCE on a blessed reference corpus, prune to
  * the top-K grams per context, then score the ingest document STREAM
  * forever (the CCNet/FineWeb quality gate at the pipeline mouth).
  *
  * Scale shape: [[trainPruned]] is the q129b batch training half
  * (two partial-aggregated groupBys — the shuffle carries unique grams,
  * not tokens) collected to bounded driver metadata (O(contexts·K)
  * probabilities + O(contexts) counts — the size class a 100 TB scorer
  * broadcasts, which is the entire POINT of pruning). [[scoreStream]] is
  * then completely STATELESS and shuffle-free: the LM ships as BROADCAST
  * variables captured by one per-document scoring UDF (not plan
  * literals — see the method scaladoc for the measured A/B), and the
  * stream needs no state store, no watermark, and no output-mode
  * constraint — any micro-batch split scores identically (LmStreamsSpec
  * pins stream ≡ batch ≡ q129b arithmetic, and pins the zero-Exchange
  * plan).
  *
  * Unseen grams get q129b's two-level backoff exactly: 0.5/(c1+0.5·V)
  * when the context w1 is known, 1/V when it isn't — so the scorer is
  * total over any input vocabulary, which is what lets the stream score
  * documents the reference corpus never saw. */
object LmStreams {

  /** A pruned bigram LM as bounded driver metadata: `probs` keyed by
    * "w1 w2" (top-K per context only), `contexts` = c1 counts for the
    * known-context backoff, `v` = vocabulary size (distinct w2). */
  final case class PrunedLm(probs: Map[String, Double],
                            contexts: Map[String, Long], v: Long)

  /** q129b's training half: Laplace-smoothed bigram probabilities
    * P(w2|w1) = (c12+0.5)/(c1+0.5·V) pruned to the top-`topK` grams per
    * context (by count, ties to the lexicographically smaller w2 — the
    * same deterministic cut as [[graft.operators.Sampling
    * .quotaPerGroup]]), collected to driver metadata. `docs` carries
    * (doc_id, text). */
  def trainPruned(docs: DataFrame, topK: Int): PrunedLm = {
    // ws bound FIRST (q129's shape): shingles() textually duplicates
    // its argument into the per-element lambda, so a nested tokens()
    // would re-tokenize the document per shingle element (see the
    // shingles scaladoc; measured ~4.5× on the whole scorer)
    val pairs = docs
      .select(tokens(col("text")).as("ws"))
      .select(explode(shingles(col("ws"), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"))
    // ONE corpus pass: the training body runs THREE driver actions
    // (vocab size, the probs collect, the contexts collect), and each
    // would re-execute the tokenize+shingle pipeline over the full
    // corpus if it chained back to `pairs`. Persisting the unique-gram
    // aggregate — bounded by |distinct bigrams|, not corpus bytes —
    // collapses them to a single corpus scan; countDistinct(w2) over
    // c12's groups equals countDistinct over the raw pairs.
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
      val v = c12.agg(countDistinct(col("w2")).as("v")).head().getLong(0)
      val kept = graft.operators.Sampling.quotaPerGroup(
        c12, "w1", topK, col("c12").desc, col("w2").asc)
      // an empty/one-word-per-doc corpus trains nothing; scoring with
      // V = 0 would mint Infinity floors — fail at train time, loudly
      require(v > 0, "trainPruned: training corpus produced no bigrams " +
        "(empty, or every document shorter than two tokens)")
      val probs = kept.join(c1, "w1")
        .select(concat_ws(" ", col("w1"), col("w2")).as("g"),
          ((col("c12") + 0.5) / (col("c1") + v * 0.5)).as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val contexts = c1.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      PrunedLm(probs, contexts, v)
    } finally c12.unpersist()
  }

  /** Score a document frame — streaming or batch, identically — against
    * a [[trainPruned]] LM: (doc_id, n_bigrams, avg_logp, ppl), q129b's
    * arithmetic per bigram. Documents with fewer than two tokens drop
    * (no bigrams to score — q129b's explode does the same). Stateless
    * map-only plan: no Exchange, no state store.
    *
    * The LM ships as BROADCAST variables captured by one per-DOCUMENT
    * scoring UDF (a fold over the doc's own bigrams), not as `typedLit`
    * plan literals — the same call the hygiene scorer made in round 9
    * for the same reason: a pruned LM is O(contexts·K) ≈ the fastText
    * vocab size class (10⁵–10⁶ entries), where a map literal becomes
    * the per-micro-batch plan-analysis/serialization bottleneck
    * (SOAK.md's vocab-scale soak row pins the broadcast shape flat in
    * vocab size). The fold is left-to-right doubles with term-for-term
    * q129b arithmetic; it associates differently from the batch
    * aggregate's partial sums at ~1e-13, far under the 6dp/4dp output
    * rounding (the q129 scaladoc's argument — LmStreamsSpec pins exact
    * equality of the rounded outputs). */
  def scoreStream(docs: DataFrame, lm: PrunedLm): DataFrame = {
    val sc = docs.sparkSession.sparkContext
    val bProbs = sc.broadcast(lm.probs)
    val bCtx = sc.broadcast(lm.contexts)
    val v = lm.v
    val slpOf = udf { gs: Seq[String] =>
      val probs = bProbs.value
      val ctx = bCtx.value
      var s = 0.0
      gs.foreach { g =>
        val p = probs.get(g) match {
          case Some(pg) => pg
          case None => // two-level backoff: known context, then 1/V floor
            ctx.get(g.substring(0, g.indexOf(' '))) match {
              case Some(c1) => 0.5 / (c1 + v * 0.5)
              case None => 1.0 / v
            }
        }
        s += math.log(p)
      }
      s
    }
    docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      // drop no-bigram docs on the CHEAP column: filtering on size(gs)
      // instead lets predicate pushdown substitute the whole shingles
      // expression below the projection and re-evaluate it per row —
      // measured 0.5 → 3.6 s on the sf0.1 corpus (SOAK.md round 11);
      // size(ws) >= 2 ⟺ gs non-empty, and pushdown of size(tokens) is
      // one cheap array build per row
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), shingles(col("ws"), 2).as("gs"))
      .withColumn("slp", slpOf(col("gs")))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_bigrams"),
        round(col("slp") / size(col("gs")), 6).as("avg_logp"),
        round(exp(-col("slp") / size(col("gs"))), 4).as("ppl"))
  }
}
