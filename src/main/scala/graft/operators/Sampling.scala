package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, hash-based sampling and corpus-mix operators for
  * reproducible training-data pipelines.
  *
  * Everything here is a map-only column predicate over a 60-bit md5
  * bucket — no RNG state — so a sample is (a) identical across engines
  * (DuckDB twin: `('0x'||substr(md5(k),1,15))::BIGINT`), runs,
  * partitionings, and cluster sizes; (b) resumable after partial
  * failure; and (c) composable: disjoint seeds give independent samples,
  * and the same seed with a larger fraction gives a strict superset — a
  * fraction ramp-up reuses every already-materialized row, which matters
  * when half of a 100 TB sample is already on disk. `df.sample()` (RNG
  * per partition) guarantees none of these.
  */
object Sampling {

  /** Buckets per unit interval — ppm-resolution fractions. */
  val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from a 60-bit md5 prefix of
    * (seed ++ key) — the cross-engine hash scheme shared with the
    * minhash kernels (expressions.TextHashExpressions). */
  def hashBucket(key: Column, seed: String): Column =
    pmod(conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(Buckets))

  /** Deterministic Bernoulli sample: keep rows whose bucket falls below
    * `fraction`·Buckets. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          seed: String): DataFrame =
    df.filter(hashBucket(col(keyCol), seed) < (fraction * Buckets).toLong)

  /** Stratified sample with per-stratum fractions (absent strata fall
    * back to `defaultFraction`). One map-only pass — no shuffle, no
    * per-stratum rescans. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double, seed: String): DataFrame = {
    val rate = fractions.foldLeft(
      lit((defaultFraction * Buckets).toLong)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), seed) < rate)
  }

  /** Weighted corpus mix — the "web at 50%, books at 100%" step of a
    * training-data build: a union of map-only per-source samples with a
    * provenance tag. */
  def weightedMix(sources: Seq[(String, DataFrame, Double)], keyCol: String,
                  seed: String): DataFrame =
    sources.map { case (name, df, rate) =>
      deterministicSample(df, keyCol, rate, seed)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)

  /** Per-group quota: the top `n` rows per group by `orderCols` (domain
    * caps — "≤ n docs per host"). `row_number ≤ n` gets Spark's
    * WindowGroupLimit partial top-k pushdown: each map task keeps at most
    * n rows per group BEFORE the shuffle, so the exchange carries
    * O(groups·n), not the corpus. */
  def quotaPerGroup(df: DataFrame, groupCol: String, n: Int,
                    orderCols: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Weighted reservoir sampling (Efraimidis–Spirakis A-Res) with a
    * deterministic reservoir: each row draws u ∈ (0,1] from the md5
    * bucket of (seed ++ key) and keeps key ln(u)/w — a monotone transform
    * of the A-Res priority u^(1/w), so the k LARGEST keys per group are
    * exactly the A-Res reservoir, and heavier rows win proportionally
    * more often. Same run → same sample (auditable corpus builds), and
    * the DuckDB oracle replays the identical arithmetic.
    *
    * Selection is [[quotaPerGroup]] on the key, so Spark's
    * WindowGroupLimit keeps ≤ k rows per group on the map side — the
    * shuffle carries O(groups·k) rows, never the corpus: the reservoir
    * property holds in the PLAN, not just the semantics. Weights must be
    * strictly positive (u ≤ 1 makes ln(u)/w ≤ 0; w ≤ 0 would flip the
    * ordering silently, so callers filter first). */
  def weightedReservoir(df: DataFrame, keyCol: String, groupCol: String,
                        weight: Column, k: Int, seed: String): DataFrame = {
    val u = (hashBucket(col(keyCol), seed) + 1).cast("double") / Buckets.toDouble
    val keyed = df.withColumn("__ares", log(u) / weight.cast("double"))
    quotaPerGroup(keyed, groupCol, k, col("__ares").desc, col(keyCol).asc)
      .drop("__ares")
  }

  /** Leakage-safe train/val/test assignment: the split is a hash of the
    * GROUP (domain, source, url-host…), not the row, so near-duplicates
    * that share a group can never straddle a split boundary — the
    * classic eval-contamination failure of row-hash splits. Map-only
    * (the group value hashes in place; no join, no shuffle) and stable
    * under corpus growth: a group keeps its split forever, so refreshing
    * the corpus never migrates yesterday's eval docs into train.
    * `fracs` are (name, fraction) in priority order and must sum to 1
    * (enforced by [[splitLabel]]); the LAST split is the CASE ladder's
    * `otherwise`, so float rounding in the cumulative cuts lands there. */
  def groupedSplit(df: DataFrame, groupCol: String, seed: String,
                   fracs: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(col(groupCol), seed, fracs))

  /** The split assignment as a pure column — [[groupedSplit]]'s CASE
    * ladder, exposed so a frame that carries the SAME key under another
    * name (a near-dup pair table with `id_a`/`id_b`, a shard manifest)
    * can re-derive each side's split in place. Because the label is a
    * pure function of (seed, key), an audit over pairs costs ZERO joins
    * against the split assignment — at 100 TB a split-label join would
    * re-shuffle the corpus; this is a map-side expression (q131). */
  def splitLabel(key: Column, seed: String,
                 fracs: Seq[(String, Double)]): Column = {
    require(fracs.nonEmpty && math.abs(fracs.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = hashBucket(key, seed)
    val cuts = fracs.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.round(f * Buckets))
    fracs.zip(cuts).init.foldRight(
      lit(fracs.last._1): Column) { case (((name, _), cut), acc) =>
      when(bucket < cut, name).otherwise(acc)
    }
  }

  /** Deterministic training-order shuffle key: ORDER BY this column
    * (plus the key for tie stability) is a plain distributed range sort —
    * no global window, no driver state, same order every run. */
  def shuffleKey(key: Column, seed: String): Column = hashBucket(key, seed)

  /** GPT-style sequence packing: documents concatenate in a fixed order
    * and are cut every `budget` tokens, so every training sequence is
    * exactly full and a document may span bins. Returns the input plus
    * the pack layout per doc: shard, tok_offset (tokens before it in its
    * shard), first_bin/last_bin (bins it overlaps), n_bins.
    *
    * The concat order must be deterministic AND distributed: docs shard
    * by the 60-bit hash of `idCol` into `numShards` independent streams,
    * and the running offset is a window cumsum PARTITIONED BY the shard
    * — never a global window (each shard packs independently, exactly
    * how real pipelines shard a tokenized corpus; bin ids are per-shard).
    * Within a shard the order is `orderCol` ascending (ties broken by
    * `idCol`). Docs longer than `budget` span multiple bins —
    * concat-and-cut has no overflow case, unlike greedy whole-doc
    * packing; zero-token docs occupy their start bin. */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
                    orderCol: Column, budget: Long, numShards: Int,
                    seed: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(numShards > 0, "numShards must be positive")
    val reserved = Seq("shard", "tok_offset", "first_bin", "last_bin", "n_bins", "__tok")
      .filter(df.columns.contains)
    require(reserved.isEmpty, s"reserved column names in use: ${reserved.mkString(",")}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(orderCol, idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(hashBucket(idCol, seed), lit(numShards.toLong)))
      .withColumn("__tok", tokensCol.cast("long"))
      .withColumn("tok_offset", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("first_bin", floor(col("tok_offset") / budget))
      .withColumn("last_bin",
        floor((col("tok_offset") + greatest(col("__tok"), lit(1L)) - 1) / budget))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1)
      .drop("__tok")
  }

  /** Temperature-based source mixing at T = 2 — the standard multi-source
    * LLM recipe (GPT-3 §2.2 / PaLM data mixtures): source s is sampled
    * with probability ∝ n_s^(1/T), flattening the natural distribution
    * so small high-quality sources are over-represented. Keep rates
    * follow as rate_s = target · N · w_s / (n_s · W) with w_s = n_s^(1/2)
    * and W = Σ w_s (expected output ≈ target · N docs).
    *
    * Exactness stance (the q42/q69 rule — no transcendentals cross
    * engines): T = 2 is computed with INTEGER weights w_s =
    * floor(sqrt(n_s)) — IEEE sqrt is correctly rounded, so floor∘sqrt
    * of a long is the exact integer square root on every engine — and
    * the per-source bucket threshold is one integer division, so the
    * sampled set is bit-reproducible anywhere. Arbitrary T needs pow(),
    * whose last ulp differs between engines; callers wanting T ≠ 2
    * precompute thresholds driver-side.
    *
    * Shape: one tiny per-source count agg — collected as bounded
    * metadata (|sources| rows, the k-means-centroids convention) so the
    * threshold arithmetic runs in BigInt on the driver: targetPpm·N·w
    * overflows a Long already at a ~1e9-row source (review-caught), and
    * Spark's in-plan decimal division rounds where the formula needs an
    * exact floor — then a broadcast of |sources| thresholds and a
    * map-only bucket filter. No data-sized shuffle. */
  def temperatureMixSqrt(df: DataFrame, sourceCol: String, keyCol: String,
                         targetPpm: Long, seed: String): DataFrame = {
    require(targetPpm >= 0 && targetPpm <= Buckets, s"targetPpm out of [0, $Buckets]")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
      .select(col(sourceCol).cast("string"), col("__n"), col("__w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totN = BigInt(counts.map(_._2).sum)
    val totW = BigInt(counts.map(_._3).sum)
    val rates = counts.map { case (src, n, w) =>
      (src, ((BigInt(targetPpm) * totN * w) / (BigInt(n) * totW)).toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("__src", "__thresh")
    df.join(broadcast(rateDf), col(sourceCol).cast("string") === col("__src"))
      .filter(hashBucket(col(keyCol), seed) < col("__thresh"))
      .drop("__src", "__thresh")
  }

  /** Epoch-replication source mixing — the multi-epoch half of the
    * standard LLM data recipe (LLaMA/GPT-3 style mixture tables quote
    * "epochs over the source"): a per-source rate of R epochs (ppm —
    * 1e6 = exactly one pass) emits floor(R) full copies of every doc
    * plus one more for the deterministic frac(R) slice selected by the
    * seeded hash bucket, so the EXPECTED replication is exactly R and
    * the output is bit-reproducible on any engine or partitioning.
    * Rates arrive frozen (control-plane, the q87 convention); emits the
    * input columns plus `epoch` (0-based copy index).
    *
    * Shape: broadcast |sources| rates + one map-only explode of the
    * per-row copy range — no shuffle, no state; rate 0 drops the source
    * entirely (the sequence guard matters: Spark's `sequence(0, -1)`
    * would DESCEND, not empty). */
  def epochMix(df: DataFrame, sourceCol: String, keyCol: String,
               ratesPpm: Map[String, Long], seed: String): DataFrame = {
    require(ratesPpm.values.forall(_ >= 0), "epoch rates must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = broadcast(ratesPpm.toSeq.toDF("__src", "__rate"))
    df.join(rdf, col(sourceCol).cast("string") === col("__src"))
      .withColumn("__n", expr(s"__rate div $Buckets") +
        when(hashBucket(col(keyCol), seed) < col("__rate") % Buckets, 1L)
          .otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__src", "__rate", "__n")
  }

  /** Sliding-window document chunking — the long-document preprocessing
    * step for context-bounded training/embedding (BERT-style stride
    * windows): chunk c covers tokens [c·stride, c·stride + maxTokens),
    * so consecutive chunks overlap by maxTokens − stride tokens. Chunks
    * that would add no new tokens are not emitted: a doc of n tokens
    * yields 1 chunk when n ≤ maxTokens, else 1 + ceil((n − maxTokens) /
    * stride); empty docs yield none. Chunk text re-joins tokens with
    * single spaces (whitespace-normalizing, the [[graft.functions.TextFunctions.tokens]]
    * convention).
    *
    * Shape: tokenize once, explode the chunk index range, then per-row
    * array slices on the carried token array — map-only, no shuffle, no
    * higher-order-function lambda over a column subtree (the q80
    * lesson). */
  def chunkDocuments(df: DataFrame, idCol: Column, text: Column,
                     maxTokens: Int, stride: Int,
                     carry: Seq[(String, Column)] = Nil): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(stride > 0 && stride <= maxTokens,
      "stride must be in [1, maxTokens] (larger would drop tokens)")
    // `carry` rides per-doc metadata through the explode so STREAMING
    // callers can keep scores/counters next to each chunk without a
    // doc-level join afterwards (a stream⋈stream join would be stateful;
    // this stays map-only). Names that collide with working or output
    // columns would be silently shadowed — reject them loudly (the
    // Dedup.requireSafeKeys convention; resolution is case-insensitive).
    val reservedChunk = Set("doc_id", "chunk_idx", "chunk_start",
      "chunk_len", "chunk_text", "__ws", "__n", "__nc", "__chunk")
    val badCarry = carry.map(_._1).filter(n => reservedChunk.contains(n.toLowerCase))
    require(badCarry.isEmpty,
      s"carry name(s) ${badCarry.mkString(", ")} collide with reserved " +
        s"chunk columns (${reservedChunk.toSeq.sorted.mkString(", ")})")
    val carried = carry.map { case (n, c) => c.as(n) }
    val carriedRefs = carry.map { case (n, _) => col(n) }
    df.select(idCol.as("doc_id") +: (carried :+
        graft.functions.TextFunctions.tokens(text).as("__ws")): _*)
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .withColumn("__nc",
        when(col("__n") <= maxTokens, lit(1)).otherwise(
          lit(1) + ceil((col("__n") - maxTokens).cast("double") / stride).cast("int")))
      .select(col("doc_id") +: (carriedRefs :+ col("__ws") :+
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx")): _*)
      .withColumn("chunk_start", (col("chunk_idx") * stride).cast("long"))
      .withColumn("__chunk",
        slice(col("__ws"), col("chunk_idx") * stride + 1, lit(maxTokens)))
      .select(col("doc_id") +: (carriedRefs ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start"), size(col("__chunk")).cast("long").as("chunk_len"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))): _*)
  }

  /** The writable form of [[packSequences]]'s layout: one row per
    * (shard, bin) listing the member docs in concat order — what a
    * training-file writer materializes (each bin = one fixed-budget
    * training sequence; a doc spanning bins appears in each bin it
    * overlaps). `idCol` names the id column the packing was keyed on
    * (whatever was passed to packSequences — not assumed to be doc_id).
    * One explode of the per-doc bin span + one (shard, bin)
    * aggregation; bins hold O(budget / mean doc length) docs, so rows
    * stay small by construction. */
  def packManifest(packed: DataFrame, idCol: String = "doc_id"): DataFrame =
    packed
      .select(col("shard"), col(idCol).as("__id"), col("tok_offset"),
        explode(sequence(col("first_bin"), col("last_bin"))).as("bin"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", transform(
          array_sort(collect_list(struct(col("tok_offset"), col("__id")))),
          s => s.getField("__id").cast("string"))).as("doc_ids"))
}
