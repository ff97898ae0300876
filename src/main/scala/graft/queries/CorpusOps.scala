package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Corpus-construction operators over the documents table: the
  * deterministic sampling / mixing / capping / ordering steps a
  * reproducible training-data build runs between dedup and export.
  * All hash-driven (md5-bucket scheme shared with the minhash kernels),
  * so the DuckDB oracle reproduces every row exactly.
  */
object CorpusOps {

  /** DuckDB twin of [[Sampling.hashBucket]]. */
  private def bucketSql(seed: String, key: String): String =
    s"(('0x' || substr(md5('$seed' || $key::VARCHAR), 1, 15))::BIGINT % 1000000)"

  /** Deterministic 10% Bernoulli sample by doc_id. */
  val q50DeterministicSample = QueryDef(
    "q50_deterministic_sample",
    (s, d) =>
      Sampling.deterministicSample(Tables.documents(s, d), "doc_id", 0.1, "s1")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id"),
    Some(s"""
      SELECT doc_id, lang, source, n_chars
      FROM documents
      WHERE ${bucketSql("s1", "doc_id")} < 100000
      ORDER BY doc_id
    """))

  /** Stratified by language: en 50%, zh 25%, everything else 5%. */
  val q51StratifiedSample = QueryDef(
    "q51_stratified_sample",
    (s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 0.5, "zh" -> 0.25), defaultFraction = 0.05, seed = "s2")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"),
    Some(s"""
      SELECT doc_id, lang, n_chars
      FROM documents
      WHERE ${bucketSql("s2", "doc_id")} <
            CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 250000
                 ELSE 50000 END
      ORDER BY doc_id
    """))

  /** Weighted two-corpus mix with provenance: 'web' sources at 50%,
    * 'books' at 100%. */
  val q52CorpusMix = QueryDef(
    "q52_corpus_mix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val web = docs.filter(col("source").isin("src0", "src1", "src2"))
      val books = docs.filter(col("source").isin("src3", "src4"))
      Sampling.weightedMix(
          Seq(("web", web, 0.5), ("books", books, 1.0)), "doc_id", "s3")
        .select(col("doc_id"), col("source"), col("mix_source"))
        .orderBy("doc_id", "mix_source")
    },
    Some(s"""
      SELECT doc_id, source, mix_source FROM (
        SELECT doc_id, source, 'web' AS mix_source
        FROM documents
        WHERE source IN ('src0', 'src1', 'src2')
          AND ${bucketSql("s3", "doc_id")} < 500000
        UNION ALL
        SELECT doc_id, source, 'books'
        FROM documents
        WHERE source IN ('src3', 'src4')
          AND ${bucketSql("s3", "doc_id")} < 1000000)
      ORDER BY doc_id, mix_source
    """))

  /** Per-source quota: keep the 5 longest docs per source (domain cap). */
  val q53QuotaPerSource = QueryDef(
    "q53_quota_per_source",
    (s, d) =>
      Sampling.quotaPerGroup(Tables.documents(s, d), "source", 5,
          col("n_chars").desc, col("doc_id").asc)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy("source", "doc_id"),
    Some("""
      SELECT source, doc_id, n_chars
      FROM documents
      QUALIFY row_number() OVER (PARTITION BY source
        ORDER BY n_chars DESC, doc_id) <= 5
      ORDER BY source, doc_id
    """))

  /** Deterministic training-order shuffle: a seeded hash sort that is a
    * plain distributed range sort (no global window, no RNG state). */
  val q54ShuffleOrder = QueryDef(
    "q54_shuffle_order",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Sampling.shuffleKey(col("doc_id"), "epoch7").as("shuffle_key"))
        .orderBy("shuffle_key", "doc_id"),
    Some(s"""
      SELECT doc_id, ${bucketSql("epoch7", "doc_id")} AS shuffle_key
      FROM documents
      ORDER BY shuffle_key, doc_id
    """))

  /** The composed corpus build: exact dedup (keep-first per
    * fingerprint) → per-source quota cap → stratified language sample,
    * chaining the real operators end to end the way a production
    * pipeline would. Every stage is map-only or partial-top-k; the
    * synthetic duplicates (doubled spaces, shifted ids) come from the
    * q22 corpus construction. */
  val q55CorpusPipeline = QueryDef(
    "q55_corpus_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      val corpus = docs.unionByName(docs.select(
        (col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), " ", "  ").as("text"),
        col("lang"), col("source"), col("n_chars")))
      val deduped = Sampling.quotaPerGroup(
          corpus.withColumn("fp",
            graft.functions.TextFunctions.fingerprint(col("text"))),
          "fp", 1, col("doc_id").asc)
        .drop("fp", "text")
      val capped = Sampling.quotaPerGroup(deduped, "source", 10,
        col("n_chars").desc, col("doc_id").asc)
      Sampling.stratifiedSample(capped, "doc_id", "lang",
          Map("en" -> 0.5), defaultFraction = 0.2, seed = "p7")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH corpus AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 200000, replace(text, ' ', '  '), lang, source, n_chars
        FROM documents),
      deduped AS (
        SELECT doc_id, lang, source, n_chars FROM corpus
        QUALIFY row_number() OVER (
          PARTITION BY md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
          ORDER BY doc_id) = 1),
      capped AS (
        SELECT * FROM deduped
        QUALIFY row_number() OVER (PARTITION BY source
          ORDER BY n_chars DESC, doc_id) <= 10)
      SELECT doc_id, lang, source, n_chars
      FROM capped
      WHERE ${bucketSql("p7", "doc_id")} <
            CASE lang WHEN 'en' THEN 500000 ELSE 200000 END
      ORDER BY doc_id
    """))

  val all: Seq[QueryDef] = Seq(
    q50DeterministicSample, q51StratifiedSample, q52CorpusMix,
    q53QuotaPerSource, q54ShuffleOrder, q55CorpusPipeline)
}
