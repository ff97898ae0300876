package graft.client

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.entry.EntrySchema
import graft.io.{AuxSources, Sinks}
import graft.pipeline.OmimPipeline

/** The reference's cache-refresh orchestration
  * (update_cache__pubmed_refs_and_mappings, omim_txt_parser.py:516-585)
  * as ONE composed flow: decide which MIMs to (re)fetch → batched fetch
  * (S3 connector; transport stubbed in this zero-egress environment) →
  * entry parse → cache upsert (A8/J8) → write both cache TSVs (W3 sinks).
  *
  * Scale shape: the id-decision is an anti-join/filter over the cache
  * tables (no driver set arithmetic); the fetch distributes in
  * [[OmimClient.BatchSize]] chunks per partition; parsing is one
  * schema-bound JSON scan (no inference pass); the upsert is a single
  * broadcast-able anti-join per cache table. Nothing collects to the
  * driver.
  */
object CacheRefresh {

  /** The two cache tables the reference maintains side by side
    * (MAPPINGS_PATH / PUBMED_REFS_PATH). */
  final case class CacheTables(mappings: DataFrame, pubmed: DataFrame)

  /** Decide which MIM ids to (re)fetch.
    *
    * Seed / incomplete-cache mode (`sinceDate=None`; ref :529-544): every
    * id in `allMims` not present in either cache table.
    * Incremental mode (ref :545-552): the reference asks the API for ids
    * updated since `last_updated - 1 day`; offline, the equivalent
    * decision is [[AuxSources.staleCacheRows]] — cached rows fetched
    * strictly before that same precaution-adjusted date. */
  def idsToFetch(allMims: DataFrame, cached: CacheTables,
                 sinceDate: Option[String]): DataFrame = sinceDate match {
    case None =>
      val cachedIds = cached.mappings.select("mim")
        .unionByName(cached.pubmed.select("mim")).distinct()
      allMims.select("mim").distinct()
        .join(cachedIds, Seq("mim"), "left_anti")
    case Some(d) =>
      AuxSources.staleCacheRows(
          cached.mappings.select("mim", "date_fetched")
            .unionByName(cached.pubmed.select("mim", "date_fetched")), d)
        .select("mim").distinct()
  }

  /** Fetched JSON → fresh cache rows (ref :557-576). One schema-bound
    * JSON parse ([[EntrySchema]]); umls ids split on ',' (get_mapped_ids,
    * omim_entry_parser.py:408-409), orphanet compounds on ';;;' keeping
    * the first ';;' component (:405-407), pubmed ids from referenceList
    * (:392-398) — all re-joined with '|' exactly as the cache stores
    * them. `is_phenotype` is membership in `phenotypeMims` (morbidmap
    * p_mims, get_all_phenotype_mims); `fetchDate` is injected (never
    * now()) for reproducible builds. */
  def parseFetched(spark: SparkSession, fetched: Dataset[OmimClient.FetchResult],
                   phenotypeMims: DataFrame, fetchDate: String): CacheTables = {
    import spark.implicits._
    val docs = spark.read.schema(EntrySchema.envelope).json(fetched.map(_.json))
    val phenos = broadcast(
      phenotypeMims.select(col("mim")).distinct().withColumn("__is_p", lit(true)))
    val entries = docs
      .select(explode(col("omim.entryList")).as("e"))
      .select(
        col("e.entry.mimNumber").cast("string").as("mim"),
        col("e.entry.externalLinks.umlsIDs").as("umls"),
        col("e.entry.externalLinks.orphanetDiseases").as("orph"),
        expr("transform(filter(e.entry.referenceList, " +
          "r -> r.reference.pubmedID is not null), " +
          "r -> cast(r.reference.pubmedID as string))").as("pubs"))
      .join(phenos, Seq("mim"), "left")
      .withColumn("is_phenotype",
        when(col("__is_p").isNotNull, "True").otherwise("False"))
      .withColumn("date_fetched", lit(fetchDate))
    CacheTables(
      mappings = entries.select(
        col("mim"), col("is_phenotype"), col("date_fetched"),
        when(col("umls").isNull, lit(""))
          .otherwise(regexp_replace(col("umls"), ",", "|")).as("umls_ids"),
        when(col("orph").isNull, lit("")).otherwise(
          array_join(transform(split(trim(col("orph")), ";;;"),
            x => trim(split(x, ";;").getItem(0))), "|")).as("orphanet_ids")),
      pubmed = entries.select(
        col("mim"), col("is_phenotype"), col("date_fetched"),
        coalesce(array_join(col("pubs"), "|"), lit("")).as("pmid_refs")))
  }

  /** The full flow (ref update_cache__pubmed_refs_and_mappings):
    * decide-stale → fetch → parse → upsert. An empty fetch upserts
    * nothing, leaving both tables unchanged (the reference early-returns;
    * same fixpoint). */
  def refresh(spark: SparkSession, cached: CacheTables, allMims: DataFrame,
              phenotypeMims: DataFrame, transport: OmimClient.Transport,
              fetchDate: String, sinceDate: Option[String] = None,
              maxConcurrency: Int = 1): CacheTables = {
    import spark.implicits._
    val ids = idsToFetch(allMims, cached, sinceDate)
      .select(col("mim").cast("string")).as[String]
    val fetched = OmimClient.fetchEntries(ids, transport, maxConcurrency)
    val fresh = parseFetched(spark, fetched, phenotypeMims, fetchDate)
    CacheTables(
      mappings = OmimPipeline.cacheUpsert(cached.mappings, fresh.mappings, "mim"),
      pubmed = OmimPipeline.cacheUpsert(cached.pubmed, fresh.pubmed, "mim"))
  }

  /** Write both cache TSVs sorted by mim (ref :580-585 to_csv). */
  def writeCaches(tables: CacheTables, mappingsPath: String,
                  pubmedPath: String): Unit = {
    Sinks.writeOrderedTsv(tables.mappings, mappingsPath, Seq("mim"))
    Sinks.writeOrderedTsv(tables.pubmed, pubmedPath, Seq("mim"))
  }
}
