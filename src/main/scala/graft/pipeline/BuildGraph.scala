package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{SparqlQueries, TripleGen}
import graft.io.{CommentFramedTsv, CuratorTables, Sinks, Sssom}
import graft.model.Triple

/** The end-to-end build — the Spark equivalent of
  * `python -m omim2obo` + the makefile's SPARQL post-processing
  * (SURVEY.md §3.1/§3.2): all sources → one triples Dataset → omim.ttl,
  * review.tsv, susceptibility + gene ROBOT templates, QC reports.
  *
  * One SparkSession, one DAG; the reference's cross-process makefile hops
  * (ROBOT java calls) become DataFrame queries on the shared triples DF.
  */
object BuildGraph {

  final case class Inputs(
      mimTitlesPath: String, mim2genePath: String, morbidmapPath: String,
      phenotypicSeriesPath: String, genemap2Path: String, hgncPath: String,
      exclusionsPath: String, protectedPath: String, capitalizationsPath: String,
      sssomPath: String, mappingsPath: String, pubmedRefsPath: String)

  /** The same inputs at the DataFrame level — the seam that lets any
    * source (files, synthesized plans, tests, other tables) feed the REAL
    * stage composition. [[build]] is the file-reading adapter over this.
    *
    * Expected columns (the post-read raw shapes):
    *  - titlesRaw: prefix, mim, pref_titles, alt_titles, inc_titles
    *  - mim2geneRaw: mim, entry_type, entrez_id, hgnc_symbol, ensembl_id
    *  - morbidRaw: phenotype, gene_symbols, gene_mim, cyto
    *  - psRaw: ps_id, a, b (b null on title rows)
    *  - genemap2: `MIM Number`, `Approved Gene Symbol`
    *  - hgncRaw: symbol, hgnc_id
    *  - exclusions: p_mim, excl_orcid
    *  - protectd: p_mim, gene_mim, hgnc_id, prot_orcid, mondo_id
    *  - omimToMondo: omim, mondo_ids (array)
    *  - mappings: mim, umls_ids, orphanet_ids ('|'-delimited)
    *  - pubmed: mim, pmid_refs ('|'-delimited) */
  final case class InputTables(
      titlesRaw: DataFrame, mim2geneRaw: DataFrame, morbidRaw: DataFrame,
      psRaw: DataFrame, genemap2: DataFrame, hgncRaw: DataFrame,
      exclusions: DataFrame, protectd: DataFrame, caps: Map[String, String],
      omimToMondo: DataFrame, mappings: DataFrame, pubmed: DataFrame)

  final case class Outputs(
      triples: Dataset[Triple], reviewCases: DataFrame,
      susceptibilityRows: DataFrame, diseaseGeneQc: DataFrame,
      mondoOmimGenes: DataFrame,
      morbidmapAugmented: DataFrame, mim2geneAugmented: DataFrame)

  /** Assemble the full graph + release artifacts from files. `versionDate`
    * is injected (never now()) for reproducible builds. */
  def build(spark: SparkSession, in: Inputs, versionDate: String): Outputs =
    buildFromTables(spark, InputTables(
      titlesRaw = CommentFramedTsv.read(spark, in.mimTitlesPath,
        Some(Seq("prefix", "mim", "pref_titles", "alt_titles", "inc_titles"))),
      mim2geneRaw = CommentFramedTsv.read(spark, in.mim2genePath,
        Some(Seq("mim", "entry_type", "entrez_id", "hgnc_symbol", "ensembl_id"))),
      morbidRaw = CommentFramedTsv.read(spark, in.morbidmapPath,
        Some(Seq("phenotype", "gene_symbols", "gene_mim", "cyto"))),
      psRaw = CommentFramedTsv.read(spark, in.phenotypicSeriesPath,
        Some(Seq("ps_id", "a", "b"))),
      genemap2 = CommentFramedTsv.read(spark, in.genemap2Path),
      hgncRaw = spark.read.option("sep", "\t").option("header", "true")
        .csv(in.hgncPath),
      exclusions = CuratorTables.exclusions(spark, in.exclusionsPath),
      protectd = CuratorTables.protected_(spark, in.protectedPath),
      caps = CuratorTables.knownCapitalizations(spark, in.capitalizationsPath),
      omimToMondo = Sssom.readOmimToMondo(spark, in.sssomPath),
      mappings = spark.read.option("sep", "\t").option("header", "true")
        .csv(in.mappingsPath),
      pubmed = spark.read.option("sep", "\t").option("header", "true")
        .csv(in.pubmedRefsPath)), versionDate)

  /** The REAL stage composition (main.py:227-528) over already-loaded
    * tables — every consumer (file build, q57's in-plan synthesized e2e
    * oracle, specs) runs exactly this code path. */
  def buildFromTables(spark: SparkSession, t: InputTables, versionDate: String): Outputs = {
    import spark.implicits._

    // Stage 3.1-2: setup + ingest/parse
    val titlesRaw = t.titlesRaw
    val titles = OmimPipeline.parseMimTitles(titlesRaw).cache()
    val caps = t.caps
    val morbidRaw = t.morbidRaw
    val exclusions = t.exclusions
    val protectd = t.protectd
    val omimToMondo = t.omimToMondo
    val symbolToId = OmimPipeline.hgncSymbolIdMap(t.hgncRaw)
    // Protected-augmentation rewrite (J9/J10/SO1, omim_txt_parser.py:
    // 124-197): morbidmap and mim2gene are augmented ONCE here and every
    // downstream consumer (cascade, review cases, cyto, hgnc maps) sees
    // the synthesized rows — the reference's get_mim_file reads the
    // '-protected-added' variant everywhere (omim_txt_parser.py:240-260).
    val morbid = OmimPipeline.augmentMorbidMap(
      OmimPipeline.parseMorbidMap(morbidRaw), protectd, titles, symbolToId).cache()
    val assocs = morbid.filter(col("p_mim") =!= "")
    val mim2gene = OmimPipeline.augmentMim2Gene(t.mim2geneRaw, protectd, symbolToId)
    val psRaw = t.psRaw

    // Stage 4: entity triples (per-MIM flatMap)
    val entity = OmimPipeline.entityTriples(titles, caps)

    // Stage 5: relational core
    val tagged = OmimPipeline.tagAssociations(assocs, exclusions, protectd).cache()
    val cascade = OmimPipeline.cascadeTriples(tagged, protectd)
    val cyto = OmimPipeline.cytoTriples(morbid)
    val m2g = OmimPipeline.mim2geneTriples(mim2gene)
    val hgncMap1 = mim2gene
      .filter(col("entry_type").isin("gene", "gene/phenotype"))
      .filter(coalesce(col("hgnc_symbol"), lit("")) =!= "")
      .select(col("mim"), col("hgnc_symbol").as("symbol"))
    val hgncMap2 = t.genemap2.select(
      col("MIM Number").as("mim"), col("Approved Gene Symbol").as("symbol"))
      .filter(coalesce(col("symbol"), lit("")) =!= "")
    val hgncMerged = OmimPipeline.hgncMapMerged(hgncMap1, hgncMap2)
    val hgnc = OmimPipeline.hgncTriples(hgncMerged, symbolToId)
    val ps = OmimPipeline.phenoSeriesTriples(psRaw)

    // Stage 6: enrichment (cached API tables)
    val links =
      OmimPipeline.linkTriples(t.pubmed, "pmid_refs", TripleGen.Mentions, "PMID")
        .union(OmimPipeline.linkTriples(t.mappings, "umls_ids", TripleGen.SkosExactMatch, "UMLS"))
        .union(OmimPipeline.linkTriples(t.mappings, "orphanet_ids", TripleGen.SkosExactMatch, "ORPHANET"))

    val header = spark.createDataset(TripleGen.ontologyHeader(versionDate))

    // Truncate lineage at the graph fan-out boundaries with LAZY
    // localCheckpoint (not cache): hgncLinks pattern-joins the graph
    // against itself four times and the reports re-join the result.
    // cache() dedups COMPUTATION but leaves the logical plan intact, so
    // every self-join arm re-embeds the entire upstream build tree and
    // the analyzer (DeduplicateRelations + per-rule tree walks) goes
    // combinatorial — measured 40 s of driver CPU per action at sf0.1.
    // localCheckpoint replaces the plan with a LogicalRDD leaf
    // immediately (eager=false defers the actual materialization to the
    // first action, which then persists the RDD for the later arms).
    val baseTriples = header
      .union(entity).union(cascade).union(cyto).union(m2g)
      .union(hgnc).union(ps).union(links)
    val base = baseTriples.toDF().localCheckpoint(eager = false)
    val flipped = SparqlQueries.addFlippedMondoMappings(base)
      .localCheckpoint(eager = false)

    // Makefile SPARQL UPDATE stage (G17): flipped MONDO mappings + HGNC links
    val withUpdates = SparqlQueries.hgncLinks(flipped).as[Triple].cache()

    // Reports (G16/G18)
    val types = titles.select(col("mim"), col("omim_type"))
    Outputs(
      triples = withUpdates,
      reviewCases = OmimPipeline.reviewCases(tagged, morbid, types),
      susceptibilityRows = OmimPipeline.susceptibilityRows(assocs, omimToMondo)
        .orderBy("mondo_id", "omim_id"),
      diseaseGeneQc = SparqlQueries.diseaseGeneRelationships(withUpdates.toDF()),
      mondoOmimGenes = SparqlQueries.mondoOmimGenes(withUpdates.toDF())
        .orderBy("mondo_id", "hgnc_id", "omim_gene", "omim_disease_xref"),
      morbidmapAugmented = morbid,
      mim2geneAugmented = mim2gene)
  }

  /** Write the release artifacts (stage 3.1-7 sinks + makefile targets). */
  def writeArtifacts(spark: SparkSession, out: Outputs, dir: String): Unit = {
    Sinks.writeTurtle(spark, out.triples, s"$dir/omim.ttl")
    Sinks.writeOrderedTsv(out.reviewCases, s"$dir/review.tsv",
      Seq("classCode", "value"))
    Sinks.writeOrderedTsv(out.susceptibilityRows,
      s"$dir/mondo-omim-susceptibility-subset.robot.tsv",
      Seq("mondo_id", "omim_id"),
      extraHeaderRows = Seq(Seq("ID", "AI oboInOwl:inSubset", ">A oboInOwl:source")))
    Sinks.writeOrderedTsv(out.mondoOmimGenes, s"$dir/mondo-omim-genes.robot.tsv",
      Seq("mondo_id", "hgnc_id", "omim_gene", "omim_disease_xref"),
      extraHeaderRows = Seq(SparqlQueries.robotSubheader))
    Sinks.writeOrderedTsv(out.diseaseGeneQc, s"$dir/disease-gene-relationships-qc.tsv",
      Seq("PredDirection", "SubBiolink", "Pred", "SubId", "ObjBiolink", "ObjId"))
    Sinks.writeOrderedTsv(
      graft.io.SssomExport.fromTriples(out.triples.toDF()), s"$dir/omim.sssom.tsv",
      Seq("subject_id", "object_id"),
      preHeaderLines = graft.io.SssomExport.frontMatter)
    // The reference's '-protected-added' table artifacts
    // (omim_txt_parser.py:138,196-197), in the parsed relational shape —
    // this engine's canonical morbidmap form (parse once, reuse).
    Sinks.writeOrderedTsv(
      out.morbidmapAugmented.select(
        col("p_label"), col("p_mim"), col("map_key"),
        concat_ws(", ", col("gene_symbols")).as("gene_symbols"),
        col("gene_mim"), col("cyto_location"), col("is_added_protection")),
      s"$dir/morbidmap-protected-added.tsv",
      Seq("p_mim", "gene_mim", "map_key", "p_label"))
    Sinks.writeOrderedTsv(out.mim2geneAugmented,
      s"$dir/mim2gene-protected-added.tsv", Seq("mim", "hgnc_symbol"))
  }
}
