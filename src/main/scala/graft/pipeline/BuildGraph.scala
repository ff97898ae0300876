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

  final case class Outputs(
      triples: Dataset[Triple], reviewCases: DataFrame,
      susceptibilityRows: DataFrame, diseaseGeneQc: DataFrame,
      mondoOmimGenes: DataFrame,
      morbidmapAugmented: DataFrame, mim2geneAugmented: DataFrame)

  /** Assemble the full graph + release artifacts. `versionDate` is
    * injected (never now()) for reproducible builds. */
  def build(spark: SparkSession, in: Inputs, versionDate: String): Outputs = {
    import spark.implicits._

    // Stage 3.1-2: setup + ingest/parse
    val titlesRaw = CommentFramedTsv.read(spark, in.mimTitlesPath,
      Some(Seq("prefix", "mim", "pref_titles", "alt_titles", "inc_titles")))
    val titles = OmimPipeline.parseMimTitles(titlesRaw).cache()
    val caps = CuratorTables.knownCapitalizations(spark, in.capitalizationsPath)
    val morbidRaw = CommentFramedTsv.read(spark, in.morbidmapPath,
      Some(Seq("phenotype", "gene_symbols", "gene_mim", "cyto")))
    val exclusions = CuratorTables.exclusions(spark, in.exclusionsPath)
    val protectd = CuratorTables.protected_(spark, in.protectedPath)
    val omimToMondo = Sssom.readOmimToMondo(spark, in.sssomPath)
    val symbolToId = OmimPipeline.hgncSymbolIdMap(
      spark.read.option("sep", "\t").option("header", "true").csv(in.hgncPath))
    // Protected-augmentation rewrite (J9/J10/SO1, omim_txt_parser.py:
    // 124-197): morbidmap and mim2gene are augmented ONCE here and every
    // downstream consumer (cascade, review cases, cyto, hgnc maps) sees
    // the synthesized rows — the reference's get_mim_file reads the
    // '-protected-added' variant everywhere (omim_txt_parser.py:240-260).
    val morbid = OmimPipeline.augmentMorbidMap(
      OmimPipeline.parseMorbidMap(morbidRaw), protectd, titles, symbolToId).cache()
    val assocs = morbid.filter(col("p_mim") =!= "")
    val mim2geneRaw = CommentFramedTsv.read(spark, in.mim2genePath,
      Some(Seq("mim", "entry_type", "entrez_id", "hgnc_symbol", "ensembl_id")))
    val mim2gene = OmimPipeline.augmentMim2Gene(mim2geneRaw, protectd, symbolToId)
    val psRaw = CommentFramedTsv.read(spark, in.phenotypicSeriesPath,
      Some(Seq("ps_id", "a", "b")))

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
    val genemap2 = CommentFramedTsv.read(spark, in.genemap2Path)
    val hgncMap2 = genemap2.select(
      col("MIM Number").as("mim"), col("Approved Gene Symbol").as("symbol"))
      .filter(coalesce(col("symbol"), lit("")) =!= "")
    val hgncMerged = OmimPipeline.hgncMapMerged(hgncMap1, hgncMap2)
    val hgnc = OmimPipeline.hgncTriples(hgncMerged, symbolToId)
    val ps = OmimPipeline.phenoSeriesTriples(psRaw)

    // Stage 6: enrichment (cached API tables)
    val mappings = spark.read.option("sep", "\t").option("header", "true")
      .csv(in.mappingsPath)
    val pubmed = spark.read.option("sep", "\t").option("header", "true")
      .csv(in.pubmedRefsPath)
    val links =
      OmimPipeline.linkTriples(pubmed, "pmid_refs", TripleGen.Mentions, "PMID")
        .union(OmimPipeline.linkTriples(mappings, "umls_ids", TripleGen.SkosExactMatch, "UMLS"))
        .union(OmimPipeline.linkTriples(mappings, "orphanet_ids", TripleGen.SkosExactMatch, "ORPHANET"))

    val header = spark.createDataset(TripleGen.ontologyHeader(versionDate))

    val baseTriples = header
      .union(entity).union(cascade).union(cyto).union(m2g)
      .union(hgnc).union(ps).union(links)

    // Makefile SPARQL UPDATE stage (G17): flipped MONDO mappings + HGNC links
    val withUpdates = SparqlQueries.hgncLinks(
      SparqlQueries.addFlippedMondoMappings(baseTriples.toDF())).as[Triple].cache()

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
