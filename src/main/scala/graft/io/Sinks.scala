package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** Sinks for the OMIM artifact family (SURVEY.md §2.1 S9/S10). */
object Sinks {

  /** Default CURIE prefix expansions for the Turtle sink (subset of the
    * reference's 203-namespace map, omim2obo/namespaces.py — extend via
    * the `prefixes` parameter). */
  val defaultPrefixes: Map[String, String] = Map(
    "OMIM" -> "https://omim.org/entry/",
    "OMIMPS" -> "https://www.omim.org/phenotypicSeries/PS",
    "MONDO" -> "http://purl.obolibrary.org/obo/mondo#",
    "MONDONS" -> "http://purl.obolibrary.org/obo/mondo#",
    "RO" -> "http://purl.obolibrary.org/obo/RO_",
    "SO" -> "http://purl.obolibrary.org/obo/SO_",
    "IAO" -> "http://purl.obolibrary.org/obo/IAO_",
    "OMO" -> "http://purl.obolibrary.org/obo/OMO_",
    "NCBITaxon" -> "http://purl.obolibrary.org/obo/NCBITaxon_",
    "NCBIGENE" -> "https://www.ncbi.nlm.nih.gov/gene/",
    "HGNC" -> "http://identifiers.org/hgnc/",
    "HGNC_symbol" -> "https://bioregistry.io/hgnc.symbol:",
    "CHR" -> "http://purl.obolibrary.org/obo/CHR_",
    "PMID" -> "https://pubmed.ncbi.nlm.nih.gov/",
    "UMLS" -> "http://linkedlifedata.com/resource/umls/id/",
    "ORPHANET" -> "http://www.orpha.net/ORDO/Orphanet_",
    "ORCID" -> "https://orcid.org/",
    "biolink" -> "https://w3id.org/biolink/vocab/",
    "oboInOwl" -> "http://www.geneontology.org/formats/oboInOwl#",
    "skos" -> "http://www.w3.org/2004/02/skos/core#",
    "rdf" -> "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs" -> "http://www.w3.org/2000/01/rdf-schema#",
    "owl" -> "http://www.w3.org/2002/07/owl#")

  /** One canonical N-Triples-style line per edge row. Literals are escaped
    * and quoted; bnode ids (`_:`) and already-`<>`-wrapped IRIs pass
    * through; CURIEs stay compact (Turtle prefix form). Output equivalence
    * with the reference is defined as TRIPLE-SET equality (SURVEY.md §7.4),
    * which sorted canonical lines give us. */
  def toTurtleLines(triples: Dataset[Triple]): DataFrame = {
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")
    val term = (c: org.apache.spark.sql.Column, isLit: org.apache.spark.sql.Column) =>
      when(isLit, concat(lit("\""), esc(c), lit("\"")))
        .otherwise(c)
    triples.toDF().select(
      concat(
        col("s"), lit(" "), col("p"), lit(" "),
        term(col("o"), col("oIsLiteral")), lit(" .")).as("line"))
  }

  /** Write the graph as Turtle: @prefix header + sorted triple lines.
    * `singleFile=true` coalesces to one part (fine ≤10^7 triples; leave
    * false at scale — SURVEY.md §7.4). */
  def writeTurtle(spark: SparkSession, triples: Dataset[Triple], path: String,
                  prefixes: Map[String, String] = defaultPrefixes,
                  singleFile: Boolean = true): Unit = {
    import spark.implicits._
    // Explicit (section, line) sort key: a plain union's branch order is NOT
    // preserved through coalesce, so the header gets section 0.
    val header = prefixes.toSeq.sorted
      .map { case (p, u) => (0, s"@prefix $p: <$u> .") }.toDF("sec", "line")
    val body = toTurtleLines(triples).select(lit(1).as("sec"), col("line"))
    val out = header.unionByName(body).orderBy("sec", "line").select("line")
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }

  /** Ordered TSV sink with optional extra header rows (ROBOT templates
    * prepend a sub-header row — ref: mondo_omim_genes_robot_tsv.py:19-41,
    * main.py:512-519). Sort before write = W3; single file for artifact
    * parity, plain distributed write for scale. */
  def writeOrderedTsv(df: DataFrame, path: String, sortCols: Seq[String],
                      extraHeaderRows: Seq[Seq[String]] = Nil,
                      preHeaderLines: Seq[String] = Nil,
                      singleFile: Boolean = true): Unit = {
    val spark = df.sparkSession
    val cols = df.columns
    import spark.implicits._
    // One distributed range sort over (__sec, __idx, sortCols...): header
    // rows carry sec 0 + their declared index (sortCols null there); body
    // rows carry sec 1 and sort by the requested columns. No global
    // row_number window (which would funnel everything through one task).
    // preHeaderLines land before the column header (SSSOM front-matter).
    var header = (preHeaderLines ++ (cols.toSeq +: extraHeaderRows).map(_.mkString("\t")))
      .zipWithIndex
      .map { case (line, i) => (0, i.toLong, line) }
      .toDF("__sec", "__idx", "__line")
    sortCols.foreach { sc =>
      header = header.withColumn(sc, lit(null).cast(df.schema(sc).dataType))
    }
    val body = df
      .select((Seq(lit(1).as("__sec"), lit(0L).as("__idx"),
        concat_ws("\t", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
          .as("__line")) ++ sortCols.map(col)): _*)
    val out = header.unionByName(body)
      .orderBy((Seq(col("__sec"), col("__idx")) ++ sortCols.map(col)): _*)
      .select("__line")
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }
}
