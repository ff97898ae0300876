package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.model.Triple

/** Full end-to-end build over the synthetic fixtures: every source feeds
  * one triples DF; artifacts written and spot-checked. */
class BuildGraphSpec extends SparkSpec {

  private val d = "src/test/resources/omim"
  private lazy val out = BuildGraph.build(spark, BuildGraph.Inputs(
    mimTitlesPath = s"$d/mimTitles.txt",
    mim2genePath = s"$d/mim2gene.txt",
    morbidmapPath = s"$d/morbidmap.txt",
    phenotypicSeriesPath = s"$d/phenotypicSeries.txt",
    genemap2Path = s"$d/genemap2.txt",
    hgncPath = s"$d/hgnc_complete_set.txt",
    exclusionsPath = s"$d/exclusions-disease-gene.tsv",
    protectedPath = s"$d/protected-disease-gene.tsv",
    capitalizationsPath = s"$d/known_capitalizations.tsv",
    sssomPath = s"$d/mondo_exactmatch_omim.sssom.tsv",
    mappingsPath = s"$d/mappings.tsv",
    pubmedRefsPath = s"$d/pubmed-refs.tsv"), versionDate = "2026-08-12")

  test("build assembles a coherent graph") {
    val t = out.triples.collect().toSet
    // header with injected version date
    assert(t.exists(x => x.p == "owl:versionInfo" && x.o == "2026-08-12"))
    // entity + cascade + mim2gene + hgnc + ps + links all contributed
    assert(t.contains(Triple.uri("OMIM:100100", "rdf:type", "owl:Class")))
    assert(t.exists(x => x.p == "owl:onProperty" && x.o == "RO:0004003"))
    assert(t.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "NCBIGENE:218")))
    assert(t.contains(Triple.uri("OMIM:614041", "skos:exactMatch", "HGNC:4132")))
    assert(t.contains(Triple.uri("OMIM:100700", "rdfs:subClassOf", "OMIMPS:100700")))
    assert(t.exists(x => x.p == "IAO:0000142" && x.o == "PMID:1852104"))
    // SPARQL updates ran: flipped mondo mapping present both directions
    assert(t.contains(Triple.uri("OMIM:182280", "skos:exactMatch", "MONDO:0100537")))
    // protected augmentation (J9/J10): the 300000/100001 assoc absent from
    // morbidmap.txt is synthesized into the table and rides the cascade's
    // protected branch — its evidence is the map-key-3 meaning, and the
    // J5 leftover path (fixed 'protected association' string) never fires
    assert(t.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "HGNC:4100")))
    assert(t.exists(x => x.p == "biolink:has_evidence" &&
      x.o == "Evidence: (3) The molecular basis for the disorder is known; a mutation has been found in the gene."))
    assert(!t.exists(_.o == "Evidence: (3) disease-defining (protected association)"))
    // hgnc_links: parallel RO:0004003 restriction targeting an HGNC class
    assert(t.contains(Triple.uri("HGNC:4132", "rdf:type", "owl:Class")))
    assert(t.exists(x => x.p == "owl:someValuesFrom" && x.o.startsWith("HGNC:")))
    // no duplicate triples after the update-stage distinct
    assert(out.triples.count() == out.triples.distinct().count())
  }

  test("QC reports are consistent with the graph") {
    val qc = out.diseaseGeneQc.collect()
    assert(qc.nonEmpty)
    assert(qc.forall(r => Set("Disease2Gene", "Gene2Disease")
      .contains(r.getAs[String]("PredDirection"))))
    val genes = out.mondoOmimGenes.collect()
    // protected mondo mapping 182280 -> MONDO:0100537 with HGNC:4132 via RO:0004003
    assert(genes.exists(r => r.getAs[String]("mondo_id") == "MONDO:0100537" &&
      r.getAs[String]("hgnc_id") == "HGNC:4132"))
    assert(out.reviewCases.count() > 0)
    assert(out.susceptibilityRows.count() == 2)
  }

  test("augmented tables expose synthesized protected rows (J9/J10)") {
    import org.apache.spark.sql.functions.col
    val synth = out.morbidmapAugmented.filter(col("is_added_protection")).collect()
    assert(synth.length == 1)
    assert(synth.head.getAs[String]("p_mim") == "300000" &&
      synth.head.getAs[String]("gene_mim") == "100001" &&
      synth.head.getAs[String]("p_label") == "Ghost disease, ")
    // review-visible: the self-ref detection input is the augmented table
    assert(out.morbidmapAugmented.filter(col("p_mim") === "300000").count() == 1)
    // protected gene 614041 (GG1) is absent from mim2gene.txt -> one
    // synthesized 'gene' row; 100001/GA1 is present -> skipped
    val m2gSynth = out.mim2geneAugmented.filter(col("is_added_protection")).collect()
    assert(m2gSynth.map(r => (r.getAs[String]("mim"),
      r.getAs[String]("entry_type"), r.getAs[String]("hgnc_symbol"))).toSeq ==
      Seq(("614041", "gene", "GG1")))
  }

  test("writeArtifacts produces the eight release files") {
    val dir = Files.createTempDirectory("build").toString
    BuildGraph.writeArtifacts(spark, out, dir)
    val names = Seq("omim.ttl", "review.tsv",
      "mondo-omim-susceptibility-subset.robot.tsv",
      "mondo-omim-genes.robot.tsv", "disease-gene-relationships-qc.tsv",
      "omim.sssom.tsv", "morbidmap-protected-added.tsv",
      "mim2gene-protected-added.tsv")
    names.foreach { n =>
      val part = Files.list(Paths.get(s"$dir/$n")).iterator().asScala
        .find(p => p.toString.contains("part-") && !p.toString.endsWith(".crc"))
      assert(part.isDefined, s"$n missing")
      assert(Files.readAllLines(part.get).size() > 0, s"$n empty")
    }
    val ttl = Files.list(Paths.get(s"$dir/omim.ttl")).iterator().asScala
      .find(p => p.toString.contains("part-") && !p.toString.endsWith(".crc")).get
    val lines = Files.readAllLines(ttl).asScala
    assert(lines.head.startsWith("@prefix"))
    assert(lines.exists(_.startsWith("OMIM:100100 rdf:type owl:Class .")))
    // S6 acceptance: every CURIE prefix appearing in the body is bound
    // by an @prefix header line (no unbound prefix in omim.ttl)
    val bound = lines.takeWhile(_.startsWith("@prefix "))
      .map(_.stripPrefix("@prefix ").takeWhile(_ != ':')).toSet
    val curiePfx = "^([A-Za-z][A-Za-z0-9_.-]*):".r
    val usedInBody = lines.dropWhile(_.startsWith("@prefix "))
      .flatMap(_.split(" ").take(3)) // s p o terms; literals start with '"'
      .filter(t => !t.startsWith("\"") && !t.startsWith("_:") && !t.startsWith("<"))
      .flatMap(t => curiePfx.findFirstMatchIn(t).map(_.group(1))).toSet
    assert((usedInBody -- bound).isEmpty,
      s"unbound prefixes in omim.ttl: ${(usedInBody -- bound).mkString(",")}")
    val sssom = Files.list(Paths.get(s"$dir/omim.sssom.tsv")).iterator().asScala
      .find(p => p.toString.contains("part-") && !p.toString.endsWith(".crc")).get
    val sl = Files.readAllLines(sssom).asScala
    assert(sl.head.startsWith("# curie_map:"))
    assert(sl.contains("subject_id\tpredicate_id\tobject_id\tmapping_justification"))
  }
}
