package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.{CommentFramedTsv, CuratorTables, Sssom}
import graft.model.Triple

/** End-to-end over the synthetic fixtures (src/test/resources/omim,
  * FIXTURES.md §1-2): every cascade branch, every review class, HGNC
  * conflict-merge, SSSOM orientation handling. */
class OmimPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "src/test/resources/omim"

  private lazy val titlesRaw = CommentFramedTsv.read(spark, s"$dir/mimTitles.txt",
    Some(Seq("prefix", "mim", "pref_titles", "alt_titles", "inc_titles")))
  private lazy val titles = OmimPipeline.parseMimTitles(titlesRaw).cache()
  private lazy val caps = CuratorTables.knownCapitalizations(spark, s"$dir/known_capitalizations.tsv")
  private lazy val morbidRaw = CommentFramedTsv.read(spark, s"$dir/morbidmap.txt",
    Some(Seq("phenotype", "gene_symbols", "gene_mim", "cyto")))
  private lazy val morbid = OmimPipeline.parseMorbidMap(morbidRaw).cache()
  private lazy val exclusions = CuratorTables.exclusions(spark, s"$dir/exclusions-disease-gene.tsv")
  private lazy val protectd = CuratorTables.protected_(spark, s"$dir/protected-disease-gene.tsv")
  private lazy val assocs = morbid.filter($"p_mim" =!= "")
  private lazy val tagged = OmimPipeline.tagAssociations(assocs, exclusions, protectd).cache()

  test("parseMimTitles: counts, type decode, replacement lists") {
    val rows = titles.collect()
    assert(rows.length == 17) // all data rows carry known prefixes
    val byMim = rows.map(r => r.getAs[String]("mim") -> r).toMap
    assert(byMim("100001").getAs[String]("omim_type") == "GENE")
    assert(byMim("100300").getAs[String]("omim_type") == "SUSPECTED")
    assert(byMim("100400").getAs[scala.collection.Seq[String]]("replaced_by") == Seq("100100"))
    assert(byMim("100500").getAs[scala.collection.Seq[String]]("replaced_by") == Seq("100100", "100200"))
    assert(byMim("100600").getAs[scala.collection.Seq[String]]("replaced_by").isEmpty)
    // the reference's own invariant: 162820 -> [147060, 150550, 252270]
    // (tests/omim2obo/parsers/test_omim_txt_parser.py:37-39)
    assert(byMim("162820").getAs[scala.collection.Seq[String]]("replaced_by") ==
      Seq("147060", "150550", "252270"))
  }

  test("entityTriples: golden asserts per branch") {
    val t = OmimPipeline.entityTriples(titles, caps).collect().toSet
    // class decl for every MIM
    assert(t.contains(Triple.uri("OMIM:100001", "rdf:type", "owl:Class")))
    // deprecation + single replacement -> IAO:0100001; multi -> consider
    assert(t.contains(Triple.lit("OMIM:100400", "owl:deprecated", "true")))
    assert(t.contains(Triple.uri("OMIM:100400", "IAO:0100001", "OMIM:100100")))
    assert(t.contains(Triple.uri("OMIM:100500", "oboInOwl:consider", "OMIM:100100")))
    assert(t.contains(Triple.uri("OMIM:100500", "oboInOwl:consider", "OMIM:100200")))
    // replaced rows emit NOTHING beyond class+deprecation+replacement
    assert(!t.exists(x => x.s == "OMIM:100400" && x.p == "rdfs:label"))
    // removed (no replacement) still gets label etc.
    assert(t.exists(x => x.s == "OMIM:100600" && x.p == "rdfs:label"))
    // gene: label = first symbol, SO:0000704, biolink Gene
    assert(t.contains(Triple.lit("OMIM:100001", "rdfs:label", "GA1")))
    assert(t.contains(Triple.uri("OMIM:100001", "rdfs:subClassOf", "SO:0000704")))
    assert(t.contains(Triple.uri("OMIM:100001", "biolink:category", "biolink:Gene")))
    // phenotype: label = cleaned title (roman II -> 2, Marfan capitalization)
    assert(t.contains(Triple.lit("OMIM:100100", "rdfs:label", "Marfan syndrome, type 2")))
    assert(t.contains(Triple.uri("OMIM:100100", "biolink:category", "biolink:Disease")))
    // suspected -> excludeTrait; percent -> Disease
    assert(t.contains(Triple.uri("OMIM:100300", "MONDO:exclusionReason", "MONDO:excludeTrait")))
    assert(t.contains(Triple.uri("OMIM:100200", "biolink:category", "biolink:Disease")))
    // former alt title -> related synonym with deprecated axiom
    assert(t.contains(Triple.lit("OMIM:100100", "oboInOwl:hasRelatedSynonym", "Marfan disease")))
    // included titles -> comment + omim_included
    assert(t.exists(x => x.s == "OMIM:100100" && x.p == "rdfs:comment"))
    assert(t.contains(Triple.lit("OMIM:100100", "MONDONS:omim_included", "stiff skin syndrome")))
    // abbreviation synonym axiom rows exist (synonym-type annotation)
    assert(t.exists(x => x.p == "oboInOwl:hasSynonymType" && x.o == "OMO:0003000"))
  }

  test("parseMorbidMap: regex routing incl. no-mim and marker rows") {
    val rows = morbid.collect()
    assert(rows.length == 14)
    val noMim = rows.filter(_.getAs[String]("p_mim") == "")
    assert(noMim.map(_.getAs[String]("p_label")).toSet ==
      Set("Marfan-associated anomaly", "Isolated growth anomaly"))
    val marfan = rows.find(_.getAs[String]("p_label").startsWith("Marfan syndrome")).get
    assert(marfan.getAs[String]("p_mim") == "100100" && marfan.getAs[String]("map_key") == "3")
    assert(marfan.getAs[scala.collection.Seq[String]]("gene_symbols") == Seq("GA1", "APG"))
  }

  test("cascade: every association lands in exactly one branch") {
    val n = assocs.count()
    val branchCounts = tagged.groupBy("branch").count().as[(String, Long)].collect().toMap
    assert(branchCounts.values.sum == n)
    // expected branch routing on the fixture
    assert(branchCounts(OmimPipeline.BranchProtected) == 1)   // 182280/614041
    assert(branchCounts(OmimPipeline.BranchSkipNoMimOrKey1) == 1) // key-1 row
    // non-causal: key2, key4, excluded-key3 (100700 x2 incl. excluded key4? see below)
    assert(branchCounts(OmimPipeline.BranchCausal) == 5)
    // {susceptibility} + ?provisional + multi-assoc rows -> skipped
    assert(branchCounts(OmimPipeline.BranchSkipNonDefinitive) >= 2)
  }

  test("cascade triples: causal rows emit both directions with evidence axioms") {
    val t = OmimPipeline.cascadeTriples(tagged, protectd).collect()
    val tSet = t.toSet
    // protected (in morbidmap): HGNC exactMatch for gene 614041
    assert(tSet.contains(Triple.uri("OMIM:614041", "skos:exactMatch", "HGNC:4132")))
    // leftover protected (not in morbidmap): 300000/100001 + HGNC:4100
    assert(tSet.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "HGNC:4100")))
    // protected MONDO mappings
    assert(tSet.contains(Triple.uri("OMIM:182280", "skos:exactMatch", "MONDO:0100537")))
    assert(tSet.contains(Triple.uri("OMIM:300000", "skos:exactMatch", "MONDO:0100999")))
    // causal 100100: restriction rows both directions exist
    val restr = t.filter(x => x.p == "owl:someValuesFrom")
    assert(restr.exists(_.o == "OMIM:100100") && restr.exists(_.o == "OMIM:100001"))
    // evidence axiom literals present
    assert(t.exists(x => x.p == "biolink:has_evidence" &&
      x.o.startsWith("Evidence: (3)") && x.oIsLiteral))
    // excluded phenotype 100700 -> RO:0003302 with curator orcid on axiom
    assert(t.exists(x => x.p == "owl:onProperty" && x.o == "RO:0003302"))
    assert(t.exists(x => x.p == "oboInOwl:source" &&
      x.o == "ORCID:0000-0001-2345-6789"))
  }

  test("susceptibility rows join SSSOM in either orientation") {
    val sssom = Sssom.readOmimToMondo(spark, s"$dir/mondo_exactmatch_omim.sssom.tsv")
    val sus = OmimPipeline.susceptibilityRows(assocs, sssom)
      .as[(String, String)].collect().toSet
    // phenotype 100200 has the {..} label; both MONDO ids, both orientations
    assert(sus == Set(("MONDO:0007948", "OMIM:100200"), ("MONDO:0007949", "OMIM:100200")))
  }

  test("review cases: all five classes fire on the fixture") {
    val types = titles.select($"mim", $"omim_type")
    val rc = OmimPipeline.reviewCases(tagged, morbid, types)
      .as[(Int, String, String)].collect()
    val byClass = rc.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byClass.keySet == Set(1, 2, 3, 4, 5))
    assert(byClass(2) == 2) // self-ref head + detail row for 100100
    val selfRefs = rc.filter(_._1 == 2).map(_._3)
    assert(selfRefs.exists(_.contains("(Gene: 100100)")), s"got: ${selfRefs.toSeq}")
  }

  test("mim2gene: gene rows exactMatch, phenotype rows restriction") {
    val raw = CommentFramedTsv.read(spark, s"$dir/mim2gene.txt",
      Some(Seq("mim", "entry_type", "entrez_id", "hgnc_symbol", "ensembl_id")))
    val t = OmimPipeline.mim2geneTriples(raw).collect().toSet
    assert(t.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "NCBIGENE:218")))
    assert(t.contains(Triple.uri("OMIM:100002", "skos:exactMatch", "NCBIGENE:219")))
    // phenotype rows (100100 -> 220) become has-phenotype restrictions on the NCBI gene
    assert(t.exists(x => x.p == "owl:someValuesFrom" && x.o == "OMIM:100100"))
    assert(t.exists(x => x.p == "rdfs:subClassOf" && x.s == "NCBIGENE:220"))
    // no-entrez and moved/removed rows dropped
    assert(!t.exists(x => x.s == "OMIM:100400" || x.s == "OMIM:100300"))
  }

  test("phenotypic series: head triples + members; empty series ok") {
    val raw = CommentFramedTsv.read(spark, s"$dir/phenotypicSeries.txt",
      Some(Seq("ps_id", "a", "b")))
    val t = OmimPipeline.phenoSeriesTriples(raw).collect().toSet
    assert(t.contains(Triple.uri("OMIMPS:100700", "rdf:type", "owl:Class")))
    assert(t.contains(Triple.lit("OMIMPS:100700", "rdfs:label", "Deafness, autosomal dominant")))
    assert(t.contains(Triple.uri("OMIM:100700", "rdfs:subClassOf", "OMIMPS:100700")))
    assert(t.contains(Triple.uri("OMIM:100100", "rdfs:subClassOf", "OMIMPS:100700")))
    assert(t.contains(Triple.uri("OMIMPS:200000", "rdf:type", "owl:Class")))
  }

  test("hgnc merge drops conflicting mims, keeps agreeing and new ones") {
    val m1 = Seq(("100001", "GA1"), ("100002", "GB1")).toDF("mim", "symbol")
    val m2raw = CommentFramedTsv.read(spark, s"$dir/genemap2.txt")
    val m2 = m2raw.select($"MIM Number".as("mim"), $"Approved Gene Symbol".as("symbol"))
    val merged = OmimPipeline.hgncMapMerged(m1, m2).as[(String, String)].collect().toMap
    assert(merged == Map("100001" -> "GA1", "614041" -> "GG1")) // GB1/GB1X conflict dropped
    val symId = OmimPipeline.hgncSymbolIdMap(
      spark.read.option("sep", "\t").option("header", "true")
        .csv(s"$dir/hgnc_complete_set.txt"))
    val t = OmimPipeline.hgncTriples(merged.toSeq.toDF("mim", "symbol"), symId)
      .collect().toSet
    assert(t.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "HGNC_symbol:GA1")))
    assert(t.contains(Triple.uri("OMIM:100001", "skos:exactMatch", "HGNC:4100")))
    assert(t.contains(Triple.uri("OMIM:614041", "skos:exactMatch", "HGNC:4132")))
  }

  test("link triples explode pipe lists; cache upsert anti-joins") {
    val mappings = spark.read.option("sep", "\t").option("header", "true")
      .csv(s"$dir/mappings.tsv")
    val umls = OmimPipeline.linkTriples(mappings, "umls_ids", "skos:exactMatch", "UMLS")
      .collect().toSet
    assert(umls.contains(Triple.uri("OMIM:100100", "skos:exactMatch", "UMLS:C0024796")))
    assert(umls.contains(Triple.uri("OMIM:100100", "skos:exactMatch", "UMLS:C0333333")))
    assert(umls.size == 3)
    val cached = Seq(("100100", "old"), ("100300", "keep")).toDF("mim", "v")
    val fresh = Seq(("100100", "new"), ("100900", "new2")).toDF("mim", "v")
    val merged = OmimPipeline.cacheUpsert(cached, fresh, "mim")
      .as[(String, String)].collect().toSeq
    assert(merged == Seq(("100100", "new"), ("100300", "keep"), ("100900", "new2")))
  }

  test("duplicate curator rows never multiply associations or inflate counts") {
    // same exclusion listed twice + same protected pair twice: the
    // reference's dict loading collapses them, so must we
    val dupExcl = exclusions.unionByName(exclusions)
    val dupProt = protectd.unionByName(protectd)
    val t2 = OmimPipeline.tagAssociations(assocs, dupExcl, dupProt)
    assert(t2.count() == assocs.count())
    val t1counts = tagged.groupBy("branch").count().as[(String, Long)].collect().toMap
    val t2counts = t2.groupBy("branch").count().as[(String, Long)].collect().toMap
    assert(t2counts == t1counts)
  }

  test("equivalency cliques: mims sharing a symbol list each other") {
    val m2g = Seq(("1", "A"), ("2", "A"), ("3", "A"), ("4", "B"), ("5", ""))
      .toDF("mim", "symbol")
    val rows = OmimPipeline.equivalencyCliques(m2g)
      .as[(String, String, Seq[String], Int)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(rows("1") == (Seq("2", "3"), 2))
    assert(rows("2") == (Seq("1", "3"), 2))
    assert(rows("4") == (Seq.empty[String], 0))
    assert(!rows.contains("5")) // empty symbols dropped
  }

  test("protected augmentation synthesizes morbidmap rows for missing assocs") {
    val symbolToId = OmimPipeline.hgncSymbolIdMap(
      spark.read.option("sep", "\t").option("header", "true")
        .csv(s"$dir/hgnc_complete_set.txt"))
    val aug = OmimPipeline.augmentMorbidMap(morbid, protectd, titles, symbolToId)
    // downloaded rows pass through unflagged
    assert(aug.filter(!$"is_added_protection").count() == morbid.count())
    val synth = aug.filter($"is_added_protection").collect()
    // 300000/100001 is protected but absent from morbidmap -> synthesized
    // with the capitalized preferred title, map key 3, empty cyto
    assert(synth.length == 1)
    val r = synth.head
    assert(r.getAs[String]("p_mim") == "300000")
    assert(r.getAs[String]("gene_mim") == "100001")
    // str.capitalize label; the parse keeps the raw ', ' prefix before the
    // MIM (the reference's no-strip regex group — F4 quirk), exactly as a
    // downloaded row would
    assert(r.getAs[String]("p_label") == "Ghost disease, ")
    assert(r.getAs[String]("map_key") == "3")
    assert(r.getAs[scala.collection.Seq[String]]("gene_symbols") == Seq("GA1"))
    assert(r.getAs[String]("cyto_location") == "")
    // 182280/614041 exists as a key-3 assoc -> 3-key dup check suppresses it
    assert(!synth.exists(_.getAs[String]("p_mim") == "182280"))
    // synthesized rows route to the protected cascade branch, emptying J5
    val taggedAug = OmimPipeline.tagAssociations(
      aug.filter($"p_mim" =!= ""), exclusions, protectd)
    assert(taggedAug.filter($"branch" === OmimPipeline.BranchProtected)
      .select("p_mim").as[String].collect().toSet == Set("182280", "300000"))
  }

  test("protected augmentation synthesizes mim2gene rows for missing genes") {
    val symbolToId = OmimPipeline.hgncSymbolIdMap(
      spark.read.option("sep", "\t").option("header", "true")
        .csv(s"$dir/hgnc_complete_set.txt"))
    val raw = Seq(("100001", "gene", "218", "GA1", "ENSG1"))
      .toDF("mim", "entry_type", "entrez_id", "hgnc_symbol", "ensembl_id")
    // fixture protected genes: 614041 (HGNC:4132/GG1) absent from raw ->
    // synthesized; 100001 (HGNC:4100/GA1) present as a pair -> skipped
    val aug = OmimPipeline.augmentMim2Gene(raw, protectd, symbolToId)
    val synth = aug.filter($"is_added_protection")
      .as[(String, String, String, String, String, Boolean)].collect()
    assert(synth.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq ==
      Seq(("614041", "gene", "", "GG1", "")))
    assert(aug.filter(!$"is_added_protection").count() == 1)
  }

  test("cyto triples: one restriction per distinct gene with location") {
    val t = OmimPipeline.cytoTriples(morbid).collect()
    val svf = t.filter(_.p == "owl:someValuesFrom").map(_.o).toSet
    assert(svf.contains("CHR:9606chr15q21.1") && svf.contains("CHR:9606chr1p36"))
  }
}
