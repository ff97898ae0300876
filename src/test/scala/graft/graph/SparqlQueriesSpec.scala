package graft.graph

import graft.SparkSpec
import graft.model.Triple
import graft.graph.TripleGen._

/** SPARQL-equivalent DataFrame queries over a small synthetic graph that
  * exercises every pattern edge. */
class SparqlQueriesSpec extends SparkSpec {
  import spark.implicits._

  // disease OMIM:1 --RO:0004003--> gene OMIM:2 (restriction), labels,
  // categories, MONDO + HGNC exactMatches
  private lazy val base = {
    val (_, restr) = restriction(HasMaterialBasisIn, "OMIM:2", "OMIM:1")
    (Seq(
      Triple.uri("OMIM:1", RdfType, OwlClass),
      Triple.uri("OMIM:2", RdfType, OwlClass),
      Triple.lit("OMIM:1", RdfsLabel, "disease one"),
      Triple.lit("OMIM:2", RdfsLabel, "gene two"),
      Triple.uri("OMIM:1", BiolinkCategory, BiolinkDisease),
      Triple.uri("OMIM:2", BiolinkCategory, BiolinkGene),
      Triple.uri("MONDO:0000001", SkosExactMatch, "OMIM:1"),
      Triple.uri("OMIM:1", SkosExactMatch, "MONDO:0000001"),
      Triple.uri("OMIM:2", SkosExactMatch, "HGNC:42")) ++ restr).toDF()
  }

  test("addFlippedMondoMappings inserts the reverse edge once") {
    val t = SparqlQueries.addFlippedMondoMappings(base).as[Triple].collect().toSet
    assert(t.contains(Triple.uri("OMIM:1", SkosExactMatch, "MONDO:0000001")))
    assert(t.count(x => x.s == "OMIM:1" && x.o == "MONDO:0000001") == 1)
  }

  test("hgncLinks adds HGNC class + parallel restriction") {
    val t = SparqlQueries.hgncLinks(base).as[Triple].collect().toSet
    assert(t.contains(Triple.uri("HGNC:42", RdfType, OwlClass)))
    // new restriction on OMIM:1 pointing at HGNC:42
    assert(t.exists(x => x.p == "owl:someValuesFrom" && x.o == "HGNC:42"))
    val newB = t.find(x => x.p == "owl:someValuesFrom" && x.o == "HGNC:42").get.s
    assert(t.contains(Triple.uri("OMIM:1", RdfsSubClassOf, newB)))
  }

  test("diseaseGeneRelationships report shape and direction bind") {
    val rows = SparqlQueries.diseaseGeneRelationships(base).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("SubId") == "OMIM:1")
    assert(r.getAs[String]("ObjId") == "OMIM:2")
    assert(r.getAs[String]("Pred") == "RO:0004003")
    assert(r.getAs[String]("PredDirection") == "Disease2Gene")
    assert(r.getAs[String]("SubBiolink") == "Disease")
    assert(r.getAs[String]("ObjBiolink") == "Gene")
  }

  test("mondoOmimGenes distinct 4-tuple") {
    val rows = SparqlQueries.mondoOmimGenes(base)
      .as[(String, String, String, String)].collect().toSet
    assert(rows == Set(("MONDO:0000001", "HGNC:42", "OMIM:1", "OMIM:2")))
  }

  test("pmidMentions filters IAO:0000142 edges") {
    val withPmid = base.as[Triple].collect() :+
      Triple.uri("OMIM:1", Mentions, "PMID:123")
    val rows = SparqlQueries.pmidMentions(withPmid.toSeq.toDF())
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("OMIM:1", "PMID:123")))
  }
}
