package graft.io

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.model.Triple

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("toTurtleLines quotes+escapes literals, passes URIs/bnodes through") {
    val ds = Seq(
      Triple.uri("OMIM:1", "rdf:type", "owl:Class"),
      Triple.lit("OMIM:1", "rdfs:label", "a \"quoted\" label\nline2"),
      Triple.uri(Triple.bnode("x"), "owl:onProperty", "RO:0004003")
    ).toDS()
    val lines = Sinks.toTurtleLines(ds).as[String].collect().toSet
    assert(lines.contains("OMIM:1 rdf:type owl:Class ."))
    assert(lines.contains("OMIM:1 rdfs:label \"a \\\"quoted\\\" label\\nline2\" ."))
    assert(lines.exists(l => l.startsWith("_:") && l.endsWith("RO:0004003 .")))
  }

  test("writeTurtle binds exactly the used prefixes, header then sorted body") {
    val dir = Files.createTempDirectory("ttl").toString
    val ds = Seq(
      Triple.uri("OMIM:2", "rdf:type", "owl:Class"),
      Triple.uri("OMIM:1", "rdf:type", "owl:Class")).toDS()
    // default map carries 200+ bindings; only the 3 used ones are emitted
    Sinks.writeTurtle(spark, ds, s"$dir/out")
    val part = Files.list(Paths.get(s"$dir/out")).iterator().asScala
      .find(p => p.toString.contains("part-") && !p.toString.endsWith(".crc")).get
    val lines = Files.readAllLines(part).asScala.toList
    assert(lines.head == "@prefix OMIM: <https://omim.org/entry/> .")
    assert(lines.take(3).forall(_.startsWith("@prefix ")))
    assert(lines.drop(3) == List("OMIM:1 rdf:type owl:Class .", "OMIM:2 rdf:type owl:Class ."))
  }

  test("writeTurtle fails loudly on a used-but-unbound prefix") {
    val dir = Files.createTempDirectory("ttl").toString
    val ds = Seq(Triple.uri("NOPE:1", "rdf:type", "owl:Class")).toDS()
    val e = intercept[IllegalArgumentException] {
      Sinks.writeTurtle(spark, ds, s"$dir/out")
    }
    assert(e.getMessage.contains("NOPE"))
  }

  test("usedPrefixes skips literals, wrapped IRIs, and bnodes") {
    val ds = Seq(
      Triple.lit("OMIM:1", "rdfs:label", "a CURIE-shaped literal FAKE:1"),
      Triple.uri(Triple.bnode("x"), "owl:onProperty", "<http://example.org/x>")
    ).toDS()
    assert(Sinks.usedPrefixes(ds) == Set("OMIM", "rdfs", "owl"))
  }

  test("usedPrefixes catches base ('':x) and digit-leading prefixes too") {
    // the dipper map's base prefix and non-letter prefixes must NOT
    // bypass the unbound-prefix gate (they'd be silently un-expandable)
    val base = Seq(Triple.uri(":x", "rdf:type", "owl:Class")).toDS()
    assert(Sinks.usedPrefixes(base) == Set("", "rdf", "owl"))
    val digit = Seq(Triple.uri("9NOPE:1", "rdf:type", "owl:Class")).toDS()
    assert(Sinks.usedPrefixes(digit).contains("9NOPE"))
    // a bare non-CURIE term is an error, not a silent skip
    val bare = Seq(Triple.uri("noColonHere", "rdf:type", "owl:Class")).toDS()
    val e = intercept[IllegalArgumentException] { Sinks.usedPrefixes(bare) }
    assert(e.getMessage.contains("CURIE"))
  }

  test("writeOrderedTsv sorts, headers, and appends sub-header rows") {
    val dir = Files.createTempDirectory("tsv").toString
    val df = Seq(("b", 2), ("a", 1)).toDF("name", "n")
    Sinks.writeOrderedTsv(df, s"$dir/out", Seq("name"),
      extraHeaderRows = Seq(Seq("ID", ">A oboInOwl:source")))
    val part = Files.list(Paths.get(s"$dir/out")).iterator().asScala
      .find(p => p.toString.contains("part-") && !p.toString.endsWith(".crc")).get
    val lines = Files.readAllLines(part).asScala.toList
    assert(lines == List("name\tn", "ID\t>A oboInOwl:source", "a\t1", "b\t2"))
  }
}
