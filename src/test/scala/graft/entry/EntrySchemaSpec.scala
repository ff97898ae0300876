package graft.entry

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S5 schema breadth: the explicit [[EntrySchema]] round-trips every
  * field of the 8 public fixture documents — nothing lands in
  * `_corrupt_record`, and the deep sections (clinicalSynopsis incl.
  * oldFormat, geneMap phenotypeMapList, allelicVariantList) are readable
  * by name. */
class EntrySchemaSpec extends SparkSpec {

  private lazy val raw = spark.read.option("multiLine", "true")
    .option("mode", "PERMISSIVE")
    .option("columnNameOfCorruptRecord", "_corrupt_record")
    .schema(EntrySchema.envelope)
    .json("src/test/resources/entries/entry_*.json")
    // Spark disallows querying ONLY _corrupt_record off a raw file scan
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the parsed result first
    .cache()

  test("no fixture document is corrupt under the explicit schema") {
    assert(raw.count() == 8)
    assert(raw.filter(col("_corrupt_record").isNotNull).count() == 0)
  }

  test("clinicalSynopsis breadth: paired sections and oldFormat decode") {
    val e = raw.select(explode(col("omim.entryList")).as("e"))
      .select(col("e.entry").as("entry"))
    // the ~100-field synopsis struct (158 fields incl. Exists twins)
    assert(EntrySchema.clinicalSynopsis.size >= 100)
    val cs = e.filter(col("entry.clinicalSynopsis").isNotNull)
      .select(col("entry.mimNumber").as("mim"),
        col("entry.clinicalSynopsis.inheritance").as("inh"),
        col("entry.clinicalSynopsis.inheritanceExists").as("inhE"),
        col("entry.clinicalSynopsis.oldFormat.Ears").as("ears"))
    assert(cs.count() > 0)
    assert(cs.filter(col("inh").isNotNull && col("inhE")).count() > 0)
    // the NULL-prefix fixture (10500) carries an oldFormat synopsis
    assert(cs.filter(col("ears").isNotNull).count() > 0)
  }

  test("deep lists decode: references, allelic variants, phenotype maps") {
    val e = raw.select(explode(col("omim.entryList")).as("e"))
      .select(col("e.entry").as("entry"))
    assert(e.select(explode(col("entry.referenceList")).as("r"))
      .filter(col("r.reference.pubmedID").isNotNull).count() > 0)
    assert(e.filter(col("entry.allelicVariantExists"))
      .select(explode(col("entry.allelicVariantList")).as("v"))
      .filter(col("v.allelicVariant.name").isNotNull).count() > 0)
    assert(e.select(explode(col("entry.geneMap.phenotypeMapList")).as("p"))
      .filter(col("p.phenotypeMap.phenotypeMimNumber").isNotNull).count() > 0)
  }
}
