package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's own parser tests (tests/omim2obo/parsers/
  * test_omim_txt_parser.py:5-22) plus branch coverage for the morbidmap
  * phenotype-field regexes (omim_txt_parser.py:449-476). */
class MimFieldsSpec extends AnyFunSuite {

  test("parseOmimId: reference's four cases") {
    assert(MimFields.parseOmimId("100100").contains("100100"))
    assert(MimFields.parseOmimId("{100100}").contains("100100"))
    assert(MimFields.parseOmimId("100100,").contains("100100"))
    assert(MimFields.parseOmimId("polydactyly").isEmpty)
  }

  test("parseOmimId: anchored-at-start, not end (Python re.match)") {
    assert(MimFields.parseOmimId("{123456} trailing").contains("123456"))
    assert(MimFields.parseOmimId("123456, more").contains("123456"))
    assert(MimFields.parseOmimId("x123456").isEmpty)
    assert(MimFields.parseOmimId("12345").isEmpty)
  }

  test("parsePhenotypeField: label + mim + key") {
    val r = MimFields.parsePhenotypeField("Marfan syndrome, type II, 154700 (3)")
    assert(r.label == "Marfan syndrome, type II, ")
    assert(r.phenotypeMim == "154700")
    assert(r.mappingKey == "3")
  }

  test("parsePhenotypeField: greedy mim group takes the LAST 6-digit run") {
    val r = MimFields.parsePhenotypeField("Weird 111111 label, 222222 (2)")
    assert(r.phenotypeMim == "222222")
    assert(r.label == "Weird 111111 label, ")
  }

  test("parsePhenotypeField: mim without key") {
    val r = MimFields.parsePhenotypeField("Some disease, 154700")
    assert(r.phenotypeMim == "154700" && r.mappingKey == "")
  }

  test("parsePhenotypeField: no mim, key only") {
    val r = MimFields.parsePhenotypeField("Isolated growth anomaly (3)")
    assert(r.label == "Isolated growth anomaly")
    assert(r.phenotypeMim == "" && r.mappingKey == "3")
  }

  test("parsePhenotypeField: unparseable -> all empty") {
    val r = MimFields.parsePhenotypeField("just a label")
    assert(r == MimFields.PhenotypeField("", "", ""))
  }

  test("parsePhenotypeField: susceptibility/bracket markers preserved in label") {
    val r = MimFields.parsePhenotypeField("{Asthma, susceptibility to}, 600807 (3)")
    assert(r.label.startsWith("{"))
    assert(!MimFields.isDefinitive(r.label))
    assert(MimFields.isDefinitive("Plain disease, "))
  }
}
