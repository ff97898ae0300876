package graft.model

/** Core data model for the OMIM-capability engine (SURVEY.md §1).
  *
  * Stable-schema tables get case classes so the public API can be typed
  * `Dataset[T]`; internals stay `DataFrame`.
  */

/** MIM entry type, decoded from the mimTitles prefix symbol (ref:
  * omim2obo/omim_type.py:6-56; decode table omim_txt_parser.py:323-330). */
sealed abstract class OmimType(val name: String, val declared: String, val symbol: String)
object OmimType {
  case object Obsolete extends OmimType("OBSOLETE", "Caret", "^")
  case object Gene extends OmimType("GENE", "Asterisk", "*")
  case object Suspected extends OmimType("SUSPECTED", "NULL", "")
  case object Phenotype extends OmimType("PHENOTYPE", "Number Sign", "#")
  case object HeritablePhenotypicMarker
    extends OmimType("HERITABLE_PHENOTYPIC_MARKER", "Percent", "%")
  case object HasAffectedFeature extends OmimType("HAS_AFFECTED_FEATURE", "Plus", "+")

  val all: Seq[OmimType] = Seq(Obsolete, Gene, Suspected, Phenotype,
    HeritablePhenotypicMarker, HasAffectedFeature)

  /** mimTitles "Prefix" column → type name (ref: declared_to_type,
    * omim_txt_parser.py:323-330). Unknown prefixes → None (the reference
    * logs an error and keeps the row out of the titles map). */
  def fromDeclared(declared: String): Option[OmimType] =
    all.find(_.declared == declared)

  val declaredToName: Map[String, String] = all.map(t => t.declared -> t.name).toMap
}

/** One mimTitles.txt row after parsing (ref: omim_txt_parser.py:311-346). */
final case class TitleRow(
    omimType: String,   // OmimType.name
    mim: String,        // 6-digit, kept as string (ref keeps str)
    prefTitle: String,  // raw "TITLE; SYM1; SYM2" field
    altTitles: String,  // raw ';;'-pair field
    incTitles: String)  // raw ';;'-pair field

/** One mim2gene.txt row (ref: omim_txt_parser.py:404-438). */
final case class Mim2GeneRow(
    mim: String, entryType: String, entrezId: String,
    hgncSymbol: String, ensemblId: String)

/** One morbidmap.txt association row, flat (ref: omim_txt_parser.py:
  * 441-495 nests per-gene; we keep the flat relational form and group with
  * collect_list when the nested shape is needed). */
final case class MorbidRow(
    phenotypeLabel: String, phenotypeMim: String, mappingKey: String,
    geneSymbols: Seq[String], geneMim: String, cytoLocation: String)

/** One phenotypicSeries.txt membership (ref: omim_txt_parser.py:349-364). */
final case class PhenoSeriesRow(psId: String, title: String, memberMim: String)

/** One edge of the RDF graph (SURVEY.md §1.1.3): subject/predicate as
  * CURIEs, object either a CURIE/bnode ref or a literal. Blank nodes use
  * deterministic md5 ids ("_:<md5hex>", ref DeterministicBNode
  * main.py:178-186) so triple sets hash-compare stably. */
final case class Triple(s: String, p: String, o: String, oIsLiteral: Boolean)

object Triple {
  def uri(s: String, p: String, o: String): Triple = Triple(s, p, o, oIsLiteral = false)
  def lit(s: String, p: String, o: String): Triple = Triple(s, p, o, oIsLiteral = true)

  /** Deterministic blank-node id from a source ref (ref: DeterministicBNode,
    * main.py:181-186: md5 of the ref string). */
  def bnode(sourceRef: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "_:" + md.digest(sourceRef.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
}
