package graft.text

import java.util.regex.Pattern

/** MIM-id repair and morbidmap phenotype-field parsing — pure functions
  * (ref: omim2obo/parsers/omim_txt_parser.py:281-308, 441-476). */
object MimFields {

  private val braced = Pattern.compile("\\{(\\d{6})\\}")
  private val trailingComma = Pattern.compile("(\\d{6}),")

  /** Ref: parse_omim_id — 6-digit pass-through; else extract from
    * "{dddddd}..." or "dddddd,..." prefixes (Python re.match = anchored at
    * start, not end); else None. */
  def parseOmimId(omimId: String): Option[String] = {
    if (omimId.length == 6 && omimId.forall(_.isDigit)) return Some(omimId)
    val m1 = braced.matcher(omimId)
    if (m1.lookingAt()) return Some(m1.group(1))
    val m2 = trailingComma.matcher(omimId)
    if (m2.lookingAt()) return Some(m2.group(1))
    None
  }

  /** Parsed morbidmap phenotype field. Empty strings (not nulls) mirror the
    * reference's '' defaults. */
  final case class PhenotypeField(label: String, phenotypeMim: String, mappingKey: String)

  private val withMim = Pattern.compile("(.*)(\\d{6})\\s*(?:\\((\\d+)\\))?")
  private val noMim = Pattern.compile("(.*)\\s+\\((\\d+)\\)")

  /** Ref: parse_morbid_map regexes (omim_txt_parser.py:449-476). Greedy
    * `(.*)` makes the MIM group capture the LAST 6-digit run; label is the
    * raw prefix (whitespace and markers preserved); a missing `(k)` group
    * yields '' (Python None → our ''). Falls back to the no-MIM form
    * "label (k)"; unparseable fields yield all-empty (warn-and-continue
    * semantics → QC counter at the caller). */
  def parsePhenotypeField(s: String): PhenotypeField = {
    val m1 = withMim.matcher(s)
    if (m1.lookingAt()) {
      return PhenotypeField(
        m1.group(1),
        Option(m1.group(2)).getOrElse(""),
        Option(m1.group(3)).getOrElse(""))
    }
    val m2 = noMim.matcher(s)
    if (m2.lookingAt())
      PhenotypeField(m2.group(1), "", Option(m2.group(2)).getOrElse(""))
    else
      PhenotypeField("", "", "")
  }

  /** Ref: MORBIDMAP_PHENOTYPE_MAPPING_KEY_MEANINGS (omim_txt_parser.py:
    * 33-41). Key '' (or unknown) → '' (the reference would KeyError; rows
    * without keys never reach the lookup there). */
  val mappingKeyMeanings: Map[String, String] = Map(
    "1" -> ("The disorder is placed on the map based on its association with a gene, " +
      "but the underlying defect is not known."),
    "2" -> ("The disorder has been placed on the map by linkage or other statistical " +
      "method; no mutation has been found."),
    "3" -> "The molecular basis for the disorder is known; a mutation has been found in the gene.",
    "4" -> ("A contiguous gene deletion or duplication syndrome, multiple genes are " +
      "deleted or duplicated causing the phenotype."))

  /** Ref: MORBIDMAP_PHENOTYPE_MAPPING_KEY_PREDICATES (omim_txt_parser.py:
    * 47-64); key '1' has no predicate (association with unknown defect). */
  val mappingKeyPredicates: Map[String, String] = Map(
    "2" -> "RO:0003303", // causes condition
    "3" -> "RO:0004013", // is causal germline mutation in
    "4" -> "RO:0003304") // contributes to condition

  /** Ref: p2g_is_definitive (omim_txt_parser.py:657-670): a definitive
    * association's label does not start with '[' (non-disease), '{'
    * (susceptibility), or '?' (provisional). NOTE: no trim — the reference
    * tests the raw label (the susceptibility check in the cascade DOES
    * strip first; see OmimPipeline). */
  def isDefinitive(phenotypeLabel: String): Boolean =
    !(phenotypeLabel.startsWith("[") || phenotypeLabel.startsWith("{") ||
      phenotypeLabel.startsWith("?"))
}
