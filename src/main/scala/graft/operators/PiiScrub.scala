package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the standard corpus-hygiene pass (C4 and successors
  * scrub emails/phones/IPs before training): a fixed cascade of
  * `regexp_replace` rules, each with a per-document match count, all
  * map-only and codegen'd — no shuffle, no UDF, linear in corpus bytes
  * at any scale.
  *
  * Patterns are RE2-safe (no lookahead, no backreferences, ASCII
  * classes) so Java regex and DuckDB/RE2 match identically and the
  * whole pass is oracle-portable. The cascade order matters and is part
  * of the contract: EMAIL first (an address containing digits must not
  * be half-eaten by the phone rule), then SSN (3-2-4 digits would
  * otherwise feed the phone rule), then IPv4 (dotted triples), then
  * phone. Counts are taken on each stage's INPUT text, so a span
  * consumed by an earlier rule is never double-counted. */
object PiiScrub {

  /** (class, RE2-safe pattern, replacement token), cascade order. */
  val Rules: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    // \b anchors: without them any 10 digits inside a longer run (a card
    // number, a wide id) would be redacted mid-number
    ("phone", "\\(?\\b[0-9]{3}\\)?[ .-]?[0-9]{3}[.-]?[0-9]{4}\\b", "<PHONE>"))

  /** Adds `n_<class>` count columns (cascade semantics) and the fully
    * redacted `scrubbed` text. */
  def scrub(df: DataFrame, text: Column): DataFrame = {
    val (finalText, counts) =
      Rules.foldLeft((text, Seq.empty[(String, Column)])) {
        case ((t, cs), (name, pat, token)) =>
          val n = size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")
          (regexp_replace(t, pat, token), cs :+ (name -> n))
      }
    counts.foldLeft(df) { case (d, (name, n)) => d.withColumn(s"n_$name", n) }
      .withColumn("scrubbed", finalText)
  }
}
