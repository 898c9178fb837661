package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training-corpus curation: redact emails, IPv4
  * addresses, SSN-shaped ids, and phone numbers from a text column and
  * report per-category match counts.
  *
  * All work is per-row `regexp_replace` / `regexp_count` — codegen'd
  * expressions, shuffle-free, linear at 100 TB. Patterns are the
  * conservative common-subset dialect (no lookbehind, no possessive
  * quantifiers) so they behave identically under Java regex and RE2-
  * style engines.
  *
  * Redaction is SEQUENTIAL — email → SSN → IPv4 → phone — so a
  * higher-precedence match is replaced by its placeholder before a
  * looser pattern (phone digits, e.g.) can claim a substring of it.
  * Counts are measured per-pattern against the ORIGINAL text and can
  * overlap across categories; they are signal columns for filtering
  * ("drop docs with >N emails"), not an audit of replacements made.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  // Two phone shapes, both with BOUNDED digit counts so dates,
  // timestamps, and long numeric ids pass through:
  //  - international: '+' then 7–15 digits, ≤2 separator chars between
  //    ("+44 20 7946 0958", "+1 (415) 555-0199");
  //  - domestic: 3 + 3-4 + 4 digit groups = 10–11 digits total
  //    ("(555) 123-4567", "020 7946 0958", "5551234567"); the \b
  //    anchors keep it from firing inside longer digit runs (a 13-digit
  //    epoch-millis never matches) and an 8-digit ISO date ("2024-01-01")
  //    can't satisfy the 3/3-4/4 group structure.
  val PhoneRe =
    "\\+[0-9]([() \\-]{0,2}[0-9]){6,14}\\b|\\(?\\b[0-9]{3}\\)?[ -]?[0-9]{3,4}[ -]?[0-9]{4}\\b"

  private val ordered = Seq(
    "email" -> EmailRe,
    "ssn" -> SsnRe,
    "ipv4" -> Ipv4Re,
    "phone" -> PhoneRe)

  /** DuckDB mirror of [[redact]]: the same nested global
    * `regexp_replace` chain in the same precedence order (the patterns
    * are common-subset Java-regex/RE2, so behavior is identical). */
  def redactSql(expr: String): String =
    ordered.foldLeft(expr) { case (e, (name, re)) =>
      s"regexp_replace($e, '$re', '[${name.toUpperCase}]', 'g')"
    }

  /** DuckDB mirror of [[counts]] (non-overlapping match counts). */
  def countSqls(expr: String): Seq[(String, String)] =
    ordered.map { case (name, re) =>
      s"n_$name" -> s"CAST(len(regexp_extract_all($expr, '$re')) AS INTEGER)"
    }

  /** The text column with every PII category replaced by `[CATEGORY]`. */
  def redact(text: Column): Column =
    ordered.foldLeft(text) { case (c, (name, re)) =>
      regexp_replace(c, re, s"[${name.toUpperCase}]")
    }

  /** Per-category counts on the raw text (filter signals). */
  def counts(text: Column): Seq[(String, Column)] =
    ordered.map { case (name, re) => s"n_$name" -> regexp_count(text, lit(re)) }

  /** df with `textCol` redacted in place plus `n_email`, `n_ssn`,
    * `n_ipv4`, `n_phone` count columns. */
  def apply(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = counts(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withCounts.withColumn(textCol, redact(col(textCol)))
  }
}
