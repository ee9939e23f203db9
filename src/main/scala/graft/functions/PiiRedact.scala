package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: regex redaction of emails,
  * phone numbers, and long digit runs (ids, SSNs, card fragments), plus
  * match counting for audit metrics. No reference analog (the reference
  * ships raw tag values straight to the sink); this is part of the
  * LLM-pipeline extension surface.
  *
  * Patterns are deliberately RE2-compatible (no backtracking constructs)
  * so the same strings run under Java regex (Spark, codegen'd
  * `regexp_replace`) and RE2 (the DuckDB oracle) with identical matches —
  * and so the scan stays linear-time on adversarial inputs at scale.
  * Redaction order matters (emails contain digit runs): email → phone →
  * number, applied innermost-first below.
  */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?\\d[\\d() -]{7,}\\d"
  val NumRe = "\\d{4,}"

  /** Replace every email/phone/digit-run with a typed placeholder. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      NumRe, "[NUM]")

  /** Per-kind match counts (pre-redaction), for audit/quality metrics. */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe)).cast("long")
  def phoneCount(c: Column): Column =
    regexp_count(regexp_replace(c, EmailRe, "[EMAIL]"), lit(PhoneRe)).cast("long")
  def digitRunCount(c: Column): Column =
    regexp_count(
      regexp_replace(regexp_replace(c, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"),
      lit(NumRe)).cast("long")
}
