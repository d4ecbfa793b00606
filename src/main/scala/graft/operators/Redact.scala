package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace emails / phone numbers /
  * IPv4 addresses with typed placeholder tags, plus match counters for
  * corpus-level PII audits. (No reference analogue; the scrub-before-train
  * step every published data pipeline runs.)
  *
  * All native regexp expressions (codegen'd, no UDFs), per-row only — the
  * patterns stay in the portable common subset of Java regex and RE2
  * (`\b`, `\d`, bounded repetition; no backreferences or lookaround), so
  * the DuckDB oracle runs the identical patterns.
  */
object Redact {

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipPattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** All PII categories replaced with their tags. Email first: an address
    * contains digit/dot runs the narrower patterns could nibble at.
    */
  def scrub(text: Column): Column =
    regexp_replace(afterPhones(text), ipPattern, "<IP>")

  private def afterEmails(text: Column): Column =
    regexp_replace(text, emailPattern, "<EMAIL>")
  private def afterPhones(text: Column): Column =
    regexp_replace(afterEmails(text), phonePattern, "<PHONE>")

  /** Counters run on the SAME progressively-scrubbed intermediates as
    * `scrub`, so each count is exactly the number of `<TAG>`s scrub emits
    * for that category — digit runs inside an email (555-010-1234@x.com)
    * are email hits, never phone/IP hits, and the three counts reconcile
    * with the placeholder totals in the output.
    */
  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def phoneCount(text: Column): Column =
    regexp_count(afterEmails(text), lit(phonePattern))
  def ipCount(text: Column): Column =
    regexp_count(afterPhones(text), lit(ipPattern))
}
