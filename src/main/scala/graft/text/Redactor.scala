package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for a training corpus: replace e-mail addresses, IPv4
  * addresses, and international phone numbers with typed placeholder
  * tokens, and count what was removed (the per-document audit signal a
  * privacy review samples against).
  *
  * Patterns are deliberately lookaround-free ASCII regexes so Java regex
  * (Spark) and RE2 (the DuckDB oracle) match identically; each is a single
  * codegen'd `regexp_replace`/`regexp_count` — no UDFs, map-only, no
  * shuffle. Replacement order matters and is fixed: e-mails first (their
  * local/domain parts contain digit-dot runs an IP pattern could clip),
  * then IPs, then phones; placeholders contain no digits, so later passes
  * never match inside earlier replacements.
  *
  * This is a recall-oriented scrub of the three unambiguous PII shapes, not
  * NER: names/addresses need a model pass, which belongs behind the same
  * column contract (`text -> redacted`) when one exists.
  */
object Redactor {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  /** International form only (`+` then 7-15 digits): domestic formats are
    * too ambiguous for a regex-only pass (they collide with ids, years,
    * quantities) — precision over recall for the unanchored shape.
    */
  val PhonePattern = "\\+[0-9]{7,15}"

  /** Audit counts measure what [[redact]] ACTUALLY replaces: each count
    * runs over the text as it exists when that pass runs (emails on raw
    * text, IPs after the e-mail pass, phones after both). Counting every
    * pattern on the raw text disagrees with the sequential scrub whenever
    * shapes overlap — 'user@1.2.3.4.com' is ONE e-mail replacement, but a
    * raw-text count would also report an IP redaction that never happened.
    */
  def emailCount(c: Column): Column = regexp_count(c, lit(EmailPattern)).cast("long")
  def ipCount(c: Column): Column =
    regexp_count(afterEmails(c), lit(Ipv4Pattern)).cast("long")
  def phoneCount(c: Column): Column =
    regexp_count(afterIps(afterEmails(c)), lit(PhonePattern)).cast("long")

  private def afterEmails(c: Column): Column = regexp_replace(c, EmailPattern, "<EMAIL>")
  private def afterIps(c: Column): Column = regexp_replace(c, Ipv4Pattern, "<IP>")

  /** Text with all three PII shapes replaced by placeholder tokens. */
  def redact(c: Column): Column =
    regexp_replace(afterIps(afterEmails(c)), PhonePattern, "<PHONE>")
}
