package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection/redaction for training-data pipelines: emails, phone
  * numbers, and IPv4 addresses are matched with regexes restricted to the
  * RE2∩Java common dialect (no lookbehind, no backreferences) so the same
  * pattern strings drive both the Spark expressions and the DuckDB oracle.
  *
  * Everything is `regexp_replace`/`regexp_extract_all` — pure codegen'd
  * Catalyst expressions, one scan, no shuffle: the shape that survives a
  * 100 TB corpus untouched. Counting happens on the ORIGINAL text (an
  * audit trail of what was removed); redaction applies the three rules in
  * a fixed order (email → IP → phone) whose match domains are disjoint by
  * construction (emails contain '@'; the phone pattern has no dots; the IP
  * pattern is digits-and-dots), so ordering cannot mask a later rule.
  */
object Privacy {

  /** `user@host.tld` — local part then a dotted domain with a ≥2-alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone: optional +, then 8+ digits with optional
    * single dashes between them (no dots, so IPv4 text never matches). */
  val PhoneRe = "\\+?\\d[\\d-]{6,}\\d"

  /** Dotted-quad IPv4 (loose octets — an audit regex, not a validator). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Per-document audit + redaction: (id, redacted, n_emails, n_phones,
    * n_ips). Counts are over the raw text; `redacted` has all three rule
    * classes masked. */
  def redactAudit(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(
      id.as("id"),
      redact(text).as("redacted"),
      countMatches(text, EmailRe).as("n_emails"),
      countMatches(text, PhoneRe).as("n_phones"),
      countMatches(text, Ipv4Re).as("n_ips"))
}
