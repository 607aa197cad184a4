package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * PII redaction for web-crawl training corpora: emails, NANP-style
 * phone numbers, and IPv4 addresses are replaced with typed placeholder
 * tokens, and per-type match counts are surfaced so the pipeline can
 * audit redaction volume per source/shard (a redaction stage that can't
 * report what it removed is unauditable at 100 TB).
 *
 * Everything is a built-in `regexp_replace`/`regexp_count` column
 * expression: whole-stage codegen, no UDF, narrow (zero shuffle) — the
 * scan cost IS the operator cost at any scale. Patterns are RE2-safe
 * (no backreferences or lookaround) so the DuckDB oracle twin runs the
 * byte-identical pattern text.
 *
 * Replacement ORDER is part of the contract: email → phone → IPv4.
 * Counts are computed on the ORIGINAL text (per-type, independent),
 * which is only coherent because the three pattern families cannot
 * overlap on the same span (an email's local part may contain dots and
 * digits, but `@` never appears in a phone/IP match; phone requires
 * dashes, IPv4 dots).
 */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def redactText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** (doc_id, clean_text, n_email, n_phone, n_ip) for every input row —
    * untouched docs pass through with zero counts, so the output is a
    * drop-in replacement for the input corpus. */
  def redact(df: DataFrame, docId: Column, text: Column): DataFrame =
    df.select(
      docId.as("doc_id"),
      redactText(text).as("clean_text"),
      regexp_count(text, lit(emailRe)).cast(LongType).as("n_email"),
      regexp_count(text, lit(phoneRe)).cast(LongType).as("n_phone"),
      regexp_count(text, lit(ipv4Re)).cast(LongType).as("n_ip"))
}
