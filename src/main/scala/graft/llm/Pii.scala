package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for training corpora: count and mask emails,
 * IPv4 addresses, and international-format phone numbers — the standard
 * pre-training scrub (alongside dedup and quality filtering).
 *
 * Everything here is a narrow per-row projection over codegen'd regex
 * built-ins (`regexp_count` / `regexp_replace`) — no shuffle, no UDF —
 * so it scales linearly with the corpus and fuses into whatever pipeline
 * stage already reads the text.
 *
 * The patterns deliberately stay inside the regex subset Java and RE2
 * share (no lookaround, no backreferences) so a second engine can verify
 * the exact redacted output: high recall over the common formats, not a
 * full RFC parser. Order matters and is fixed: emails first (an email can
 * contain digits-and-dots that the IP pattern would mangle), then IPv4,
 * then phones (whose separator-digit runs could otherwise swallow pieces
 * of either).
 */
object Pii {

  /** user@host.tld with the usual local-part charset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: each octet 1-3 digits). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** +CC NNN NNN NNNN style international numbers ('-' or ' ' separators). */
  val PhonePattern = "\\+\\d{1,3}[ -]\\d{2,4}[ -]\\d{2,4}[ -]\\d{2,4}"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Per-row PII match counts: `n_emails`, `n_ipv4`, `n_phones`. */
  def piiStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", regexp_count(t, lit(EmailPattern)))
      .withColumn("n_ipv4", regexp_count(t, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)))
  }

  /** The redacted text as a column expression (emails → IPs → phones). */
  def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, EmailToken),
        Ipv4Pattern, IpToken),
      PhonePattern, PhoneToken)

  /** Replace PII matches with type tokens in `outCol` (defaults to
    * overwriting the text column — the redact-in-place corpus pass). */
  def redact(df: DataFrame, textCol: String = "text", outCol: String = ""): DataFrame = {
    val out = if (outCol.isEmpty) textCol else outCol
    df.withColumn(out, redacted(col(textCol)))
  }
}
