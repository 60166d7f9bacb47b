package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** PII detection and scrubbing — the redaction pass a training-data
  * pipeline runs before a crawl corpus is released or trained on: find
  * and replace email addresses, international-format phone numbers and
  * IPv4 addresses with typed placeholder tokens, and count what was hit
  * so the removal rate is auditable per source/shard.
  *
  * Everything is `functions.regexp_*` — codegen'd column expressions, no
  * UDFs, pure map-side (composes into the scan; a 100 TB scrub is one
  * pass, no shuffle). Patterns are deliberately portable between Java
  * regex (Spark) and RE2 (the DuckDB oracle): ASCII classes only, no
  * backreferences, no lookaround.
  *
  * Recall-over-precision by design: an out-of-range dotted quad like
  * 999.999.999.999 still scrubs — a false placeholder in training text is
  * cheap, a leaked address is not.
  */
object Pii {

  /** local@domain.tld — the pragmatic crawl-cleanup form. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-format number: '+' then 7-15 digits (ITU E.164 length
    * envelope). Deliberately narrow — bare national formats collide with
    * ordinary numbers in text. */
  val PhonePattern: String = "\\+\\d{7,15}\\b"

  /** Dotted quad with word boundaries. */
  val Ipv4Pattern: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)).cast("long")
  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhonePattern)).cast("long")
  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Pattern)).cast("long")

  /** Replace every match with its placeholder. Email first — once
    * scrubbed, its digit runs can no longer feed the phone/IP patterns;
    * the placeholders themselves contain nothing any pattern matches, so
    * the composition order is otherwise free.
    *
    * Runs as ONE fused byte-walk ([[graft.functions.PiiScrubKernel]]) —
    * the three-pass regex chain re-scanned and re-built the string per
    * pattern and dominated the scrub+lang-id stage at 10M docs.
    * [[scrubComposed]] is the regex chain the kernel is
    * equivalence-pinned against (and what the DuckDB oracle replays). */
  def scrub(text: Column): Column =
    Bridge.column(graft.functions.PiiScrub(Bridge.expression(text)))

  /** Built-ins-only reference form of [[scrub]] (kept for the spec and
    * the oracle's regex replay). */
  def scrubComposed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      Ipv4Pattern, "<IP>")

  /** → (doc_id, n_emails, n_phones, n_ipv4, has_pii, scrubbed). Counts
    * are STAGED to match the redaction exactly: emails count on the
    * original text, phones on the email-scrubbed text, IPs after both —
    * so each count is the number of `<…>` placeholders of that kind the
    * scrub actually emitted. (Counting everything on the original would
    * report a "phone" for a digit run inside an email's local part that
    * the email replacement consumes — an audit row for a redaction that
    * never happened.) */
  def scrubDocs(df: DataFrame, id: Column, text: Column): DataFrame = {
    val afterEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhonePattern, "<PHONE>")
    df.select(
      id.as("doc_id"),
      emailCount(text).as("n_emails"),
      phoneCount(afterEmail).as("n_phones"),
      ipv4Count(afterPhone).as("n_ipv4"),
      scrub(text).as("scrubbed"))
      .withColumn("has_pii",
        col("n_emails") + col("n_phones") + col("n_ipv4") > 0)
  }
}
