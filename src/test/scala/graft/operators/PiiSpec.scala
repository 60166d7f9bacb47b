package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("scrubDocs: counts and redaction on mixed payloads") {
    val docs = Seq(
      (1L, "reach me at jo.doe+spam@mail-host.co.uk or +4915123456789 thanks"),
      (2L, "server at 192.168.0.1 and 10.0.255.7 responded"),
      (3L, "clean text with numbers 12345 and a plus + sign"),
      (4L, "two mails a@b.io c.d@e-f.org one ip 8.8.8.8")).toDF("doc_id", "text")
    val got = Pii.scrubDocs(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_emails", "n_phones", "n_ipv4", "has_pii", "scrubbed")
      .as[(Long, Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, 1L, 0L, true,
      "reach me at <EMAIL> or <PHONE> thanks")))
    assert(got(2L) == ((2L, 0L, 0L, 2L, true,
      "server at <IP> and <IP> responded")))
    assert(got(3L) == ((3L, 0L, 0L, 0L, false,
      "clean text with numbers 12345 and a plus + sign")))
    assert(got(4L) == ((4L, 2L, 0L, 1L, true,
      "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("audit counts match the redaction: phone-shaped email locals count once") {
    // '+12345678@example.com' is ONE email redaction — the phone-shaped
    // local part must not also be counted as a phone that never got a
    // <PHONE> placeholder (counts are staged to mirror the scrub order)
    val got = Pii.scrubDocs(
      Seq((1L, "contact +12345678@example.com now")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .select("n_emails", "n_phones", "n_ipv4", "scrubbed")
      .as[(Long, Long, Long, String)].head()
    assert(got == ((1L, 0L, 0L, "contact <EMAIL> now")))
  }

  test("recall over precision: out-of-range dotted quads still scrub") {
    val got = Pii.scrubDocs(
      Seq((1L, "bogus 999.999.999.999 quad")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .select("scrubbed").as[String].head()
    assert(got == "bogus <IP> quad")
  }

  test("version-ish dotted tokens: only exact 4-octet runs match") {
    // 1.2.3 (three octets) must NOT scrub; 1.2.3.4.5 contains a 4-octet
    // prefix — documented recall-first behavior, pinned here
    val got = Pii.scrubDocs(
      Seq((1L, "v 1.2.3 released")).toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .select("n_ipv4", "scrubbed").as[(Long, String)].head()
    assert(got == ((0L, "v 1.2.3 released")))
  }

  test("scrub is idempotent: placeholders never re-match") {
    val once = Pii.scrub(lit("mail a@b.io call +12345678 host 1.2.3.4"))
    val twice = Pii.scrub(once)
    val row = spark.range(1).select(once.as("a"), twice.as("b"))
      .as[(String, String)].head()
    assert(row._1 == row._2 && row._1 == "mail <EMAIL> call <PHONE> host <IP>")
  }
}
