package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

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

  /** The staged regex chain the fused kernel must reproduce byte-exactly
    * (same java.util.regex semantics Spark's regexp_replace uses). */
  private def stagedScrub(s: String): String =
    s.replaceAll(Pii.EmailPattern, "<EMAIL>")
      .replaceAll(Pii.PhonePattern, "<PHONE>")
      .replaceAll(Pii.Ipv4Pattern, "<IP>")

  private def kernelScrub(s: String): String =
    graft.functions.PiiScrubKernel.scrub(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("fused PiiScrub kernel ≡ staged regex chain: adversarial goldens") {
    val cases = Seq(
      // boundary comes from the placeholder, not the original text:
      // email consumes "a@b.cc", then '>' gives the IP its leading \b
      "a@b.cc1.2.3.4",
      // email local part absorbs a phone-shaped prefix
      "+123456789@b.cc",
      "+1234567.x@y.cc",
      // greedy 4th octet eats into what looks like a second address
      "1.2.3.41.2.3.4",
      "1.2.3.4.5.6.7.8",
      // greedy phone digits consume the IP's first octet
      "+12345671.2.3.4",
      // failed email attempts: no '@' reachable, '@' with empty domain
      "ab@@x.cc", "a@b", "x@y.z12 tail", "@@@", "a@.cc", "a@-.cc",
      // tld backtracking: match must end at the last dot-letters block
      "a@b.cc4567", "u@sub.do-main.org.uk extra",
      // phone run-length edges: 6 (short), 7, 15, 16 (overlong) digits
      "+123456", "+1234567", "+123456789012345", "+1234567890123456",
      // trailing-boundary failures
      "+1234567abc", "x1.2.3.4", "1.2.3.4x", "1.2.3.456789",
      // IP octet-length edges
      "1234.2.3.4", "1.2.3.1234", "999.999.999.999 ok",
      // adjacency chains
      "1.2.3.4+1234567", "+1234567 1.2.3.4 a@b.cc",
      "mail:a@b.io,b@c.de;+12345678/10.0.0.1",
      // unicode neighbours (non-ASCII bytes are never word chars)
      "é1.2.3.4é", "日本語 a@b.cc 日本語", "naïve+1234567x",
      "", " ", "+", "@", "1.2.3.4")
    for (c <- cases)
      assert(kernelScrub(c) == stagedScrub(c), s"input: '$c'")
  }

  test("fused PiiScrub kernel ≡ staged regex chain (property: random PII soup)") {
    val atom = Gen.oneOf(
      Gen.oneOf("alpha", "beta", "x", "the", "…", "é", "_", "%", "-", ".", "..",
        "@", "+", "<", ">", " ", "  ", ",", "\n"),
      Gen.choose(0, 99999).map(_.toString),
      Gen.oneOf("a@b.cc", "jo.doe+x@mail-host.co.uk", "a@b", "@b.cc", "a@b.c",
        "+12345678", "+123456", "+123456789012345678",
        "1.2.3.4", "10.0.255.7", "1.2.3", "1.2.3.4.5", "999.999.999.999",
        "v1.2.3.44", "a@b.cc1.2.3.4", "+1234567a@b.cc"))
    val genDoc = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, atom).map(_.mkString("")))
    val prop = Prop.forAll(genDoc) { s: String =>
      kernelScrub(s) == stagedScrub(s)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(3000), prop)
    assert(res.passed, res.status.toString)
  }

  test("Pii.scrub column ≡ scrubComposed column through Spark") {
    val docs = Seq(
      "reach jo.doe+spam@mail-host.co.uk or +4915123456789",
      "server 192.168.0.1 and 10.0.255.7", "a@b.cc1.2.3.4 soup +12345671.2.3.4",
      "plain text, no pii at all").zipWithIndex.map(_.swap).toDF("id", "text")
    val both = docs.select(Pii.scrub(col("text")).as("k"),
      Pii.scrubComposed(col("text")).as("r")).as[(String, String)].collect()
    both.foreach { case (k, r) => assert(k == r) }
  }
}
