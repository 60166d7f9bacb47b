package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def key(s: String): String = {
    val df = Seq(s).toDF("v").select(normalize.searchKey(col("v")).as("k"))
    df.as[String].head()
  }

  test("Transliterate.ascii handles diacritics and special letters") {
    assert(Transliterate.ascii("Motörhead") == "Motorhead")
    assert(Transliterate.ascii("Beyoncé") == "Beyonce")
    assert(Transliterate.ascii("Sigur Rós") == "Sigur Ros")
    assert(Transliterate.ascii("Mø") == "Mo")
    assert(Transliterate.ascii("Straße") == "Strasse")
    assert(Transliterate.ascii("Æther œuvre") == "AEther oeuvre")
    assert(Transliterate.ascii("Łódź") == "Lodz")
    assert(Transliterate.ascii("Đorđe") == "Dorde")
    // typographic punctuation (clean(), benchmark.py:14-21)
    assert(Transliterate.ascii("don’t — stop…") == "don't - stop...")
  }

  test("searchKey matches the reference probe-side semantics (util.py:14-16)") {
    // unidecode → lower → remove "(live)" → strip non-alnum
    assert(key("Pearl Jam") == "pearljam")
    assert(key("Black (Live)") == "black")        // lower() runs before the strip
    assert(key("Hotellounge (Be the Death of Me)") == "hotelloungebethedeathofme")
    assert(key("Motörhead!!!") == "motorhead")
    assert(key("AC/DC") == "acdc")
    assert(key("R.E.M.") == "rem")
    assert(key("__under_score__") == "underscore") // python [^a-zA-Z0-9] drops _
  }

  private def keyOpt(s: String): Option[String] = {
    val df = Seq(s).toDF("v").select(normalize.searchKey(col("v")).as("k"))
    df.as[Option[String]].head()
  }

  test("non-Latin scripts transliterate to distinct keys (ADVICE r01)") {
    assert(Transliterate.ascii("Кино") == "Kino")
    assert(Transliterate.ascii("Щёлково") == "Shchelkovo") // ё NFD-decomposes to е + mark
    assert(key("Ленинград") == "leningrad")
    assert(key("Μάριος") == "marios") // tonos stripped by NFD before mapping
    assert(key("Кино") != key("Ленинград"))
  }

  test("keys that normalize to empty are null — non-matchable, never ''") {
    assert(keyOpt("!!!").isEmpty)
    assert(keyOpt("(Live)").isEmpty)
    assert(keyOpt("永遠").isEmpty) // unmapped CJK strips to nothing → null
    assert(keyOpt("Pearl Jam").contains("pearljam"))
  }

  test("store-vs-probe divergence is pinned (SURVEY §7.4.3)") {
    // the reference's SQL side (\W) KEEPS underscores; probe side drops them
    val df = Seq("a_b").toDF("v")
      .select(
        normalize.searchKeySqlSide(col("v")).as("sql_side"),
        normalize.searchKey(col("v")).as("probe_side"))
    val r = df.head()
    assert(r.getString(0) == "a_b")
    assert(r.getString(1) == "ab")
  }

  test("unaccent is null-safe and codegen-evaluated over a DataFrame") {
    val df = Seq(Some("Beyoncé"), None, Some("ø")).toDF("v")
      .select(normalize.unaccent(col("v")).as("a"))
    assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some("Beyonce"), None, Some("o")))
  }

  test("cleanPunct folds typographic punctuation only") {
    val df = Seq("“Don’t‐stop…”").toDF("v")
      .select(normalize.cleanPunct(col("v")).as("c"))
    assert(df.as[String].head() == "\"Don't-stop...\"")
  }
}
