package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](df: org.apache.spark.sql.DataFrame): T =
    df.as[T].head()

  test("token counting: whitespace, bpe-ish units, punctuation") {
    val df = Seq("Hello, world! It's 42.").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("t"),
      TextAnalysis.bpeishCount(col("text")).as("b"),
      TextAnalysis.punctCount(col("text")).as("p"))
      .as[(Int, Int, Int)].head()
    // tokens: [Hello,  world!  It's  42.]
    // bpeish: Hello , world ! It ' s 42 .  → 9
    // punct:  , ! ' .                      → 4
    assert(got == ((4, 9, 4)))
  }

  test("empty and whitespace-only text yields zero counts, not [\"\"]") {
    val got = Seq("", "   ").toDF("text")
      .select(TextAnalysis.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0))
  }

  test("perMille is exact integer arithmetic with zero-denominator guard") {
    val df = Seq((1L, 3L), (0L, 0L), (2L, 3L)).toDF("num", "den")
    val got = df.select(TextAnalysis.perMille(col("num"), col("den"))).as[Long].collect().toSeq
    assert(got == Seq(333L, 0L, 666L))
  }

  test("langId: stopword evidence argmax, alphabetic tie-break, und fallback") {
    val got = Seq(
      "the cat and the dog went to the market",
      "el que no sabe es como el que no ve",
      "der hund und die katze sind nicht da",
      "le chat et le chien dans la maison ce soir",
      "zzz qqq www") // zero evidence
      .toDF("text").select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "fr", "und"))
  }

  test("fused LangId kernel ≡ HOF-composed langId fold (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf(
      // stopwords from several profiles (incl. cross-profile dups like
      // "de"/"la"), near-misses, junk, mixed case, unicode
      "the", "and", "la", "de", "que", "und", "der", "le", "ce",
      "thee", "アイウ", "Zzz", "THE", "Le", "", "a", "no")
    val genDoc = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(25, genDoc)) { docs: List[String] =>
      val df = docs.zipWithIndex.map(_.swap).toDF("id", "text")
      val fused = df.select(col("id"), TextAnalysis.langId(col("text")))
        .as[(Int, String)].collect().toMap
      val composed = df.select(col("id"), TextAnalysis.langIdComposed(col("text")))
        .as[(Int, String)].collect().toMap
      fused == composed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("fused ShingleHashesAll ≡ rollingHash over the HOF gram multiset (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genText = Gen.choose(0, 8).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("aa", "b", "ccc")).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(6, genText), Gen.choose(1, 3)) {
      (texts: List[String], n: Int) =>
        val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
        val fused = df.select(col("id"), TextAnalysis.ngramHashesMultiset(col("text"), n))
          .as[(Int, Seq[Long])].collect().toMap
        val composed = df.select(col("id"),
          transform(TextAnalysis.ngramsMultiset(col("text"), n),
            g => graft.operators.Dedup.rollingHash(g)))
          .as[(Int, Seq[Long])].collect().toMap
        fused == composed
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("repetitionStats: 2-gram dominance and repeat fraction per-mille") {
    val docs = Seq(
      (1L, "go go go go go"),       // grams: 4× "go go" -> fully repetitive
      (2L, "a b c d"),              // 3 distinct grams, no repeats
      (3L, "x y x y x y"),          // grams: x y, y x, x y, y x, x y -> top 3/5
      (4L, "one"))                  // < 2 tokens -> absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, col("doc_id"), col("text"), n = 2)
      .select("doc_id", "n_grams", "n_distinct_grams", "top_gram_permille", "dup_gram_permille")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 1L, 1000L, 750L),
      (2L, 3L, 3L, 333L, 0L),
      (3L, 5L, 2L, 600L, 600L)))
  }

  test("repetitionStats kernel ≡ explode+aggregate reference on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cols = Seq("doc_id", "n_grams", "n_distinct_grams",
      "top_gram_permille", "dup_gram_permille")
    val kernel = TextAnalysis.repetitionStats(docs, col("doc_id"), col("text"), n = 2)
      .select(cols.head, cols.tail: _*)
    val ref = TextAnalysis.repetitionStatsAggregated(docs, col("doc_id"), col("text"), n = 2)
      .select(cols.head, cols.tail: _*)
    assert(kernel.count() == ref.count())
    assert(kernel.except(ref).count() == 0 && ref.except(kernel).count() == 0)
  }

  test("qualityGate: each rule flags its own failure mode, keep is the conjunction") {
    val docs = Seq(
      // 6 tokens incl. stopwords, mean len fine, no repeats -> keep
      (1L, "the cat sat on a mat"),
      // 3 tokens -> too_short alone ("you" keeps stopword density up)
      (2L, "hi there you"),
      // stopwords present, but one absurd 40-char token blows the mean
      (3L, "the abcdefghijklmnopqrstuvwxyzabcdefghijklmn of it and a to in is you xx"),
      // enough length, zero stopwords -> low_stopword
      (4L, "cat dog fox hen owl bat cow pig ram ewe"),
      // "go go" dominates the gram multiset -> repetitive
      (5L, "the go go go go go go go go go it")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityGate(docs, col("doc_id"), col("text"),
      minTokens = 5L, maxTokens = 100L,
      minMeanTokLenPermille = 1000L, maxMeanTokLenPermille = 5000L,
      minStopwordPermille = 100L, maxTopGramPermille = 500L, n = 2)
      .select("doc_id", "too_short", "too_long", "bad_token_shape", "low_stopword",
        "repetitive", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, false, false, false, false, false, true)))
    assert(got(2L) == ((2L, true, false, false, false, false, false)))
    assert(got(3L) == ((3L, false, false, true, false, false, false)))
    assert(got(4L) == ((4L, false, false, false, true, false, false)))
    assert(got(5L) == ((5L, false, false, false, false, true, false)))
  }

  test("qualityGate: a doc below the gram width gets repetition 0, gated by too_short") {
    val got = TextAnalysis.qualityGate(
      Seq((1L, "one")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      minTokens = 5L)
      .select("top_gram_permille", "too_short", "repetitive", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].head()
    assert(got == ((0L, true, false, false)))
  }

  test("fused GateStats qualityGate ≡ HOF-composed gate (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sw = TextAnalysis.StopwordProfiles.toMap.apply("en") ++
      TextAnalysis.StopwordProfiles.toMap.apply("fr")
    // adversarial vocabulary: stopwords, case variants the lower() pass
    // must normalize, a char whose lowercase EXPANDS (İ → i + combining
    // dot), a supplementary-plane token (code-point counting), junk
    val word = Gen.oneOf("the", "and", "la", "pour", "THE", "Le", "DANS",
      "İstanbul", "ß", "𝒜𝒷𝒸", "interblag", "a", "1,2", "...")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n ", " \u000b ")
    val genDoc = Gen.choose(0, 25).flatMap { k =>
      for { ws <- Gen.listOfN(k, word); ss <- Gen.listOfN(k, sep) }
        yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    }
    val gateCols = Seq("doc_id", "n_tokens", "mean_tok_len_permille",
      "stopword_permille", "top_gram_permille", "keep")
    val prop = Prop.forAll(Gen.listOfN(20, genDoc)) { docs: List[String] =>
      val df = docs.zipWithIndex.map(_.swap).toDF("doc_id", "text")
      def rows(g: org.apache.spark.sql.DataFrame) =
        g.select(gateCols.head, gateCols.tail: _*)
          .as[(Int, Long, Long, Long, Long, Boolean)].collect()
          .map(r => r._1 -> r).toMap
      rows(TextAnalysis.qualityGate(df, col("doc_id"), col("text"), sw,
        minTokens = 3L, minStopwordPermille = 50L, maxTopGramPermille = 600L)) ==
        rows(TextAnalysis.qualityGateComposed(df, col("doc_id"), col("text"), sw,
          minTokens = 3L, minStopwordPermille = 50L, maxTopGramPermille = 600L))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("fused GateStats qualityGate ≡ HOF-composed gate on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val fused = TextAnalysis.qualityGate(docs, col("doc_id"), col("text"))
    val composed = TextAnalysis.qualityGateComposed(docs, col("doc_id"), col("text"))
    assert(fused.count() == composed.count())
    assert(fused.except(composed).count() == 0 && composed.except(fused).count() == 0)
  }

  test("qualityKeep predicate ≡ qualityGate keep-join (fixture corpus + edge thresholds)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sw = TextAnalysis.StopwordProfiles.toMap.apply("en") ++
      TextAnalysis.StopwordProfiles.toMap.apply("fr")
    for ((minT, minSw, maxTop) <- Seq((20L, 10L, 300L), (1L, 0L, 1000L), (50L, 20L, 0L))) {
      val viaFilter = docs.filter(TextAnalysis.qualityKeep(col("text"), sw,
        minTokens = minT, minStopwordPermille = minSw, maxTopGramPermille = maxTop))
        .select("doc_id")
      val viaJoin = docs.join(
        TextAnalysis.qualityGate(docs, col("doc_id"), col("text"), sw,
          minTokens = minT, minStopwordPermille = minSw, maxTopGramPermille = maxTop)
          .filter(col("keep")).select("doc_id"), "doc_id")
        .select("doc_id")
      assert(viaFilter.count() == viaJoin.count(),
        s"thresholds ($minT, $minSw, $maxTop)")
      assert(viaFilter.except(viaJoin).count() == 0 &&
        viaJoin.except(viaFilter).count() == 0,
        s"thresholds ($minT, $minSw, $maxTop)")
    }
  }

  test("qualityKeep evaluates its kernel once: a single filter conjunct in the plan") {
    val docs = spark.range(10).selectExpr(
      "id as doc_id", "concat('the a b c ', id) as text")
    val plan = docs.filter(TextAnalysis.qualityKeep(col("text")))
      .queryExecution.optimizedPlan.toString
    assert("quality_keep".r.findAllIn(plan).length == 1, plan)
  }

  test("fused Shingles kernel ≡ HOF gram composition (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDoc = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("a", "bb", "ccc", "d")).map(_.mkString(" ")))
    val prop = Prop.forAll(genDoc, Gen.choose(1, 4)) { (doc: String, n: Int) =>
      val row = Seq(doc).toDF("text").select(
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.Shingles(
            org.apache.spark.sql.graft.Bridge.expression(col("text")), n)).as("fused"),
        Dedup.shingles(col("text"), n).as("hof"))
        .as[(Seq[String], Seq[String])].head()
      row._1 == row._2
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("tokenRarity: mean document frequency, occurrences counted per token") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "x x"), (4L, "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tokenRarity(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long)].collect().toSet
    // df: x in 3 docs, y/z in 1; doc 3's repeat counts x twice in ITS
    // mean but only once in x's df; token-free doc 4 is absent
    assert(got == Set(
      (1L, 2L, 2000L), // (3+1)/2
      (2L, 2L, 2000L), // (3+1)/2
      (3L, 2L, 3000L))) // (3+3)/2
  }

  test("approx_count_distinct (the 100 TB vocab path) stays near the exact counts") {
    // the q44 scaladoc's documented scale substitution — pin its error on
    // real data so it's a measured claim. HLL++ is deterministic for a
    // given dataset + rsd, so this cannot flake.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val both = docs.select(col("source"), explode(Dedup.tokenHashes(col("text"))).as("h"))
      .groupBy("source") // one job computes both sides of the comparison
      .agg(count_distinct(col("h")).as("x"), approx_count_distinct(col("h"), 0.02).as("a"))
      .as[(String, Long, Long)].collect()
    both.foreach { case (s, x, a) =>
      assert(math.abs(a - x).toDouble / x < 0.05, s"source $s: exact $x vs approx $a")
    }
  }

  test("targetAffinity: distinct-gram overlap permille against the target set") {
    val target = Seq((100L, "x y z")).toDF("doc_id", "text") // bigrams: "x y","y z"
    val docs = Seq(
      (1L, "x y q"), // {"x y","y q"} -> 1 of 2 in target
      (2L, "q q"), // {"q q"} -> 0 of 1
      (3L, "x y z w"), // {"x y","y z","z w"} -> 2 of 3
      (4L, "x y x y")) // multiset {"x y","y x","x y"} -> DISTINCT {..} -> 1 of 2
      .toDF("doc_id", "text")
    val got = TextAnalysis.targetAffinity(
      docs, col("doc_id"), col("text"), target, col("text"), n = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 1L, 500L), (2L, 1L, 0L, 0L),
      (3L, 3L, 2L, 666L), (4L, 2L, 1L, 500L)))
  }

  test("topNgrams: document frequency (not occurrences), deterministic cutoff") {
    val docs = Seq(
      (1L, "the same header x"),      // "the same header" + "same header x"
      (2L, "the same header y"),
      (3L, "the same header the same header"), // repeats within doc count ONCE
      (4L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, col("text"), n = 3, k = 3)
      .as[(String, Long)].collect().toSeq
    // df("the same header") = 3 docs (doc 3's repeat not double-counted);
    // everything else df = 1, tie broken alphabetically
    assert(got == Seq(
      ("the same header", 3L),
      ("a b c", 1L),
      ("b c d", 1L)))
  }

  test("chunkDocs: overlapping windows cover every token, no subset chunks") {
    // 10 tokens, chunk 4, overlap 1 -> step 3 -> starts 0,3,6 — a chunk at
    // 9 would be just "t9", fully contained in the chunk at 6 -> not emitted
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, ""), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, col("doc_id"), col("text"),
      chunkTokens = 4, overlapTokens = 1)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 4L, "t6 t7 t8 t9"),
      (3L, 0L, 1L, "x")))          // single-token doc: one chunk; empty doc absent
    // coverage: every token index appears in some chunk
    val covered = got.filter(_._1 == 1L).flatMap { case (_, k, len, _) =>
      (k * 3 until k * 3 + len).toSet
    }
    assert(covered == (0L until 10L).toSet)
  }

  test("chunkDocs: coverage and content for arbitrary sizes (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 40)
      chunk <- Gen.choose(2, 8)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (n, chunk, overlap)
    val prop = Prop.forAll(gen) { case (n, chunk, overlap) =>
      val toks = (0 until n).map(i => s"w$i")
      val step = chunk - overlap
      val got = TextAnalysis.chunkDocs(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunk, overlap)
        .as[(Long, Long, Long, String)].collect().sortBy(_._2)
      // every chunk's text is exactly the original token slice at its start
      val contentOk = got.forall { case (_, k, len, txt) =>
        txt == toks.slice((k * step).toInt, (k * step).toInt + len.toInt).mkString(" ") &&
          len == math.min(chunk, n - k * step)
      }
      // the union of [start, start+len) covers [0, n) with no gaps
      val covered = got.flatMap { case (_, k, len, _) =>
        (k * step) until (k * step + len)
      }.toSet
      // no chunk is a subset of its predecessor: every non-first chunk
      // contributes at least one token beyond the shared overlap
      val noSubsets = got.drop(1).forall(_._3 > overlap)
      contentOk && covered == (0L until n.toLong).toSet && noSubsets
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunkDocs: zero overlap partitions exactly; bad params rejected") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, col("doc_id"), col("text"), 2, 0)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, 0L, 2L, "a b"), (1L, 1L, 2L, "c d"), (1L, 2L, 1L, "e")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocs(docs, col("doc_id"), col("text"), 2, 2)
    }
  }

  test("fingerprint = RollingHash of the text (codegen expression)") {
    val got = Seq("spark").toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[Long].head()
    val expected = "spark".foldLeft((0L, true)) { case ((acc, first), c) =>
      (if (first) c.toLong else (acc * 31 + c) % 1000000007L, false)
    }._1
    assert(got == expected)
  }

  test("stripMarkup: scripts die with payload, tags die alone, entities unescape in order") {
    def strip(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.stripMarkup(col("t"))).as[String].head()
    assert(strip("<p>hello <b>world</b></p>") == "hello world")
    assert(strip("a<script>var x = '<evil>';</script>b") == "a b")
    assert(strip("a<style type=css>\np { color: red }\n</style>b") == "a b") // (?s): newlines inside
    assert(strip("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y") == "x <tag> \"q\" 's' & y")
    assert(strip("&amp;lt; stays literal") == "&lt; stays literal") // &amp; LAST
    assert(strip("one&nbsp;&nbsp;two   three") == "one two three")  // collapse
    assert(strip("<SCRIPT>u</SCRIPT>x") == "x") // (?i): HTML tag names are case-insensitive
    assert(strip("no markup at all") == "no markup at all")
    // unterminated script: nothing to close, the tag strip still fires
    assert(strip("a<script>dangling") == "a dangling")
    // a custom element whose name merely STARTS with 'script' is a
    // different tag: it dies alone, its prose survives
    assert(strip("a<script-template>keep me</script-template> b <script>var x;</script>c")
      == "a keep me b c")
    // a closer with attributes is a parse error that still CLOSES the
    // element — the payload must die at it, not leak as prose
    assert(strip("a<script>var x=1;</script x>b") == "a b")
    // comments die as a pair even when the body contains '>'
    assert(strip("<!-- if x > 0 -->text") == "text")
    // processing instructions (XHTML prolog, php) are markup
    assert(strip("<?xml version=\"1.0\" encoding=\"UTF-8\"?><p>hi</p>") == "hi")
  }

  test("groupKeywords: df-normalized top-k per group, df cap excludes stopwords") {
    val docs = Seq(
      (1L, "A", "alpha common"), (2L, "A", "alpha alpha common"),
      (3L, "B", "beta common"), (4L, "B", "beta zeta common"))
      .toDF("doc_id", "grp", "text")
    val got = TextAnalysis.groupKeywords(docs, col("grp"), col("doc_id"), col("text"),
      k = 2, maxTokenDf = 3L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // 'common' (df=4) is capped out of the metric entirely;
    // alpha: tf_A=3, df=2 → 1500000; beta: tf_B=2, df=2 → 1000000;
    // zeta: tf_B=1, df=1 → 1000000 — tie with beta breaks on token asc
    assert(got == Set(
      ("A", "alpha", 3L, 2L, 1500000L, 1L),
      ("B", "beta", 2L, 2L, 1000000L, 1L),
      ("B", "zeta", 1L, 1L, 1000000L, 2L)))
  }

  test("groupKeywords scans and explodes the corpus exactly once (linear plan)") {
    val docs = (1L to 200L).map(i => (i, s"g${i % 3}", s"tok${i % 7} tok${i % 5} x"))
      .toDF("doc_id", "grp", "text")
    val q = TextAnalysis.groupKeywords(docs, col("grp"), col("doc_id"), col("text"), k = 3)
    q.collect() // AQE finalizes the plan on execution
    val plan = q.queryExecution.executedPlan.toString
    val explodes = "Generate explode".r.findAllIn(
      plan.split("== Initial Plan ==").head).length
    assert(explodes == 1,
      s"the corpus must explode once, found $explodes:\n$plan")
  }

  test("bigramLm: conditional per-mille, lowercased mass, denominator pre-prune") {
    val docs = Seq((1L, "a b A b"), (2L, "a b c"), (3L, ""), (4L, "solo"))
      .toDF("doc_id", "text")
    // bigrams (lowercased): doc1 [a b, b a, a b]  doc2 [a b, b c]
    // counts: "a b"=3, "b a"=1, "b c"=1; prefixes: a·=3, b·=2
    val lm2 = TextAnalysis.bigramLm(docs, col("text"), minCount = 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(lm2 == Set(("a b", 3L, 1000L)))
    // minCount=1 keeps the b-prefix grams: their denominator (2) was
    // summed over ALL successors, not just surviving ones
    val lm1 = TextAnalysis.bigramLm(docs, col("text"), minCount = 1L)
      .as[(String, Long, Long)].collect().toSet
    assert(lm1 == Set(("a b", 3L, 1000L), ("b a", 1L, 500L), ("b c", 1L, 500L)))
  }

  test("bigramLmScore: mean P(w2|w1) per-mille, OOV scores 0, short docs survive") {
    val docs = Seq((1L, "a b A b"), (2L, "a b c"), (3L, ""), (4L, "solo"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(docs, col("text"), minCount = 2L)
    val got = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"), lm)
      .as[(Long, Long, Long)].collect().toSet
    // doc1: [1000, 0 (b a pruned), 1000] → 2000 // 3 = 666
    // doc2: [1000, 0 (b c pruned)]       → 1000 // 2 = 500
    // doc3/doc4: no bigrams → n=0, mean=0 (NOT dropped)
    assert(got == Set((1L, 3L, 666L), (2L, 2L, 500L), (3L, 0L, 0L), (4L, 0L, 0L)))
  }

  test("fused ShinglesAll ≡ HOF ngramsMultiset (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.oneOf("a", "bb", "ccc", "Ww", "é", "x-y", "", " ", "\t", "1")
    val genDoc = Gen.choose(0, 10).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(20, genDoc), Gen.choose(1, 4)) {
      (docs: List[String], n: Int) =>
        val df = docs.zipWithIndex.map(_.swap).toDF("id", "text")
        val fused = df.select(col("id"),
          TextAnalysis.ngramStringsMultiset(col("text"), n).as("g"))
          .as[(Int, Seq[String])].collect().toMap
        val hof = df.select(col("id"),
          TextAnalysis.ngramsMultiset(col("text"), n).as("g"))
          .as[(Int, Seq[String])].collect().toMap
        fused == hof
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("bigramLm explodes the ref corpus exactly once and plans no join (linear plan)") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 3} w${i % 5} w${i % 3}")).toDF("doc_id", "text")
    val lm = TextAnalysis.bigramLm(docs, col("text"))
    lm.collect() // AQE finalizes
    val plan = lm.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("Generate explode".r.findAllIn(plan).length == 1,
      s"the prefix mass must ride the gram table's own window, not a second corpus pass:\n$plan")
    assert(!plan.contains("Join"), s"no prefix join:\n$plan")
  }

  test("bigramLmScore: above the gate the LM broadcasts; all strategies agree") {
    val docs = (1L to 300L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 5} w${i % 3}"))
      .toDF("doc_id", "text")
    val lazyScore = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"),
      TextAnalysis.bigramLm(docs, col("text")))
    val lazyPlan = lazyScore.queryExecution.executedPlan.toString
    assert(lazyPlan.contains("ShuffledHashJoin"),
      s"below the size gate the probe must stay the lazy shuffled join:\n$lazyPlan")
    spark.conf.set(TextAnalysis.LmBroadcastGateMinBytesKey, "0")
    try {
      val bc = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"),
        TextAnalysis.bigramLm(docs, col("text")))
      val bcPlan = bc.queryExecution.executedPlan.toString
      assert(bcPlan.contains("BroadcastHashJoin"),
        s"a prunable LM above the gate must broadcast into the probe:\n$bcPlan")
      val big = TextAnalysis.bigramLmScore(docs, col("doc_id"), col("text"),
        TextAnalysis.bigramLm(docs, col("text")), maxBroadcastKeys = 0L)
      val bigPlan = big.queryExecution.executedPlan.toString
      assert(bigPlan.contains("ShuffledHashJoin"),
        s"above the broadcast cap the probe must fall back to shuffled:\n$bigPlan")
      val want = lazyScore.collect().sortBy(_.getLong(0)).toSeq
      assert(bc.collect().sortBy(_.getLong(0)).toSeq == want &&
        big.collect().sortBy(_.getLong(0)).toSeq == want,
        "probe strategies must emit identical scores")
    } finally spark.conf.unset(TextAnalysis.LmBroadcastGateMinBytesKey)
  }
}
