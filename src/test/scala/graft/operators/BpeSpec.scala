package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer + apply kernel: golden merges on the published example
  * corpus shape, losslessness/determinism properties, and the Spark
  * expression against a driver-side replay. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("golden merges: the classic low/lower/newest/widest histogram") {
    // the example histogram from the published method's exposition
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Bpe.trainOnHistogram(hist, numMerges = 4)
    // pair counts, round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7,
    // (w,e)=8(newest6+lower2), (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3, (e,r)=2, (r,</w>)=2, (w,</w>)=5
    // tie at 9 between (e,s), (s,t), (t,</w>) -> lexicographic: "</w>" < letters? '<' (60) < 'e'(101): ("t","</w>")... compare pair1 first: "e"<"s"<"t" -> ("e","s") wins
    assert(model.merges(0) == (("e", "s")))
    // round 2: ("es","t") = 9 dominates
    assert(model.merges(1) == (("es", "t")))
    // round 3: ("est","</w>") = 9
    assert(model.merges(2) == (("est", "</w>")))
    // round 4: (l,o)=7, (o,w)=7, (w,e)... after est</w> merges: "we" pairs now (w,est</w>) in newest;
    // (l,o)=7 and (o,w)=7 tie -> ("l","o") lexicographically first
    assert(model.merges(3) == (("l", "o")))
    // apply: "lowest" = lo w est</w> under these 4 merges
    assert(model.tokenize("lowest").toSeq == Seq("lo", "w", "est</w>"))
    assert(model.countTokens("lowest") == 3)
  }

  test("losslessness + determinism properties") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'é', '中')).map(_.mkString)
    val corpus = Gen.nonEmptyListOf(Gen.zip(word, Gen.chooseNum(1L, 9L)))
    val prop = Prop.forAll(corpus) { (ws: List[(String, Long)]) =>
      val hist = ws.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }
        .toArray.sortBy { case (w, c) => (-c, w) }
      val a = Bpe.trainOnHistogram(hist, numMerges = 20)
      val b = Bpe.trainOnHistogram(hist.clone(), numMerges = 20)
      // determinism: identical merges on identical histograms
      a.merges.toSeq == b.merges.toSeq &&
        // losslessness: tokens concatenate back to word + the marker
        ws.forall { case (w, _) => a.tokenize(w).mkString == w + Bpe.EndOfWord }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("zero merges tokenizes to code points; empty word to zero tokens") {
    val m = Bpe.Model(Array.empty)
    assert(m.tokenize("ab").toSeq == Seq("a", "b", Bpe.EndOfWord))
    assert(m.tokenize("中é").toSeq == Seq("中", "é", Bpe.EndOfWord))
    assert(m.tokenize("").length == 0)
  }

  test("train on a DataFrame: one histogram pass; expression matches a driver replay") {
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest widest widest"),
      (3L, "newest newest newest widest"),
      (4L, ""),
      (5L, "lowest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), numMerges = 6)
    assert(model.merges.length == 6)
    val got = docs.select(col("doc_id"),
      Bpe.tokenCount(col("text"), model).as("n_bpe"),
      Bpe.tokens(col("text"), model).as("toks"))
      .as[(Long, Long, Seq[String])].collect().sortBy(_._1)
    // replay driver-side over the same rows
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    got.zip(rows).foreach { case ((_, n, toks), (_, text)) =>
      val words = text.split("\\s+").filter(_.nonEmpty)
      val expectToks = words.flatMap(model.tokenize)
      assert(toks == expectToks.toSeq)
      assert(n == expectToks.length.toLong)
    }
    // the empty doc counts zero tokens
    assert(got.find(_._1 == 4L).get._2 == 0L)
    // codegen path: the expression must not fall back to interpreted eval
    val plan = docs.select(Bpe.tokenCount(col("text"), model))
      .queryExecution.executedPlan.toString
    assert(plan.contains("bpe_token_count"))
  }

  test("save/load round-trips the model through parquet") {
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val model = Bpe.trainOnHistogram(hist, numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpespec").resolve("model").toString
    Bpe.save(model, spark, dir)
    val back = Bpe.load(spark, dir)
    assert(back.merges.toSeq == model.merges.toSeq)
    assert(back.tokenize("lowest").toSeq == model.tokenize("lowest").toSeq)
  }

  test("maxWords truncates the histogram head deterministically") {
    val docs = Seq.tabulate(50)(i => s"common rare$i").toDF("text")
    val hist = Bpe.wordHistogram(docs.toDF(), col("text"), maxWords = 3)
    assert(hist.head == (("common", 50L)))
    assert(hist.length == 3)
    assert(hist.map(_._1).toSeq == Seq("common", "rare0", "rare1")) // count desc, word asc
  }

  test("singleton pre-filter is exact on both sides of its threshold") {
    // ≥ maxWords multi-occurrence words: the filtered branch fires and no
    // singleton can reach the head (count desc outranks them all)
    val manyMulti = (Seq.fill(2)(Seq.tabulate(5)(i => s"multi$i").mkString(" ")) ++
      Seq.tabulate(20)(i => s"single$i")).toDF("text")
    val h1 = Bpe.wordHistogram(manyMulti, col("text"), maxWords = 4)
    assert(h1.toSeq == (0 until 4).map(i => (s"multi$i", 2L)),
      s"filtered branch must equal the naive head, got ${h1.toSeq}")
    // < maxWords multi words: the unfiltered branch fires and singletons
    // legitimately fill the head's tail (ties by word asc)
    val fewMulti = (Seq.fill(2)(Seq("alpha").mkString(" ")) ++
      Seq("s1", "s0")).toDF("text")
    val h2 = Bpe.wordHistogram(fewMulti, col("text"), maxWords = 3)
    assert(h2.toSeq == Seq(("alpha", 2L), ("s0", 1L), ("s1", 1L)),
      s"unfiltered branch must keep singletons in the head, got ${h2.toSeq}")
  }
}
