package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: total, disjoint, and near the requested proportions") {
    val df = spark.range(10000).toDF("id")
    val got = Sampling.hashSplit(df, col("id"),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
    val counts = got.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test")) // total: no nulls
    assert(counts.values.sum == 10000L)
    // hash buckets are uniform-ish; 10k keys keep each split within ~20%
    assert(math.abs(counts("train") - 9000L) < 300)
    assert(math.abs(counts("val") - 500L) < 120)
    assert(math.abs(counts("test") - 500L) < 120)
  }

  test("hashSplit: stable under repartitioning and across invocations") {
    val df = spark.range(2000).toDF("id")
    val a = Sampling.hashSplit(df, col("id"), Seq("train" -> 900, "val" -> 100))
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(df.repartition(13), col("id"), Seq("train" -> 900, "val" -> 100))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("hashSplit: salt redraws the assignment") {
    val df = spark.range(2000).toDF("id")
    val v1 = Sampling.hashSplit(df, col("id"), Seq("train" -> 500, "val" -> 500), salt = "v1")
      .as[(Long, String)].collect().toMap
    val v2 = Sampling.hashSplit(df, col("id"), Seq("train" -> 500, "val" -> 500), salt = "v2")
      .as[(Long, String)].collect().toMap
    assert(v1 != v2) // different salts draw different buckets...
    assert(v1.keySet == v2.keySet) // ...over the same rows
  }

  test("hashSplit: null keys get a deterministic split, never split=null") {
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val got = Sampling.hashSplit(df, col("id"), Seq("train" -> 900, "val" -> 100))
    assert(got.filter(col("split").isNull).count() == 0)
    // null hashes like the empty string -> same bucket as an ''-keyed row
    val nullSplit = got.filter(col("id").isNull).select("split").as[String].head()
    val emptySplit = Sampling.hashSplit(
      Seq("").toDF("id"), col("id"), Seq("train" -> 900, "val" -> 100))
      .select("split").as[String].head()
    assert(nullSplit == emptySplit)
  }

  test("leakFreeSplit: cluster members share a split; un-clustered rows split by id") {
    val df = spark.range(1000).toDF("id").withColumn("payload", col("id") * 10)
    // 100 clusters of 5 (ids 0..499 -> rep id/5*5), ids 500+ absent from the map
    val clusters = spark.range(500).toDF("id")
      .withColumn("component_id", (col("id") / 5).cast("long") * 5)
    val got = Sampling.leakFreeSplit(df, col("id"), clusters,
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
    assert(got.count() == 1000) // left join: nothing dropped or duplicated
    // every cluster lands in exactly one split
    val perCluster = got.filter(col("id") < 500)
      .groupBy("component_id").agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(perCluster == 1L)
    // singleton rows coalesce to their own id -> identical to hashSplit
    val plain = Sampling.hashSplit(df.filter(col("id") >= 500), col("id"),
      Seq("train" -> 900, "val" -> 50, "test" -> 50))
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    val lf = got.filter(col("id") >= 500)
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    assert(lf == plain)
    // payload columns survive alongside the assignment
    assert(got.columns.toSet == Set("id", "payload", "component_id", "split"))
  }

  test("leakFreeSplit fails fast when the singleton fallback cast would produce NULLs") {
    // string doc ids vs numeric component ids: id.cast(long) yields NULL for
    // every unclustered row, which would hash them all onto ONE split key
    val df = Seq("doc-a", "doc-b").toDF("doc").withColumn("d", col("doc"))
    val clusters = spark.range(0).toDF("id").withColumn("component_id", col("id"))
    val ex = intercept[IllegalArgumentException] {
      Sampling.leakFreeSplit(df, col("doc"), clusters, Seq("train" -> 950, "val" -> 50))
    }
    assert(ex.getMessage.contains("not losslessly castable"))
    // a lossless widening (int id, long component) is fine
    val dfInt = spark.range(10).select(col("id").cast("int").as("id"))
    val cl = spark.range(5).toDF("id").withColumn("component_id", lit(0L))
    assert(Sampling.leakFreeSplit(dfInt, col("id"), cl,
      Seq("train" -> 950, "val" -> 50)).count() == 10)
  }

  test("hashSplit rejects per-milles that do not sum to 1000") {
    val df = spark.range(10).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(df, col("id"), Seq("train" -> 900, "val" -> 90))
    }
  }

  test("budgetSelect: quality-ranked prefix, boundary row dropped, exact fit kept") {
    val df = Seq(
      // group a, quality order by q desc: (1, w=50), (2, w=50), (3, w=1)
      // budget 100: rows 1+2 fill it exactly (kept), row 3 would cross
      ("a", 1L, 9L, 50L), ("a", 2L, 8L, 50L), ("a", 3L, 7L, 1L),
      // group b: first row alone exceeds the budget -> nothing kept
      ("b", 4L, 9L, 101L), ("b", 5L, 8L, 1L))
      .toDF("g", "id", "q", "w")
    val got = Sampling.budgetSelect(df, col("g"),
      Seq(col("q").desc, col("id").asc), col("w"), budget = 100L)
      .select("id", "cum_weight", "kept")
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, k) => id -> ((c, k)) }.toMap
    assert(got == Map(
      1L -> ((50L, true)), 2L -> ((100L, true)), 3L -> ((101L, false)),
      4L -> ((101L, false)), 5L -> ((102L, false))))
  }

  test("temperatureResample: α=0.5 rates, α=1 natural, α=0 equalizing") {
    // group a: 1 row (the min), group b: 4 rows
    val df = (Seq(("a", 0L)) ++ (1L to 4L).map(("b", _))).toDF("g", "id")
    def rates(alpha: Double): Map[String, Long] =
      Sampling.temperatureResample(df, col("g"), col("id"), alpha)
        .select("g", "keep_ppb").distinct()
        .as[(String, Long)].collect().toMap
    assert(rates(0.5) == Map("a" -> 1000000000L, "b" -> 500000000L)) // √(1/4)
    assert(rates(1.0) == Map("a" -> 1000000000L, "b" -> 1000000000L)) // natural
    assert(rates(0.0) == Map("a" -> 1000000000L, "b" -> 250000000L)) // 1/4: equal E[n]
  }

  test("temperatureResample: a NULL group is a group, not silently dropped") {
    val df = (Seq((Option.empty[String], 0L)) ++ (1L to 4L).map(i => (Some("b"), i)))
      .toDF("g", "id")
    val got = Sampling.temperatureResample(df, col("g"), col("id"), alpha = 0.5)
    assert(got.count() == 5, "null-group row survives the rate join")
    assert(got.filter(col("g").isNull).select("keep_ppb", "kept")
      .as[(Long, Boolean)].head() == ((1000000000L, true))) // min group: keeps all, kept non-null
  }

  test("temperatureResample: kept is the hash-bucket decision, min group keeps all") {
    val df = (Seq(("a", 0L)) ++ (1L to 40L).map(("b", _))).toDF("g", "id")
    val bucketPpb = pmod(Sampling.decisionHash(concat(
      coalesce(col("g").cast("string"), lit("")), lit(":"),
      coalesce(col("id").cast("string"), lit("")))), lit(1000000000L))
    val got = Sampling.temperatureResample(df, col("g"), col("id"), alpha = 0.5)
      .withColumn("bucket", bucketPpb)
      .as[(String, Long, Long, Boolean, Long)].collect()
    assert(got.forall { case (_, _, rate, kept, bucket) => kept == (bucket < rate) })
    assert(got.filter(_._1 == "a").forall(_._4)) // smallest group: all kept
  }

  test("chained sampling decisions are independent across salts (the quadratic mix)") {
    // hash(salt:key) is affine in the key's suffix polynomial, so under
    // the raw or affine-mixed hash a second-stage decision over the
    // SURVIVORS of a first stage is deterministically related to it —
    // measured as a multi-percent conditional bias. The quadratic
    // decisionHash pins the conditional rate at the marginal.
    val df = spark.range(0, 20000).toDF("id")
    val s1 = Sampling.hashSplit(df, col("id"), Seq("a" -> 600, "b" -> 400), salt = "s1")
    val survivors = s1.filter(col("split") === "a").drop("split")
    val s2 = Sampling.hashSplit(survivors, col("id"), Seq("a" -> 500, "b" -> 500), salt = "s2")
    val frac = s2.filter(col("split") === "a").count().toDouble / survivors.count()
    assert(math.abs(frac - 0.5) < 0.02,
      s"conditional second-split fraction $frac must track the marginal 0.5")
  }

  test("temperatureResample: realized keep fraction tracks the rate (hash uniformity)") {
    // the fine ppb bucket must come from the MIXED hash: the raw
    // polynomial's high bits are non-uniform (measured: 99% of 1e6
    // "en:id" raw hashes below 0.707e9), which realized a 0.1 rate as
    // far more than 10% of rows
    val df = ((1L to 100L).map(("a", _)) ++ (1L to 10000L).map(("b", _))).toDF("g", "id")
    val kept = Sampling.temperatureResample(df, col("g"), col("id"), alpha = 0.5)
      .filter(col("g") === "b" && col("kept")).count()
    // rate_b = sqrt(100/10000) = 0.1 → E[kept] = 1000
    assert(math.abs(kept - 1000L) < 150, s"realized $kept of 10000 at rate 0.1")
  }

  test("temperatureResample: a >1000× dominant group is DAMPED, never extinguished") {
    // the permille-resolution regression: at α=0, a group 2001× the
    // smallest flooring to the 1/1000 grid got keep rate 0 — every row
    // silently dropped where "equalize counts" should keep ~1
    val df = (Seq(("min", 0L)) ++ (1L to 2001L).map(("big", _))).toDF("g", "id")
    val rates = Sampling.temperatureResample(df, col("g"), col("id"), alpha = 0.0)
      .select("g", "keep_ppb").distinct().as[(String, Long)].collect().toMap
    assert(rates("big") == (1.0e9 / 2001).toLong,
      s"dominant group must keep a positive ppb rate, got ${rates("big")}")
    assert(rates("min") == 1000000000L)
  }

  test("temperatureResample and stratifiedHashSample: null keys get a decision, not NULL") {
    val df = Seq(("a", Some(1L)), ("a", None), ("b", Some(2L))).toDF("g", "id")
    val t = Sampling.temperatureResample(df, col("g"), col("id"), alpha = 1.0)
    // α=1: every group keeps all — a null key must still realize kept=true
    assert(t.count() == 3 && t.filter(col("kept")).count() == 3)
    // rate 1000 keeps EVERY row; the null-key row used to vanish (NULL
    // bucket < rate is NULL, filtered)
    val s = Sampling.stratifiedHashSample(df, col("g"), col("id"),
      ratesPermille = Map.empty, defaultPermille = 1000)
    assert(s.count() == 3, "null-key row must survive a keep-all rate")
  }

  test("leakFreeSplit: a cluster map with conflicting components fails, not duplicates") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val conflicted = Seq((1L, 10L), (1L, 20L)).toDF("id", "component_id")
    val ex = intercept[Exception] {
      Sampling.leakFreeSplit(df, col("doc_id"), conflicted,
        Seq("train" -> 900, "test" -> 100)).collect()
    }
    assert(ex.getMessage != null)
    // exact duplicate rows (same id, SAME component) collapse harmlessly
    val dupRows = Seq((1L, 10L), (1L, 10L)).toDF("id", "component_id")
    val ok = Sampling.leakFreeSplit(df, col("doc_id"), dupRows,
      Seq("train" -> 900, "test" -> 100))
    assert(ok.count() == 2, "duplicate identical map rows must not multiply the corpus")
  }

  test("leakFreeSplit: a (id, NULL) row beside (id, comp) resolves to comp, deterministically") {
    // countDistinct skips NULLs, so this map passes the conflict guard
    // with one distinct component — and first() with ignoreNulls=false
    // returned NULL or comp depending on partition order, flipping the
    // row's split key between the id-fallback and the real component
    // across runs. ignoreNulls=true pins the real component.
    val df = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val withNull = Seq((1L, Some(10L)), (1L, None), (3L, None))
      .toDF("id", "component_id")
    val expected = (1 to 6).map { rep =>
      // vary the map's physical row order/partitioning — the aggregation
      // pick must not care
      val shuffled = withNull.repartition(rep)
      Sampling.leakFreeSplit(df, col("doc_id"), shuffled,
        Seq("train" -> 500, "test" -> 500))
        .select("doc_id", "component_id").as[(Long, Long)].collect().toSet
    }
    assert(expected.toSet.size == 1, s"nondeterministic across layouts: $expected")
    // doc 1 keys by its real component; doc 3's NULL-only entry means
    // "no cluster" and falls back to its own id, like an absent row
    assert(expected.head == Set((1L, 10L), (2L, 2L), (3L, 3L)))
  }

  test("epochUpsample: integer epochs replicate, weight 0 drops, 1000 passes through") {
    // scattered keys: the polynomial hash maps CONSECUTIVE keys to
    // consecutive buckets (a 50-id run can sit entirely below the
    // fraction cut), so the Bernoulli share is only visible on spread ids
    val df = (1L to 200L).map(i => (i * 7919L, if (i <= 50) "w" else if (i <= 100) "z"
      else if (i <= 150) "c" else "p")).toDF("doc_id", "source")
    val out = Sampling.epochUpsample(df, col("source"), col("doc_id"),
      Map("w" -> 3000, "z" -> 0, "c" -> 1000), defaultPermille = 1500)
      .as[(Long, String, Long)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("w") == 150) // exactly 3 copies each
    assert(!bySrc.contains("z"))
    assert(bySrc("c") == 50)  // unchanged
    // 1.5 epochs: 50 base + hash-fraction extra, strictly between
    assert(bySrc("p") > 50 && bySrc("p") < 100)
    // epoch numbering is a dense 0..n-1 per row
    val epochs = out.filter(_._2 == "w").groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq)
    assert(epochs.values.forall(_ == Seq(0L, 1L, 2L)))
  }

  test("hashSampleK: exact count per group, small groups keep all, salt redraws") {
    val df = (1L to 500L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "lang")
      .union(Seq((9999L, "tiny")).toDF("doc_id", "lang"))
    val out = Sampling.hashSampleK(df, col("lang"), col("doc_id"), k = 7)
      .as[(Long, String, Long)].collect()
    val counts = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts == Map("g0" -> 7, "g1" -> 7, "g2" -> 7, "tiny" -> 1))
    assert(out.filter(_._2 == "g0").map(_._3).sorted.toSeq == (1L to 7L))
    // deterministic under repartition; a different salt picks a different set
    val again = Sampling.hashSampleK(df.repartition(11), col("lang"), col("doc_id"), k = 7)
      .as[(Long, String, Long)].collect()
    assert(out.toSet == again.toSet)
    val redrawn = Sampling.hashSampleK(df, col("lang"), col("doc_id"), k = 7, salt = "v2")
      .as[(Long, String, Long)].collect()
    assert(redrawn.map(_._1).toSet != out.map(_._1).toSet)
  }

  test("epochUpsample: deterministic across repartitioning and runs") {
    val df = (1L to 300L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.epochUpsample(d, col("source"), col("doc_id"),
        Map("s0" -> 2500), defaultPermille = 700)
        .as[(Long, String, Long)].collect().toSet
    assert(run(df) == run(df.repartition(13)))
  }

  test("shuffleShards: a permutation into dense balanced shards, repartition-stable") {
    val df = (1L to 1000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val out = Sampling.shuffleShards(df, col("doc_id"), numShards = 8)
      .as[(Long, String, Long, Long)].collect()
    // every input row exactly once, (shard, pos) unique — it IS a permutation
    assert(out.length == 1000 && out.map(_._1).toSet.size == 1000)
    assert(out.map(o => (o._3, o._4)).toSet.size == 1000)
    // positions are dense 1..|shard| inside every shard
    val byShard = out.groupBy(_._3).view.mapValues(_.map(_._4).sorted.toSeq).toMap
    assert(byShard.keySet == (0L until 8L).toSet)
    byShard.values.foreach(ps => assert(ps == (1L to ps.length)))
    // binomial balance: every shard within ±40% of corpus/numShards
    byShard.values.foreach(ps => assert(ps.length > 75 && ps.length < 175))
    // the shuffle actually shuffles: shard order is not id order
    val shard0 = out.filter(_._3 == 0L).sortBy(_._4).map(_._1).toSeq
    assert(shard0 != shard0.sorted)
    // deterministic under repartition; another salt is another permutation
    val again = Sampling.shuffleShards(df.repartition(13), col("doc_id"), 8)
      .as[(Long, String, Long, Long)].collect()
    assert(out.toSet == again.toSet)
    val redrawn = Sampling.shuffleShards(df, col("doc_id"), 8, salt = "epoch2")
      .as[(Long, String, Long, Long)].collect()
    assert(redrawn.map(o => (o._1, o._3, o._4)).toSet != out.map(o => (o._1, o._3, o._4)).toSet)
  }
}
