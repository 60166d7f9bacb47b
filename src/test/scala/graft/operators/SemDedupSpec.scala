package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup composition: k-means cells → within-cell threshold pairs →
  * connected components → one keeper per group. No SQL oracle exists (the
  * cells are a trained artifact), so this spec pins the two properties
  * that make the operator trustworthy:
  *   - soundness: semDedup never merges vectors the EXACT threshold graph
  *     keeps apart (its components refine the exact components);
  *   - recall: the fraction of exact above-threshold pairs recovered
  *     within cells, measured against the all-pairs graph on the fixture.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private val TauQ = 400000L // quantized dot ≥ 0.4 cosine on unit vectors

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  /** Exact above-threshold pair set — all-pairs, fine at fixture scale. */
  private lazy val exactPairs: Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .filter(Similarity.quantizedDot(col("a_emb"), col("b_emb")) >= TauQ)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  private lazy val result =
    Similarity.semDedup(emb, nlist = 16, minScoreQ = TauQ,
      Similarity.quantizedDot, maxIter = 3, nassign = 2)
      .select("vec_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect()

  test("exactly one keeper per component, and it is the min id") {
    val byComp = result.groupBy(_._2)
    byComp.foreach { case (comp, rows) =>
      val keepers = rows.filter(_._3).map(_._1)
      assert(keepers.toSeq == Seq(rows.map(_._1).min), s"component $comp")
      assert(comp == rows.map(_._1).min, s"component id is the min member in $comp")
    }
    assert(result.map(_._1).distinct.length == result.length) // every vec once
    assert(result.length == emb.count())
  }

  test("soundness: semDedup components refine the exact threshold graph") {
    // union-find over the exact pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exactPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    // every semDedup component must sit inside ONE exact component
    result.groupBy(_._2).foreach { case (comp, rows) =>
      val exactComps = rows.map(r => find(r._1)).distinct
      assert(exactComps.length == 1,
        s"semDedup component $comp spans exact components $exactComps")
    }
  }

  test("recall: within-cell mining recovers most exact pairs") {
    val compOf = result.map(r => r._1 -> r._2).toMap
    val recovered = exactPairs.count { case (a, b) => compOf(a) == compOf(b) }
    val recall = if (exactPairs.isEmpty) 1.0 else recovered.toDouble / exactPairs.size
    info(s"exact pairs=${exactPairs.size} recovered=$recovered recall=$recall")
    assert(exactPairs.nonEmpty, "fixture must have above-threshold pairs to measure")
    assert(recall >= 0.5, s"recall $recall collapsed — cell split is pathological")
  }

  test("toy corpus: tight groups collapse to one keeper each") {
    // two tight groups on distinct axes + two singletons; any cell
    // assignment keeps each tight group intact or misses pairs — assert
    // the sound outcome under the fixed seed
    def v(axis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(4)(0.001f); a(axis) = 1.0f - eps; a
    }
    val rows = Seq(
      (1L, v(0, 0f)), (2L, v(0, 0.001f)), (3L, v(0, 0.002f)),
      (10L, v(1, 0f)), (11L, v(1, 0.001f)),
      (20L, v(2, 0f)), (30L, v(3, 0f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, nlist = 4, minScoreQ = 900000L,
      Similarity.quantizedDot, maxIter = 10)
      .select("vec_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    val comp = got.map(r => r._1 -> r._2).toMap
    assert(comp(1L) == comp(2L) && comp(2L) == comp(3L) && comp(1L) == 1L)
    assert(comp(10L) == comp(11L) && comp(10L) == 10L)
    assert(comp(20L) == 20L && comp(30L) == 30L)
    assert(got.filter(_._3).map(_._1).toSet == Set(1L, 10L, 20L, 30L))
  }

  test("semDedupWithCentroids: overlap assignment recovers boundary pairs (the q80 twin path)") {
    // fixed axis cells; b0/b1 straddle the cell boundary — their exact
    // quantized dot (1.8e6) clears τ but nassign=1 assigns them to
    // DIFFERENT cells, so the pair is only minable with overlap. This is
    // exactly the recall mechanism q39's nassign=3 buys, pinned closed-form.
    val cents = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("cell_id", "centroid")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.9f)),   // cell 0 (dot 1e6 vs 0.9e6)
      (1L, Seq(0.9f, 1.0f)),   // cell 1 — b0·b1 = 1.8e6 ≥ τ
      (2L, Seq(1.0f, 0.0f)),   // cell 0 singleton (dot vs 0: 1e6 < τ)
      (3L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val tau = 1500000L
    def run(nassign: Int): Map[Long, (Long, Boolean)] =
      Similarity.semDedupWithCentroids(vecs, cents, tau, Similarity.quantizedDot, nassign)
        .select("vec_id", "component_id", "keep")
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val single = run(1)
    assert(single(0L) == ((0L, true)) && single(1L) == ((1L, true)),
      "nassign=1 must miss the boundary pair by construction")
    val overlap = run(2)
    assert(overlap(0L) == ((0L, true)) && overlap(1L) == ((0L, false)),
      "nassign=2 must mine the boundary pair and keep the min id")
    assert(overlap(2L) == ((2L, true)) && overlap(3L) == ((3L, true)))
  }
}
