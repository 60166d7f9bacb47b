package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native quantizedDot ≡ built-ins composition on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(40)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
    val diff = pairs.select(
      Similarity.quantizedDot(col("a"), col("b")).as("x"),
      Similarity.quantizedDotComposed(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).count()
    assert(diff == 0)
  }

  test("dot / norm / cosine / quantizedDot on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f, 2.0f), Seq(3.0f, 4.0f, 0.5f))).toDF("a", "b")
    val (d, c, q) = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.cosine(col("a"), col("b")),
      Similarity.quantizedDot(col("a"), col("b")))
      .as[(Double, Double, Long)].head()
    assert(math.abs(d - 4.0) < 1e-9)
    val expectedCos = 4.0 / (math.sqrt(5.0) * math.sqrt(25.25))
    assert(math.abs(c - expectedCos) < 1e-9)
    assert(q == 1000L * 3000 + 0L * 4000 + 2000L * 500)
  }

  test("bruteForceTopK ranks by score desc with id tie-break, excludes self") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 0), vecs, k = 2, Similarity.quantizedDot)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((3L, 1), (1L, 2))) // identical vector first, then closest
  }

  test("lshTopK recall@5 vs brute force on real embeddings (fixed planes)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5, Similarity.quantizedDot)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, emb, 5, planes = 6,
      Similarity.quantizedDot, probeBits = 2, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall@5 = $recall") // deterministic given fixed planes/data (measured 0.80)
    // every approx result must be a real corpus neighbor of the query
    assert(approx.forall { case (q, n) => q != n })
  }

  test("ivfTopKWithCentroids: fixed cells route probing exactly (the q79 twin path)") {
    // hand-checkable geometry: two fixed cells on the axes; v0/v1 live in
    // cell 0, v2/v3 in cell 1 (quantized dot decides assignment)
    val cents = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("cell_id", "centroid")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.1f)),
      (1L, Seq(0.9f, 0.2f)),
      (2L, Seq(0.1f, 1.0f)),
      (3L, Seq(0.2f, 0.9f))).toDF("vec_id", "embedding")
    val q0 = vecs.filter(col("vec_id") === 0)
    // nprobe=1: only cell 0 is searched — v2/v3 are unreachable by design
    val near = Similarity.ivfTopKWithCentroids(q0, vecs, k = 3, nprobe = 1,
      cents, Similarity.quantizedDot)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(near == Set((1L, 1)))
    // nprobe=2: both cells — full ranking by exact quantized dot:
    // v1 = 900*1000+200*100 = 920000, v3 = 290000, v2 = 200000
    val all = Similarity.ivfTopKWithCentroids(q0, vecs, k = 3, nprobe = 2,
      cents, Similarity.quantizedDot)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(all == Set((1L, 1), (3L, 2), (2L, 3)))
  }

  test("ivfTopKWithCentroids under fitCells centroids ≡ ivfTopK (same path by construction)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val cents = Similarity.fitCells(emb, nlist = 4, maxIter = 2)
    val viaWith = Similarity.ivfTopKWithCentroids(queries, emb, 3, 2, cents,
      Similarity.quantizedDot).collect().toSet
    val direct = Similarity.ivfTopK(queries, emb, 3, nlist = 4, nprobe = 2,
      Similarity.quantizedDot, maxIter = 2).collect().toSet
    assert(viaWith == direct)
  }

  test("saveCells/loadCells round-trip: the persisted quantizer serves identically") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val cents = Similarity.fitCells(emb, nlist = 4, maxIter = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_cells").toString
    Similarity.saveCells(cents, s"$dir/cells")
    val loaded = Similarity.loadCells(spark, s"$dir/cells")
    val fresh = Similarity.ivfTopKWithCentroids(queries, emb, 3, 2, cents,
      Similarity.quantizedDot).collect().toSet
    val served = Similarity.ivfTopKWithCentroids(queries, emb, 3, 2, loaded,
      Similarity.quantizedDot).collect().toSet
    assert(served == fresh)
  }

  test("loadCells serves the q79 twin identically: the persisted table IS the quantizer") {
    // the serving shape's actual claim, pinned on the HASH-ORACLED q79
    // fixture itself: save the q79 fixed cell table, load it back, run the
    // exact registered configuration (k=5, nprobe=4, quantizedDot over the
    // first-64-vec query set) through the loaded quantizer, and assert
    // row-set equality with the registered query — so the persisted
    // artifact provably reproduces a result whose value surface DuckDB
    // hash-verifies every round.
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val registered = graft.SparkEntry.queries("q79_ann_ivf_fixed")(spark, sfDir)
      .collect().toSet
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("centroid"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cells_q79").toString
    Similarity.saveCells(cents, s"$dir/cells")
    val loaded = Similarity.loadCells(spark, s"$dir/cells")
    val served = Similarity.ivfTopKWithCentroids(
      emb.filter(col("vec_id") < 64), emb, k = 5, nprobe = 4, loaded,
      Similarity.quantizedDot)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        col("score"))
      .collect().toSet
    assert(served == registered)
    assert(served.nonEmpty)
  }

  test("int8Quantize: reconstruction within a quantization step, zero-vector safe") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").limit(100)
      .union(Seq((99999L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding"))
    val q = Similarity.int8Quantize(emb)
    // max |x - code*scale/127| over all components <= scale/127 (round-off)
    val worst = q.select(
      array_max(zip_with(col("embedding"), col("code8"),
        (x, c) => abs(x - c.cast("float") * col("scale8") / lit(127f)))).as("err"),
      (col("scale8") / lit(127f)).as("bound"))
      .filter(col("err") > col("bound")).count()
    assert(worst == 0)
    // zero vector: scale 0, all-zero codes, no NaN
    val z = q.filter(col("vec_id") === 99999L)
      .select(col("scale8"), array_max(col("code8")).cast("int"))
      .as[(Float, Int)].head()
    assert(z == ((0f, 0)))
  }

  test("int8_dot kernel: exact integer dot on known codes") {
    val got = Seq((Seq(1.toByte, 2.toByte, 3.toByte), Seq(4.toByte, 5.toByte, 127.toByte)))
      .toDF("a", "b")
      .select(org.apache.spark.sql.graft.Bridge.column(graft.functions.Int8Dot(
        org.apache.spark.sql.graft.Bridge.expression(col("a")),
        org.apache.spark.sql.graft.Bridge.expression(col("b")))))
      .as[Long].head()
    assert(got == 4L + 10L + 381L)
  }

  test("lshTopKInt8 recall@5 vs float brute force (quantized re-rank)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5, Similarity.quantizedDot)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val int8 = Similarity.lshTopKInt8(queries, emb, 5, planes = 6,
      probeBits = 2, tables = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(int8).size.toDouble / exact.size
    // same candidate sets as the float lshTopK (recall 0.80); int8
    // re-ranking may flip near-ties only
    assert(recall >= 0.7, s"int8 recall@5 = $recall")
  }

  test("ivfTopK recall@5 vs brute force (seeded kmeans, clustered corpus)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, emb, 5, Similarity.quantizedDot)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nlist = 8, nprobe = 4, Similarity.quantizedDot)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall@5 = $recall")
  }

  test("lshBucket is deterministic and within [0, 2^planes)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val b1 = emb.select(Similarity.lshBucket(col("embedding"), 8)).as[Long].collect().toSeq
    val b2 = emb.select(Similarity.lshBucket(col("embedding"), 8)).as[Long].collect().toSeq
    assert(b1 == b2)
    assert(b1.forall(b => b >= 0 && b < 256))
  }
}
