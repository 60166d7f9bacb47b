package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain, triangle, isolated vertex") {
    // components: {1,2,3,4} (a chain — needs >1 propagation round),
    // {10,11,12} (a triangle), {20} (isolated)
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 3L), (3L, 4L), (1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    val got = Components.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L))
  }

  test("connected components: long path converges within maxIter (distributed path)") {
    // a 12-vertex path: min label must travel the full diameter.
    // localEdgeThreshold = 0 forces the distributed propagation loop —
    // the default would solve this in the single-task union-find.
    val n = 12
    val vertices = (1L to n.toLong).toDF("id")
    val edges = (1L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(vertices, edges, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
  }

  test("connected components ≡ union-find (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 14)
      m <- Gen.choose(0, 20)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
    } yield (n, es.filter(e => e._1 != e._2))
    val prop = Prop.forAll(gen) { case (n, es) =>
      // BOTH execution paths against the same oracle: the default
      // single-task union-find and the forced distributed loop
      val gotLocal = Components.connectedComponents(
        (1L to n.toLong).toDF("id"), es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val gotDist = Components.connectedComponents(
        (1L to n.toLong).toDF("id"), es.toDF("src", "dst"), localEdgeThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      // union-find oracle
      val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      val expected = (1L to n.toLong).map { v =>
        v -> (1L to n.toLong).filter(u => find(u) == find(v)).min
      }.toMap
      gotLocal == expected && gotDist == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("connected components: reliable-checkpoint mode gives identical labels") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((2L, 3L), (3L, 4L), (1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("src", "dst")
    // threshold 0: reliable checkpointing is a distributed-loop concern
    val got = Components.connectedComponents(
      vertices, edges, checkpointDir = Some(dir), localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L))
    // the reliable path actually wrote round state under the dir
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter((p: java.nio.file.Path) => java.nio.file.Files.isRegularFile(p))
      .count()
    assert(wrote > 0)
  }

  test("reliable mode prunes finished rounds: at most 3 snapshots survive a long loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_prune").toString
    // a 40-vertex path needs several fused round-pairs even with halving —
    // without pruning this retains one vertex snapshot per checked round
    val n = 40
    val vertices = (1L to n.toLong).toDF("id")
    val edges = (1L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(
      vertices, edges, checkpointDir = Some(dir), localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
    val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter((p: java.nio.file.Path) =>
        java.nio.file.Files.isDirectory(p) && p.getFileName.toString.startsWith("rdd-"))
      .count()
    // alive: the edge set + the final labels (+ at most the last mid,
    // whose prune ran before the final round materialized)
    assert(rddDirs > 0 && rddDirs <= 3, s"expected <=3 surviving snapshots, got $rddDirs")
  }

  test("connected components: empty edge set keeps every vertex its own component") {
    val vertices = Seq(5L, 6L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val got = Components.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }
}
