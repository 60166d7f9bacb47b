package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the canonical-document
  * assignment step a dedup pipeline runs AFTER near-dup pair mining
  * (pairs from [[Dedup.simhashNearDupPairs]] / [[Dedup.minhashNearDupPairs]]
  * are edges; each document keeps the minimum doc id of its component as
  * its canonical representative).
  *
  * TWO execution paths behind one contract, picked by measured edge count:
  *
  *   - **Single-task union-find** (edge count ≤ `localEdgeThreshold`). The
  *     dup-pair graph is PAIR-sized, orders of magnitude smaller than the
  *     corpus — banded LSH/SimHash mining bounds pair mass by design, so
  *     even a 100 TB corpus yields an edge list (16 bytes/edge) that fits
  *     one executor core comfortably at the default 10M-edge threshold
  *     (~160 MB). Disjoint-set with path compression in one task is
  *     O(E·α(E)) and collapses ALL iteration latency into one job — no
  *     convergence rounds, no per-round shuffles. This is NOT driver-side
  *     collect: the fold runs inside a task on an executor; only the
  *     (touched-vertex, component) table comes back as a DataFrame.
  *
  *   - **Distributed min-label propagation** (above threshold). Each round
  *     is one edge join + one min-aggregate + a path-halving pointer jump;
  *     labels only ever decrease, so sum(label) strictly decreases until
  *     the fixpoint and convergence is one scalar aggregate per round-pair
  *     (rounds run in fused pairs: monotonicity makes sum(t+2)==sum(t)
  *     imply the fixpoint, halving the scheduled-job count). Per-round
  *     lineage is truncated lazily (localCheckpoint, or reliable
  *     `checkpoint` when `checkpointDir` is set), the per-round shuffle is
  *     edge-sized, and nothing reaches the driver but the scalar.
  *
  * Either way, isolated vertices (the overwhelming corpus majority) never
  * enter the component computation — they are attached by one final
  * left join, keeping the heavy path pair-sized at any scale.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** → (id, component_id = min reachable id). `vertices` must have column
    * `id`; `edges` columns `src`/`dst` (undirected: both orientations are
    * generated internally). Isolated vertices keep their own id.
    *
    * @param localEdgeThreshold run the single-task union-find when the
    *        symmetrized edge list has at most this many rows. At the 10M
    *        default the one task streams a ~160 MB edge list and holds a
    *        disjoint-set map for up to 20M touched vertices — on the order
    *        of 1-2 GB of primitive-array state, inside a normally-sized
    *        executor; lower the threshold for small executors. Set 0 to
    *        force the distributed loop (the specs do, to pin both paths
    *        against each other).
    * @param checkpointDir when set, per-round state in the distributed
    *        path is checkpointed reliably under this fault-tolerant path
    *        (HDFS/S3 on a real cluster; the reliable write is one extra
    *        recompute of the round's edge join — the price of surviving
    *        executor loss). When None (default), storage-local
    *        `localCheckpoint` — fastest, but lost blocks kill the job.
    *        NOTE `unpersist()` does NOT delete reliable checkpoint data —
    *        the loop cleans up after itself instead: each invocation
    *        checkpoints into its own fresh subdirectory of `checkpointDir`
    *        (path logged at INFO) and deletes every finished round's
    *        snapshot as soon as the following round has materialized, so
    *        at most three snapshots (edges, previous labels, current
    *        labels) are ever alive. The LAST snapshot outlives the call on
    *        purpose — the returned DataFrame is lazy and may recompute
    *        from it; remove the logged subdirectory after consuming the
    *        result, or run with
    *        `spark.cleaner.referenceTracking.cleanCheckpoints=true`.
    *        Checkpoint placement is a SparkContext-GLOBAL setting, so
    *        reliable mode claims it for the duration of the call (the
    *        previous value is restored before returning) — concurrent
    *        reliable-mode invocations on one SparkContext are NOT
    *        supported; run them serially or give each its own session's
    *        context.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None,
      localEdgeThreshold: Long = 10000000L): DataFrame = {
    val sc = vertices.sparkSession.sparkContext
    // save the RAW checkpoint dir: setCheckpointDir appends a UUID segment
    // on every call, so restoring through the public setter would nest the
    // caller's dir one level deeper — the CoreBridge accessors restore the
    // exact prior value
    val prevCkptDir = org.apache.spark.graft.CoreBridge.getCheckpointDirRaw(sc)
    // one unique subdirectory per invocation: round-cleanup may then
    // delete stale rdd-* dirs freely without touching anything another
    // (earlier or later) checkpoint user put under the same base path
    val ourDir = checkpointDir.map { base =>
      sc.setCheckpointDir(s"$base/cc")
      // setCheckpointDir appends its own random UUID segment — read the
      // REAL directory back so per-round pruning lists the right path
      val d = sc.getCheckpointDir.get
      log.info(s"reliable round checkpoints under $d — " +
        "remove after consuming the result")
      d
    }
    try {
      // Truncation with a RELEASE handle. Local mode checkpoints the
      // InternalRow RDD directly (rows copied — toRdd reuses row buffers)
      // so the storage blocks can actually be freed per round:
      // Dataset.localCheckpoint hides its RDD and Dataset.unpersist only
      // consults the CacheManager, which never registered it. Lazy in both
      // modes — the next action both computes and truncates in one job.
      def snap(df: DataFrame): Snap =
        if (checkpointDir.isDefined) Snap(df.checkpoint(eager = false), () => ())
        else {
          val rdd = df.queryExecution.toRdd.map(_.copy())
          rdd.localCheckpoint()
          Snap(
            org.apache.spark.sql.graft.Bridge.internalCreateDataFrame(
              df.sparkSession, rdd, df.schema),
            () => { rdd.unpersist(blocking = false); () })
        }
      // materialize the symmetrized edge set once: the path choice needs
      // its count, every propagation round joins against it, and the
      // caller's edge lineage (e.g. near-dup pair mining) must not
      // re-execute per use. Null endpoints are dropped up front — the old
      // propagation joins ignored them implicitly; the union-find
      // deserializer would throw on them.
      val symSnap = snap(
        edges.select(col("src").cast("long"), col("dst").cast("long"))
          .filter(col("src").isNotNull && col("dst").isNotNull)
          .union(edges.select(col("dst").cast("long").as("src"), col("src").cast("long").as("dst"))
            .filter(col("src").isNotNull && col("dst").isNotNull)))
      val sym = symSnap.df
      val symCount = sym.count() // the one materializing action for sym
      val labels =
        if (symCount <= localEdgeThreshold) localUnionFind(sym)
        else {
          // the loop's final labels are themselves truncated, so the edge
          // blocks can be released as soon as the iteration is done; the
          // union-find path stays lazy over sym and must keep them
          val l = distributedLabels(sym, snap, maxIter, ourDir)
          symSnap.release()
          l
        }
      vertices.select(col("id"))
        .join(labels.withColumnRenamed("id", "__lid"), col("id") === col("__lid"), "left")
        .select(col("id"),
          coalesce(col("comp"), col("id").cast("long")).as("component_id"))
    } finally {
      // every .checkpoint() call in this invocation has already captured
      // its placement, so restoring here is safe even though the returned
      // frame is still lazy
      if (checkpointDir.isDefined)
        org.apache.spark.graft.CoreBridge.setCheckpointDirRaw(sc, prevCkptDir)
    }
  }

  /** A truncated frame plus the handle that frees its storage blocks —
    * no-op in reliable mode, where state lives in (separately pruned)
    * checkpoint files rather than executor storage. */
  private final case class Snap(df: DataFrame, release: () => Unit)

  /** Below-threshold path: the whole edge list through ONE task's
    * disjoint-set forest (path compression + min-root union, so the root
    * IS the min reachable id — deterministic under any edge order). */
  private def localUnionFind(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("src"), col("dst")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // compress the walked path onto the root
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          if (!parent.contains(r)) parent(r) = r // register roots as touched
          r
        }
        it.foreach { case (s, d) =>
          val rs = find(s); val rd = find(d)
          if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
        }
        // snapshot the keys as one primitive array (8 B/vertex), then
        // STREAM the (id, root) rows — materializing boxed tuples for all
        // touched vertices at once would multiply the task's memory. The
        // final find() calls only compress values (every chain ends at an
        // already-registered root), so iterating over the snapshot while
        // the map's values update is safe.
        val ks = parent.keysIterator.toArray
        ks.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "comp")
  }

  /** Delete every rdd-* snapshot under this loop's PRIVATE checkpoint
    * subdirectory except the lowest id (the edge set — joined every round)
    * and the highest (the labels that just materialized). Checkpoint rdd
    * ids are assigned in creation order and this loop creates its frames
    * strictly sequentially, so everything between the two is a finished
    * round's state that nothing can read again. */
  private def pruneCheckpoints(sc: org.apache.spark.SparkContext, dir: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(path)) {
      val rdds = fs.listStatus(path).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("rdd-"))
        .sortBy(_.getPath.getName.stripPrefix("rdd-").toLong)
      rdds.drop(1).dropRight(1).foreach(s => fs.delete(s.getPath, true))
    }
  }

  /** Above-threshold path: fused-pair min-label propagation (see object
    * doc). Returns (id, comp) for every edge-touched vertex. */
  private def distributedLabels(
      sym: DataFrame, snap: DataFrame => Snap, maxIter: Int,
      reliableDir: Option[String]): DataFrame = {
    // initial label = min(id, min neighbor): exactly what round 1 would
    // compute from identity labels, for the cost of ONE aggregate instead
    // of a join + aggregate — the distinct() is folded into the groupBy
    var labels = snap(
      sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).cast("long").as("comp"))
        .select(col("src").as("id"), col("comp")))
    // coalesce: sum over an empty active set (no edges at all) is NULL
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    // one label-propagation round (edge join + min-aggregate + path
    // halving), as a PLAN — composition decides how many rounds share a
    // job. Path halving: comp ← label(comp). Every label is a vertex id,
    // so the self-join always matches; with it the min label travels 2^i
    // hops by round i — convergence in O(log diameter) rounds instead of
    // O(diameter) on long chains. (Measured at sf0.1: a SECOND jump per
    // round does not cut rounds further, and dropping the jump entirely
    // trades 2 fewer exchanges/round for ~20% more rounds — a wash there,
    // so the worst-case-safe single jump stays.)
    def round(cur: DataFrame): DataFrame = {
      val msgs = cur.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("comp"))
      val prop = msgs.union(cur)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
      prop
        .join(prop.select(col("id").as("__cid"), col("comp").as("__ccomp")),
          col("comp") === col("__cid"), "left")
        .select(col("id"), coalesce(col("__ccomp"), col("comp")).as("comp"))
    }
    var prevSum = labelSum(labels.df)
    var converged = false
    var i = 0
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    while (!converged && i < maxIter) {
      // Fuse TWO rounds into ONE job: labels only ever decrease, so
      // checking convergence after a round-PAIR is safe (at worst one
      // no-op round of extra shuffle work) and halves the scheduled-job
      // count. The intermediate round is PERSISTED (Dataset.persist, not
      // checkpointed): its subtree is referenced up to four times by the
      // outer round's plan (edge join, union, both sides of the
      // path-halving self-join), and the cache makes those references hit
      // the intermediate's blocks within the same job instead of
      // re-executing the inner joins per reference — in BOTH modes
      // (a lazily-marked reliable checkpoint is never written for an
      // intermediate and does not persist anything by itself).
      val steps = math.min(2, maxIter - i)
      val mid = if (steps == 2) Some(round(labels.df).persist()) else None
      val next = snap(round(mid.getOrElse(labels.df)))
      // the ONE action of the round-pair: computes both rounds, persists
      // the truncation blocks, and returns the convergence scalar
      val s = labelSum(next.df)
      labels.release() // frees the previous round's storage blocks
      mid.foreach(_.unpersist()) // next's own blocks are live; mid's aren't
      // reliable mode: also delete the finished rounds' snapshot FILES —
      // unpersist() never does, and a long convergence would otherwise
      // retain one vertex-sized snapshot per round in the fault-tolerant
      // store. `next` just materialized, so everything between the edge
      // set and it is dead.
      reliableDir.foreach(pruneCheckpoints(sym.sparkSession.sparkContext, _))
      labels = next
      converged = s == prevSum
      prevSum = s
      i += steps
      if (dbg) println(s"[cc] round $i sum=$s")
    }
    // the FINAL labels' storage intentionally stays alive — the caller's
    // returned frame is lazy and reads it
    labels.df
  }
}
