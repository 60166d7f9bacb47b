package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the canonical-document
  * assignment step a dedup pipeline runs AFTER near-dup pair mining
  * (pairs from [[Dedup.simhashNearDupPairs]] / [[Dedup.minhashNearDupPairs]]
  * are edges; each document keeps the minimum doc id of its component as
  * its canonical representative).
  *
  * Algorithm: synchronous min-label propagation. Each round is ONE edge
  * join + ONE min-aggregate (labels only ever decrease); rounds needed =
  * graph diameter, which for near-dup clusters is small (dup families are
  * dense — transitively-similar chains longer than a few hops are rare).
  * Convergence is detected from sum(label), which strictly decreases until
  * the fixpoint — one scalar aggregate, no old-vs-new join. Rounds run in
  * FUSED PAIRS (two propagation rounds per scheduled job): labels are
  * monotone, so sum(t+2)==sum(t) implies the fixpoint, and pairing halves
  * the driver job-scheduling latency that dominates at small scale.
  *
  * Scale notes: per-round lineage is truncated (localCheckpoint by default,
  * reliable `checkpoint` against a fault-tolerant store when
  * `checkpointDir` is set — an executor loss mid-iteration then resumes
  * from the last round instead of failing the job). Truncation is LAZY in
  * both modes: the convergence aggregate is the materializing action, so a
  * round schedules one job, not two. The per-round shuffle is edge-sized,
  * the state is vertex-sized; nothing is ever collected to the driver
  * except the one convergence scalar.
  */
object Components {

  /** → (id, component_id = min reachable id). `vertices` must have column
    * `id`; `edges` columns `src`/`dst` (undirected: both orientations are
    * generated internally). Isolated vertices keep their own id.
    *
    * @param checkpointDir when set, per-round state is checkpointed
    *        reliably under this fault-tolerant path (HDFS/S3 on a real
    *        cluster; the reliable write is one extra recompute of the
    *        round's edge join — the price of surviving executor loss).
    *        When None (default), storage-local `localCheckpoint` — fastest,
    *        but lost blocks kill the job.
    *        NOTE `unpersist()` does NOT delete reliable checkpoint data, so
    *        a long convergence loop retains one vertex-sized snapshot per
    *        checked round in the fault-tolerant store. Run with
    *        `spark.cleaner.referenceTracking.cleanCheckpoints=true` so the
    *        ContextCleaner deletes each round's files once its Dataset is
    *        garbage-collected (the loop drops its reference every round);
    *        otherwise clean `checkpointDir` after the job.
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    checkpointDir.foreach(vertices.sparkSession.sparkContext.setCheckpointDir)
    // lazy in both modes — the next action on the result both computes it
    // and truncates its lineage in the same job
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = false)
      else df.localCheckpoint(eager = false)
    // materialize the symmetrized edge set once: every round joins against
    // it, and the caller's edge lineage (e.g. near-dup pair mining) must
    // not re-execute per iteration
    val sym = truncate(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    // Only vertices that appear in an edge can ever change label — the
    // iteration runs over those alone. In a dedup pipeline the touched set
    // is pair-sized while `vertices` is corpus-sized; isolated docs (the
    // overwhelming majority at 100 TB) never enter the loop and are
    // attached by the single final left join below.
    // initial label = min(id, min neighbor): exactly what round 1 would
    // compute from identity labels, for the cost of ONE aggregate instead
    // of a join + aggregate — the distinct() is folded into the groupBy
    var labels = truncate(
      sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).cast("long").as("comp"))
        .select(col("src").as("id"), col("comp")))
    // coalesce: sum over an empty active set (no edges at all) is NULL
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head().getLong(0)
    // one label-propagation round (edge join + min-aggregate + path
    // halving), as a PLAN — composition decides how many rounds share a job.
    // Path halving: comp ← label(comp). Every label is a vertex id, so the
    // self-join always matches; with it the min label travels 2^i hops by
    // round i — convergence in O(log diameter) rounds instead of
    // O(diameter) (near-dup chains measured diameter ~8 at sf0.01).
    // A second jump per round was measured (chain-y τ-threshold graphs,
    // sf0.1): it does NOT cut the round count — propagation there is
    // edge-hop-bound through min-aggregates, not pointer-chain-bound —
    // so the leaner single-jump round stays.
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
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    while (!converged && i < maxIter) {
      // Fuse TWO rounds into ONE job: labels only ever decrease, so checking
      // convergence after a round-PAIR is safe (at worst one no-op round of
      // extra shuffle work) and halves the per-round driver job-scheduling
      // latency that dominates these iteration-bound queries at test scale —
      // the shuffles themselves are edge-sized either way. The intermediate
      // round is NOT truncated; a two-round lineage per checkpoint is fine.
      val steps = math.min(2, maxIter - i)
      val next = truncate(if (steps == 2) round(round(labels)) else round(labels))
      // the ONE action of the round-pair: computes the labels, persists the
      // truncation blocks, and returns the convergence scalar
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      i += steps
      if (dbg) println(s"[cc] round $i sum=$s")
    }
    vertices.select(col("id"))
      .join(labels.withColumnRenamed("id", "__lid"), col("id") === col("__lid"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id").cast("long")).as("component_id"))
  }
}
