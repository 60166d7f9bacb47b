package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature computed PER ROW from a shingle-hash
  * array: mhᵢ = min over h of (aᵢ·h + bᵢ) mod 1e9+7, with the (aᵢ, bᵢ)
  * affine parameters from [[graft.operators.Dedup.minhashParams]]'s LCG walk
  * (re-derived here from (k, seed) so codegen needs only scalar constants).
  *
  * The signature is a pure function of one row's shingle set, so computing
  * it as an expression removes the explode → groupBy(min×k) shuffle the
  * aggregate formulation costs — at 100 TB that is a full-corpus shuffle
  * saved before LSH banding even starts.
  *
  * Returns NULL for an empty shingle array (no shingles → no signature),
  * matching the explode formulation where such docs simply vanish.
  */
object MinHashSigKernel {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Same constants as [[graft.operators.Dedup.minhashParams]] (kept in sync
    * by a DedupSpec identity check). */
  def params(k: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((k, seed), { key =>
      val (kk, s) = key
      var x = s
      def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffL; x }
      val as = new Array[Long](kk)
      val bs = new Array[Long](kk)
      var i = 0
      while (i < kk) {
        as(i) = next() % 100000 * 2 + 1
        bs(i) = next() % 1000000007L
        i += 1
      }
      (as, bs)
    })

  /** Null iff the input array is empty. */
  def eval(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val (as, bs) = params(k, seed)
    // normalize inputs into [0, Mod) ONCE: the affine product is only
    // overflow-safe for h < Mod (as ≤ 199999 ⇒ product < 2^48); the SQL
    // surface accepts ANY array<bigint> — e.g. shingle_hashes_wide_all's
    // ~2^60 keys — which previously wrapped negative and produced
    // deterministic-looking garbage signatures. For the standard
    // rolling-hash inputs (< Mod) the reduction is the identity, so
    // every oracle replay is unchanged.
    val hs = new Array[Long](n)
    var j0 = 0
    while (j0 < n) {
      val h = arr.getLong(j0) % RollingHash.Mod
      hs(j0) = if (h < 0) h + RollingHash.Mod else h
      j0 += 1
    }
    val mins = new Array[Any](k)
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (as(i) * hs(j) + bs(i)) % RollingHash.Mod
        if (v < m) m = v
        j += 1
      }
      mins(i) = m
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, k: Int, seed: Long = 42L) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> and k >= 1, got ${other.catalogString}")
  }
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    MinHashSigKernel.eval(input.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigKernel.eval($c, $k, ${seed}L);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
