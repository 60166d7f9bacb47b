package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built, serialized Bloom filter — the
  * probe side of [[graft.operators.BloomJoin]].
  *
  * The filter rides in the expression as its serialized bytes (so the
  * expression tree stays plain-serializable to executors) and is
  * deserialized once per task via a transient lazy val; generated code
  * references the deserialized object directly (`addReferenceObj`, the
  * same pattern Spark's internal runtime-filter `BloomFilterMightContain`
  * uses), so the probe is a single virtual call inside whole-stage
  * codegen — no per-row deserialization, no UDF.
  *
  * The child must already be a 64-bit hash of the join key (the operator
  * uses `xxhash64`); the filter must have been populated with the same
  * hash. Bloom semantics: `false` is authoritative (never a false
  * negative), `true` means "maybe" — callers must confirm positives
  * exactly if exactness is required.
  */
case class BloomContains(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains probes a LONG key (hash the value first, e.g. xxhash64), " +
        s"got ${other.catalogString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(filterBytes)

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}
