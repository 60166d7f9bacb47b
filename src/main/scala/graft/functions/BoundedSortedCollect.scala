package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

/** Mutable buffer for [[BoundedSortedCollect]]: the collected values plus a
  * sticky overflow flag. Once `overflowed` is set, `values` is EMPTY (the
  * backing array released, not just cleared) and stays empty — an over-cap
  * group costs O(1) memory for the rest of its task, not O(group size). */
final class BoundedCollectBuffer(
    var values: ArrayBuffer[Any],
    var overflowed: Boolean)

/** `array_sort(collect_list(child))` fused with the `[minSize, cap]` size
  * filter, with the cap enforced DURING aggregation instead of after it.
  *
  * Exists for the dedup tier's hot-key drop contract (jaccard's
  * `maxShingleFreq`, LSH's `maxBucketSize`): the plain
  * `collect_list → filter(size ≤ cap)` formulation materializes a hot key's
  * FULL posting list in one in-memory aggregation buffer before the filter
  * can drop it — a stopword shingle with df in the tens of millions is a
  * multi-hundred-MB `ArrayBuffer` in one task (sort-based object-aggregate
  * fallback processes one group at a time, but one group is enough), the
  * exact scenario the cap exists to prevent. Here the buffer tops out at
  * `cap` elements: element `cap + 1` flips the buffer to a permanent
  * overflow marker and RELEASES the backing array, so over-cap keys are
  * dropped before their memory — not just their pairs — materializes. The
  * partial-aggregation (map-side combine) buffers carry the same bound, and
  * `merge` propagates the marker without re-accumulating.
  *
  * Output contract (exactly the fused formulation's, spec-pinned against it
  * in `BoundedSortedCollectSpec`):
  *   - NULL inputs are skipped (as `collect_list` does);
  *   - groups with fewer than `minSize` or more than `cap` non-null values
  *     evaluate to NULL (callers drop with one `isNotNull` filter);
  *   - surviving groups evaluate to the ascending-sorted value array
  *     (`TypeUtils.getInterpretedOrdering` — field-by-field for structs,
  *     the same total order `array_sort`'s default comparator applies).
  *
  * Plans through `ObjectHashAggregateExec` like `collect_list`; the
  * serialize/deserialize round-trip (spill + partial→final exchange) uses
  * the same `UnsafeProjection`-over-`ArrayType` encoding as Spark's own
  * `Collect` (spark/sql/catalyst/expressions/aggregate/collect.scala),
  * prefixed with the overflow flag so a spilled over-cap marker stays
  * O(1) bytes. */
case class BoundedSortedCollect(
    child: Expression,
    minSize: Int,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectBuffer] with UnaryLike[Expression] {

  require(minSize >= 0, s"minSize must be >= 0, got $minSize")
  // cap may be ANY Int: a non-positive cap makes every non-empty group
  // overflow on its first value (update's length >= cap check) and so
  // evaluate to NULL — exactly the empty result the unfused
  // collect_list → size-filter formulation (and the dedup operators'
  // `join` strategy) produce for the same argument; rejecting it here
  // would make the two strategies diverge (exception vs empty) on
  // identical inputs

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_sorted_collect"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(ArrayBuffer.empty[Any], overflowed = false)

  private def overflow(buffer: BoundedCollectBuffer): BoundedCollectBuffer = {
    buffer.overflowed = true
    // drop the reference, don't clear in place: clearAndShrink keeps a
    // 16-slot stub but an over-cap buffer's old backing array (up to cap
    // slots) must become collectable immediately
    buffer.values = ArrayBuffer.empty[Any]
    buffer
  }

  override def update(
      buffer: BoundedCollectBuffer, input: InternalRow): BoundedCollectBuffer = {
    if (buffer.overflowed) return buffer
    val v = child.eval(input)
    if (v != null) {
      if (buffer.values.length >= cap) return overflow(buffer)
      // the evaluated value may be a pointer into a reused unsafe row
      buffer.values += InternalRow.copyValue(v)
    }
    buffer
  }

  override def merge(
      buffer: BoundedCollectBuffer, other: BoundedCollectBuffer): BoundedCollectBuffer = {
    if (buffer.overflowed) return buffer
    if (other.overflowed ||
      buffer.values.length.toLong + other.values.length.toLong > cap.toLong) {
      return overflow(buffer)
    }
    buffer.values ++= other.values
    buffer
  }

  override def eval(buffer: BoundedCollectBuffer): Any = {
    // the length > cap arm is reachable only for cap <= 0 (overflow
    // fires before length can exceed a positive cap): an all-null group
    // never overflows yet its empty array must still fail a negative cap,
    // as the unfused size filter does
    if (buffer.overflowed || buffer.values.length < minSize || buffer.values.length > cap) null
    else {
      val arr = buffer.values.toArray
      java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]],
        ordering.asInstanceOf[Ordering[AnyRef]])
      new GenericArrayData(arr)
    }
  }

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](BooleanType, dataType))

  override def serialize(buffer: BoundedCollectBuffer): Array[Byte] = {
    val arr = new GenericArrayData(buffer.values.toArray)
    serProjection.apply(InternalRow(buffer.overflowed, arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buffer = createAggregationBuffer()
    buffer.overflowed = row.getBoolean(0)
    if (!buffer.overflowed) {
      row.getArray(1).foreach(child.dataType, (_, v: Any) => buffer.values += v)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedCollect =
    copy(child = newChild)
}
