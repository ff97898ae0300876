package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a HARD per-group buffer bound: keeps at most
  * `cap + 1` non-null child values per group (the +1 witnesses overflow:
  * `size(result) > cap` ⇔ the group exceeded the cap), dropping the rest
  * instead of growing.
  *
  * Exists because the built-in `collect_list` materializes the ENTIRE
  * group in the aggregation buffer before any `slice` can trim it — one
  * million-member identical-fingerprint group (web boilerplate) is an
  * OOM on whatever executor its partial buffers merge on. Bounding in
  * `update`/`merge` keeps the buffer O(cap) regardless of group size
  * while preserving map-side combine, which is what lets the banded
  * dedup guard carry group MEMBERSHIP through its one aggregation
  * shuffle instead of re-evaluating the (expensive: decode + hash)
  * input a second time for a membership join-back
  * ([[graft.operators.Dedup.bandedHammingPairsGuarded]]).
  *
  * Which elements survive an overflowing group is NOT defined (partial
  * buffers merge in shuffle order) — callers must treat an overflowed
  * array as a witness, not a sample. Non-overflowed groups (≤ cap) keep
  * every element, order unspecified.
  *
  * Serialization mirrors the built-in Collect: the buffer round-trips
  * through a single-column UnsafeRow holding an array of the child type.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length <= cap) {
      val value = child.eval(input)
      if (value != null) buffer += InternalRow.copyValue(value)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = (cap + 1) - buffer.length
    if (room > 0) buffer ++= other.take(room)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))
  private lazy val row = new UnsafeRow(1)

  override def serialize(obj: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(obj.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buffer = mutable.ArrayBuffer.empty[Any]
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buffer += v)
    buffer
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_collect_list"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
}
