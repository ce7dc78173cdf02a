package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** collect_list for long keys with a HARD per-group element cap
  * (round 19, the sharedShingleEdges one-scan rewrite): append stops
  * at `limit`, so a degenerate group (a boilerplate shingle held by
  * the whole corpus) buffers at most `limit` longs per aggregation
  * buffer instead of a corpus-sized array — the exact unbounded-
  * collect hazard the former stats-then-semi-join two-pass shape
  * existed to avoid. Callers size `limit` ABOVE their survivor bound
  * (e.g. maxDf + 1): any group whose true cardinality is ≤ limit − 1
  * collects COMPLETELY (partials can only under-fill; merge
  * concatenates then re-caps), so for groups that pass a
  * `count ≤ limit − 1` filter the result is element-equal to
  * collect_list up to order — and the collect_list order was never
  * deterministic to begin with (ArrayPairsSpec's longPairs consumers
  * are order-insensitive by value). Groups OVER the cap return a
  * truncated array; pair the aggregate with an exact count() in the
  * same groupBy and filter on that.
  */
case class BoundedCollectLong(child: Expression, limit: Int,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Long]] {
  require(limit > 0, "bounded_collect_long limit must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long requires a long argument, got $other")
  }
  override def children: Seq[Expression] = child :: Nil
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_long"

  override def createAggregationBuffer(): ArrayBuffer[Long] = ArrayBuffer.empty

  override def update(buffer: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buffer.length < limit) {
      val v = child.eval(input)
      if (v != null) buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(buffer: ArrayBuffer[Long], other: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (buffer.length < limit && i < other.length) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: ArrayBuffer[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLong =
    copy(child = newChildren.head)
}

object BoundedCollect {
  def boundedCollectLong(child: Column, limit: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BoundedCollectLong(
        org.apache.spark.sql.graftbridge.Bridge.expression(child), limit)
        .toAggregateExpression())
}
