package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** SpaceSaving (Metwally et al.) stream summary: tracks at most
  * `capacity` items; when full, the minimum-count item is evicted and
  * its count inherited (recorded as `err`), so every tracked count is
  * an UPPER bound on the true frequency and `count - err` a lower
  * bound. Any item with true frequency > n/capacity is guaranteed
  * present. Eviction scans the map (O(capacity)); capacity is small
  * (k × factor), so the scan is sub-microsecond — a Stream-Summary
  * linked-list layout is the upgrade path if capacity ever grows
  * into the tens of thousands.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = mutable.HashMap.empty[String, (Long, Long)] // item -> (count, err)

  private def evictMin(): Long = {
    val (minItem, (minC, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
    counts.remove(minItem)
    minC
  }

  def add(item: String, weight: Long = 1L): Unit =
    counts.get(item) match {
      case Some((c, e)) => counts.update(item, (c + weight, e))
      case None if counts.size < capacity => counts.update(item, (weight, 0L))
      case None =>
        val minC = evictMin()
        counts.update(item, (minC + weight, minC))
    }

  /** Merge preserving the overestimate invariant: inserts that evict
    * inherit the evicted minimum into BOTH count and err, exactly as
    * `add` does — re-inserting without inheritance would silently
    * underestimate items whose mass was evicted earlier, letting a
    * true heavy hitter rank below lighter items.
    */
  def mergeIn(other: SpaceSavingBuffer): Unit =
    other.counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.foreach {
      case (item, (c, e)) =>
        counts.get(item) match {
          case Some((c0, e0)) => counts.update(item, (c0 + c, e0 + e))
          case None if counts.size < capacity => counts.update(item, (c, e))
          case None =>
            val minC = evictMin()
            counts.update(item, (minC + c, minC + e))
        }
    }
}

/** Aggregate expression: top-k frequent items of a string column via
  * a fixed-memory SpaceSaving sketch — the `TypedImperativeAggregate`
  * extension layer (mutable buffer, partial→final merge), for when an
  * exact `groupBy(item).count` would shuffle billions of distinct
  * keys just to read off the head. Returns
  * array<struct<item,count,err>> sorted by count desc (deterministic
  * item tie-break); `count - err` is a lower bound on the true
  * frequency.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacityFactor: Int = 8,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  private def capacity: Int = k * capacityFactor

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"approx_top_k requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType),
    StructField("err", LongType))))

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.counts.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }
      .take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e)
      }
    new GenericArrayData(top)
  }

  // length-prefixed UTF-8 framing (writeUTF would throw above 64 KB
  // per item — long tracked values are legitimate for this API)
  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (item, (c, e)) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong(); val e = in.readLong()
      buf.counts.update(new String(b, "UTF-8"), (c, e))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)
  override def prettyName: String = "approx_top_k"
}

object SpaceSavingTopK {
  /** Column face: approximate top-k frequent values of a string column. */
  def approx_top_k(c: Column, k: Int, capacityFactor: Int = 8): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SpaceSavingTopK(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        k, capacityFactor).toAggregateExpression())
}
