package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable streaming-quantile sketches (KLL — Karnin, Lang,
  * Liberty, FOCS 2016) over the DataSketches library, exposed as the
  * same agg/union/extract trio Spark ships for HLL
  * (hll_sketch_agg / hll_union_agg / hll_sketch_estimate):
  *
  *  - [[KllQuantiles.kll_sketch_agg]]: double column → sketch bytes
  *  - [[KllQuantiles.kll_merge_agg]]:  sketch-bytes column → merged
  *    sketch bytes (the distributive union — per-shard sketches built
  *    independently combine into the corpus sketch without touching
  *    raw values again)
  *  - [[KllQuantiles.kll_quantiles]]:  sketch bytes × ranks → values
  *
  * WHY at 100 TB: exact quantiles (q_percentile) globally sort the
  * column — a full-data range shuffle; a KLL sketch is O(k·log n)
  * memory (~3 KB at k=200), map-side combinable, and PERSISTABLE:
  * write per-partition/per-day sketch bytes once, answer any later
  * quantile query (or any rollup across sources/days) by merging
  * kilobytes, the same lifecycle as the q_hll_union distinct
  * sketches. Normalized rank error at k=200 is ≤ ~1.65% (99% conf,
  * the library's published bound) — SketchQueries' spec pins it.
  *
  * Compaction is randomized (the KLL coin flip), so results are
  * sketch-run-dependent: rows-only at the gate, tolerance-pinned in
  * the spec — the q_approx_distinct/q_hll_union discipline.
  */
object KllQuantiles {
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      KllSketchAgg(org.apache.spark.sql.graftbridge.Bridge.expression(c), k)
        .toAggregateExpression())

  def kll_merge_agg(c: Column, k: Int = 200): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      KllMergeAgg(org.apache.spark.sql.graftbridge.Bridge.expression(c), k)
        .toAggregateExpression())

  def kll_quantiles(sketch: Column, ranks: Seq[Double]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      KllQuantilesAt(
        org.apache.spark.sql.graftbridge.Bridge.expression(sketch), ranks))
}

/** Shared buffer: a heap KLL doubles sketch. Empty sketches
  * serialize/heapify fine (DataSketches handles the empty preamble).
  */
private[plans] object KllBuf {
  def empty(k: Int): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)
  def from(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregate: doubles → KLL sketch bytes. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a double argument, got ${child.dataType}")

  override def createAggregationBuffer(): KllDoublesSketch = KllBuf.empty(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllBuf.from(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** Aggregate: KLL sketch bytes → merged sketch bytes (union). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a binary sketch argument, got ${child.dataType}")

  override def createAggregationBuffer(): KllDoublesSketch = KllBuf.empty(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllBuf.from(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllBuf.from(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_merge_agg"
}

/** Scalar: quantile values at the given ranks from sketch bytes.
  * CodegenFallback is deliberate — this evaluates once per OUTPUT
  * group (a handful of rows after aggregation), never in a scan.
  */
case class KllQuantilesAt(child: Expression, ranks: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a binary sketch argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val sk = KllBuf.from(input.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else new GenericArrayData(ranks.map(r => sk.getQuantile(r)).toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAt =
    copy(child = newChild)
  override def prettyName: String = "kll_quantiles"
}
