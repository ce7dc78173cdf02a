package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Second-moment sufficient statistics of a vector column in ONE
  * pass: count n, per-dimension sums Σx, and the upper triangle of
  * the Gram matrix Σxxᵀ. The covariance (and from it the PCA
  * spectrum) is pure driver-side arithmetic on this fixed-size
  * summary — cov = (G − n·μμᵀ)/(n−1) — so a 100 TB embedding table
  * reduces to d + d(d+1)/2 doubles with map-side combine and a
  * one-row shuffle, the same shape as [[graft.queries]]' ridge Gram
  * sums (GovernanceQueries q_ridge_regress) but over the vector
  * column itself.
  *
  * Buffer layout: n (long), skipped (long), sum[d], gram[d(d+1)/2]
  * (row-major upper triangle, g(i,j) at i*d − i(i−1)/2 + (j−i) for
  * i ≤ j). `skipped` counts null / wrong-length inputs, so partial
  * coverage is observable downstream instead of silently computing a
  * spectrum over a subset (a d=64 call on a table mixing 64- and
  * 128-wide rows must not LOOK complete).
  */
final class GramBuffer(val dim: Int) {
  var n: Long = 0L
  var skipped: Long = 0L
  val sum = new Array[Double](dim)
  val gram = new Array[Double](dim * (dim + 1) / 2)

  def add(v: Array[Double]): Unit = {
    n += 1
    var i = 0
    var t = 0
    while (i < dim) {
      val vi = v(i)
      sum(i) += vi
      var j = i
      while (j < dim) {
        gram(t) += vi * v(j)
        t += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeIn(o: GramBuffer): Unit = {
    n += o.n
    skipped += o.skipped
    var i = 0
    while (i < sum.length) { sum(i) += o.sum(i); i += 1 }
    var t = 0
    while (t < gram.length) { gram(t) += o.gram(t); t += 1 }
  }
}

/** Aggregate expression over an `array<float>`/`array<double>` column
  * of fixed length `dim`; returns struct<n: long, skipped: long,
  * s: array<double>, g: array<double>> — the sufficient statistics
  * for covariance/PCA. Rows whose array is null or of the wrong
  * length are counted in `skipped`, never silently dropped (the
  * caller decides whether a nonzero count is an error; EmbedStats
  * refuses).
  *
  * Memory law: the aggregation buffer is d + d(d+1)/2 doubles —
  * ~4.2 MB per task at d = 1024, but ~67 MB at d = 4096, where
  * serialize/merge would dominate the pass. [[GramSketch.MaxDim]]
  * refuses wide vectors loudly; embeddings wider than the ceiling
  * need a banded (per-dimension-block) or two-pass formulation, not
  * this one-buffer sketch.
  */
case class GramSketch(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  require(dim >= 1 && dim <= GramSketch.MaxDim,
    s"gram_sketch dim=$dim outside [1, ${GramSketch.MaxDim}]: the agg buffer " +
      "is d(d+1)/2 doubles (~67 MB per task at d=4096) and merge/serialize " +
      "dominate past the ceiling — use a banded per-dimension-block or " +
      "two-pass covariance for wider embeddings")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  private lazy val elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => other // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_sketch requires array<float|double>, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("skipped", LongType),
    StructField("s", ArrayType(DoubleType)),
    StructField("g", ArrayType(DoubleType))))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    val arr = if (v == null) null else v.asInstanceOf[ArrayData]
    if (arr != null && arr.numElements() == dim) {
      val d = new Array[Double](dim)
      var i = 0
      if (elementType == FloatType) {
        while (i < dim) { d(i) = arr.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < dim) { d(i) = arr.getDouble(i); i += 1 }
      }
      buf.add(d)
    } else {
      buf.skipped += 1
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: GramBuffer): Any =
    InternalRow(buf.n, buf.skipped,
      new GenericArrayData(buf.sum.map(x => x: Any)),
      new GenericArrayData(buf.gram.map(x => x: Any)))

  override def serialize(buf: GramBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.n)
    out.writeLong(buf.skipped)
    buf.sum.foreach(out.writeDouble)
    buf.gram.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramBuffer(in.readInt())
    buf.n = in.readLong()
    buf.skipped = in.readLong()
    var i = 0
    while (i < buf.sum.length) { buf.sum(i) = in.readDouble(); i += 1 }
    var t = 0
    while (t < buf.gram.length) { buf.gram(t) = in.readDouble(); t += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "gram_sketch"
}

object GramSketch {
  /** Widest vector the one-buffer sketch accepts: d + d(d+1)/2
    * doubles is ~4.2 MB per task buffer here — the knee before
    * serialize/merge dominate (see class scaladoc).
    */
  val MaxDim = 1024

  /** Column face: one-pass second-moment summary of a vector column. */
  def gram_sketch(c: Column, dim: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      GramSketch(org.apache.spark.sql.graftbridge.Bridge.expression(c), dim)
        .toAggregateExpression())
}
