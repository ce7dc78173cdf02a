package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen kernels for the bucket-pair hot path (optimization round
  * 18, guide §1.2 step 2): Spark's higher-order `transform`/`filter`/
  * `zip_with` evaluate their lambda per element through the
  * interpreted expression walker — inside the quadratic in-bucket
  * pair explode and the per-pair signature compare that interpretation
  * dominated the cluster-family queries (StageProfile: 8.5 s CPU for
  * 1.23 M pairs, 6.9 s for 14.8 k signature compares at sf0.1).
  * Each kernel computes values BIT-IDENTICAL to the HOF form it
  * replaces (pinned by ArrayPairsSpec).
  */
object ArrayPairs {

  /** ≡ flatten(transform(ms, a -> transform(filter(ms, b -> b > a),
    * b -> struct(a AS id_a, b AS id_b)))) for array<long> — every
    * ordered pair (a, b) with b > a, in the same nested iteration
    * order.
    */
  def longPairs(ms: ArrayData): ArrayData = {
    val n = ms.numElements()
    val xs = ms.toLongArray()
    val out = new java.util.ArrayList[Any](n)
    var i = 0
    while (i < n) {
      val a = xs(i)
      var j = 0
      while (j < n) {
        val b = xs(j)
        if (b > a) {
          val r = new GenericInternalRow(2)
          r.setLong(0, a)
          r.setLong(1, b)
          out.add(r)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ≡ size(filter(zip_with(a, b, (x, y) -> x === y), p -> p)): the
    * number of positions where both arrays are non-null and equal
    * (zip_with pads the shorter side with nulls; null comparisons are
    * dropped by the filter).
    */
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** ≡ the simhashPairs in-bucket explode:
    * flatten(transform(ms, a -> transform(
    *   filter(ms, b -> b.id > a.id && bit_count(a.sh ^ b.sh) <= maxH),
    *   b -> struct(a.id, b.id, bit_count(a.sh ^ b.sh)))))
    * for ms: array<struct<id: long, sh: long>>.
    */
  def simhashPairs(ms: ArrayData, maxHamming: Int): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val shs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      shs(i) = row.getLong(1)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (ids(j) > ids(i)) {
          val ham = java.lang.Long.bitCount(shs(i) ^ shs(j))
          if (ham <= maxHamming) {
            val r = new GenericInternalRow(3)
            r.setLong(0, ids(i))
            r.setLong(1, ids(j))
            r.setInt(2, ham)
            out.add(r)
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** array<struct<id_a, id_b>> of in-bucket ordered long pairs. */
case class LongPairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_pairs requires array<long>, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "long_pairs"
  override protected def nullSafeEval(input: Any): Any =
    ArrayPairs.longPairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayPairs.longPairs($c)")
  override protected def withNewChildInternal(c: Expression): LongPairs = copy(child = c)
}

/** Count of equal positions of two array<long> columns. */
case class ArrayEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"array_eq_count requires two array<long> arguments, got $l, $r")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "array_eq_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayPairs.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ArrayPairs.eqCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayEqCount =
    copy(left = l, right = r)
}

/** array<struct<id_a, id_b, hamming>> of in-bucket simhash pairs at
  * hamming ≤ maxHamming; input array<struct<id: long, sh: long>>.
  */
case class SimhashBucketPairs(child: Expression, maxHamming: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bucket_pairs requires array<struct<long, long>>, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("hamming", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "simhash_bucket_pairs"
  override protected def nullSafeEval(input: Any): Any =
    ArrayPairs.simhashPairs(input.asInstanceOf[ArrayData], maxHamming)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayPairs.simhashPairs($c, $maxHamming)")
  override protected def withNewChildInternal(c: Expression): SimhashBucketPairs =
    copy(child = c)
}

/** Column faces. */
object ArrayPairsCols {
  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def longPairs(ms: Column): Column = bridge(LongPairs(expr(ms)))
  def arrayEqCount(a: Column, b: Column): Column =
    bridge(ArrayEqCount(expr(a), expr(b)))
  def simhashBucketPairs(ms: Column, maxHamming: Int): Column =
    bridge(SimhashBucketPairs(expr(ms), maxHamming))
}
