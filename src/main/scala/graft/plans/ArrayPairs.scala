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

  /** ≡ size(array_intersect(a, b)) for two ascending-SORTED arrays of
    * distinct non-null longs (the sort_array(collect_set(h)) shape) —
    * a zero-allocation linear merge. array_intersect builds a per-row
    * hash set AND materializes the intersection array only for size()
    * to count it (and the jaccard shape repeated that for array_union);
    * on the q_simjoin verify that interpretation+allocation was 68.5
    * CPU-s for 310 k candidate pairs at sf0.1 (StageProfile stage 159,
    * round 19). |A∪B| is derived as |A| + |B| − |A∩B| (exact for
    * distinct sets), so ONE merge pass replaces both set ops.
    */
  def sortedInterCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** One corpus vector scored against a runtime query SET (round 19,
    * the IVF probe hot path): per (query_id, qvec) struct the sim is
    * EXACTLY ArrayDot's left-to-right fold with its null semantics
    * (null/length-mismatch/null-element → null sim; a null corpus
    * vector nulls every sim, matching the join form's per-pair null
    * row). Replaces the cells⋈probes row-multiplying join whose
    * per-pair machinery (join-row materialization + UnsafeProjection
    * of two 64-double arrays) measured ~150 µs per scored pair —
    * 37.7 CPU-s on q_rrf_fusion_ann's dense leg at sf0.1 — for a
    * ~0.1 µs dot. The query set arrives as broadcast DATA grouped per
    * cell (16 rows), NOT a plan-time collected constant: the variant
    * that compiled probes into the kernel at plan time serialized a
    * driver job per run and was measured worse (r19 wave 3, rejected).
    */
  def dotSet(cvec: ArrayData, qset: ArrayData): ArrayData = {
    val n = qset.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = qset.getStruct(i, 2)
      val r = new GenericInternalRow(2)
      r.setLong(0, s.getLong(0))
      var isNull = cvec == null || s.isNullAt(1)
      var acc = 0.0
      if (!isNull) {
        val q = s.getArray(1)
        val m = q.numElements()
        if (cvec.numElements() != m) isNull = true
        else {
          var j = 0
          while (j < m && !isNull) {
            if (cvec.isNullAt(j) || q.isNullAt(j)) isNull = true
            else { acc += cvec.getDouble(j) * q.getDouble(j); j += 1 }
          }
        }
      }
      if (isNull) r.setNullAt(1) else r.setDouble(1, acc)
      out(i) = r
      i += 1
    }
    new GenericArrayData(out)
  }

  /** In-bucket embedding pair sims (round 19, q_dedup_embedding): for
    * ms: array<struct<id: long, vec: array<double>>>, every ordered
    * pair by id VALUE (id_b > id_a, the LongPairs order) with
    * sim = ArrayDot(vec_a, vec_b) — exact fold, exact null semantics
    * (null vec / length mismatch / null element → null sim). Replaces
    * id-only pairs + two merge joins that re-attached the 520 B
    * vectors per pair (31.4 MB pair-attach shuffle + AQE-coalesced
    * 2-task stages at sf0.1) with dots computed where the vectors
    * already sit.
    */
  def vecPairSims(ms: ArrayData): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = ms.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = if (row.isNullAt(1)) null else row.getArray(1)
      i += 1
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        if (ids(j) > ids(i)) {
          val r = new GenericInternalRow(3)
          r.setLong(0, ids(i))
          r.setLong(1, ids(j))
          val a = vecs(i)
          val b = vecs(j)
          var isNull = a == null || b == null
          var acc = 0.0
          if (!isNull) {
            val m = a.numElements()
            if (b.numElements() != m) isNull = true
            else {
              var e = 0
              while (e < m && !isNull) {
                if (a.isNullAt(e) || b.isNullAt(e)) isNull = true
                else { acc += a.getDouble(e) * b.getDouble(e); e += 1 }
              }
            }
          }
          if (isNull) r.setNullAt(2) else r.setDouble(2, acc)
          out.add(r)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
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

/** array<struct<id_a, id_b, sim>> of in-bucket embedding pairs by id
  * order with ArrayDot sims; input array<struct<id: long,
  * vec: array<double>>>.
  */
case class VecPairSims(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(idF, vecF)), _)
        if idF.dataType == LongType &&
          (vecF.dataType == ArrayType(DoubleType, true) ||
           vecF.dataType == ArrayType(DoubleType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_pair_sims requires array<struct<long, array<double>>>, got $other")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id_a", LongType, nullable = false),
      StructField("id_b", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = true))), containsNull = false)
  override def prettyName: String = "vec_pair_sims"
  override protected def nullSafeEval(input: Any): Any =
    ArrayPairs.vecPairSims(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ArrayPairs.vecPairSims($c)")
  override protected def withNewChildInternal(c: Expression): VecPairSims =
    copy(child = c)
}

/** Intersection size of two ascending-sorted distinct array<long>
  * columns (≡ size(array_intersect) on that input class — callers
  * guarantee sortedness via sort_array over collect_set).
  */
case class SortedInterCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_inter_count requires two array<long> arguments, got $l, $r")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_inter_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayPairs.sortedInterCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ArrayPairs.sortedInterCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedInterCount =
    copy(left = l, right = r)
}

/** array<struct<query_id, sim>> of one corpus vector scored against a
  * query set array<struct<query_id: long, qvec: array<double>>> — sims
  * carry ArrayDot's exact fold and null semantics. Null-handling is
  * asymmetric BY DESIGN: a null query SET nulls the output (and the
  * downstream explode emits nothing, like the join it replaces
  * matching no probe rows), but a null corpus VECTOR must still emit
  * one (query_id, null) entry per query — the join form produced a
  * null-sim ROW per pair there, so the default both-null-safe codegen
  * would silently drop rows.
  */
case class DotAgainstSet(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(StructType(Array(q, v)), _))
          if q.dataType == LongType &&
            (v.dataType == ArrayType(DoubleType, true) ||
             v.dataType == ArrayType(DoubleType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_against_set requires array<double>, array<struct<long, array<double>>>, got $l, $r")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("query_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = true))), containsNull = false)
  override def nullable: Boolean = right.nullable
  override def prettyName: String = "dot_against_set"
  override def eval(input: InternalRow): Any = {
    val qs = right.eval(input)
    if (qs == null) null
    else ArrayPairs.dotSet(left.eval(input).asInstanceOf[ArrayData],
      qs.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val leftVal =
      if (left.nullable) s"(${leftGen.isNull} ? null : ${leftGen.value})"
      else leftGen.value
    ev.copy(code =
      code"""
        ${rightGen.code}
        boolean ${ev.isNull} = ${rightGen.isNull};
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${ev.isNull}) {
          ${leftGen.code}
          ${ev.value} = graft.plans.ArrayPairs.dotSet($leftVal, ${rightGen.value});
        }
      """)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotAgainstSet =
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
  def sortedInterCount(a: Column, b: Column): Column =
    bridge(SortedInterCount(expr(a), expr(b)))
  def dotAgainstSet(cvec: Column, qset: Column): Column =
    bridge(DotAgainstSet(expr(cvec), expr(qset)))
  def vecPairSims(ms: Column): Column = bridge(VecPairSims(expr(ms)))
  def simhashBucketPairs(ms: Column, maxHamming: Int): Column =
    bridge(SimhashBucketPairs(expr(ms), maxHamming))
}
