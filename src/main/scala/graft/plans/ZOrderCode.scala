package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `z_order(x, y)` — the 64-bit Morton (Z-curve) interleave of two
  * 32-bit keys: bit i of `x` lands at position 2i, bit i of `y` at
  * 2i+1. Rows sorted by this value cluster 2-D-close keys into the
  * same neighborhoods, so files written in z-order carry TIGHT
  * per-file min/max ranges on BOTH columns — a box predicate prunes
  * files/row-groups on either dimension, where a lexicographic
  * (x, y) sort gives thin slabs that only ever prune on x.
  *
  * Codegen'd bit-spreading (5 shift-mask steps per key, branch-free);
  * inputs are the low 32 bits of each operand (callers with wider
  * domains should range-bucket first — z-ordering raw 64-bit keys
  * would need a 128-bit code for full fidelity).
  */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"z_order requires (bigint, bigint), got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order"

  @inline private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    spread(x.asInstanceOf[Long]) | (spread(y.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("spread")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      // addNewFunction may relocate the method into a nested class and
      // returns the QUALIFIED invocation name — calling the bare fresh
      // name would not compile in split generated classes
      val fn = ctx.addNewFunction(s,
        s"""private long $s(long v) {
           |  v &= 0xFFFFFFFFL;
           |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
           |  v = (v | (v << 8)) & 0x00FF00FF00FF00FFL;
           |  v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |  v = (v | (v << 2)) & 0x3333333333333333L;
           |  v = (v | (v << 1)) & 0x5555555555555555L;
           |  return v;
           |}""".stripMargin)
      s"""
         |long $vx = $fn($x);
         |long $vy = $fn($y);
         |${ev.value} = $vx | ($vy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderCode =
    copy(left = l, right = r)
}

object ZOrderCode {
  def z_order(x: Column, y: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ZOrderCode(
        org.apache.spark.sql.graftbridge.Bridge.expression(x.cast("long")),
        org.apache.spark.sql.graftbridge.Bridge.expression(y.cast("long"))))
}
