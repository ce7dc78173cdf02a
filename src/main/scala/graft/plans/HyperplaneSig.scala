package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** `planes`-bit random-hyperplane LSH signature of an `array<double>`
  * vector, as ONE codegen'd loop nest.
  *
  * Hyperplane p's component j is a deterministic pseudo-random value in
  * [-0.5, 0.5) derived from xxhash64(p, j) — reproducible with zero
  * stored state, identical to the HOF formula this expression replaces:
  * `aggregate(zip_with(vec, sequence(...), (x,j) =>
  *   x * (pmod(xxhash64(p, j), 100000)/100000.0 - 0.5)), 0.0, _+_)`
  * per plane. Spark 4 evaluates those higher-order functions
  * INTERPRETED, per element, per plane — planes×dim interpreted ops per
  * row on the signature hot path of LSH ANN / embedding near-dup. Here
  * the same arithmetic (same hash chain, same left-to-right
  * accumulation order, so signatures are bit-identical) runs inside
  * whole-stage codegen.
  *
  * Null semantics match the HOF form: a null element makes every
  * plane's dot null, which the old `when(dot > 0, ...)` mapped to an
  * all-zero signature — so a null element yields 0L; a null vector
  * yields null (callers coalesce to 0L as before).
  */
case class HyperplaneSig(child: Expression, planes: Int) extends UnaryExpression {
  require(planes > 0 && planes <= 64, "planes must be in 1..64")

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires array<double>/array<float>, got $t")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return 0L
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes) {
      val hp = XXH64.hashInt(p, 42L)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val m0 = XXH64.hashInt(i, hp) % 100000L
        val m = if (m0 < 0) m0 + 100000L else m0
        val x = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * (m / 100000.0 - 0.5)
        i += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val hp = ctx.freshName("hp")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (isFloatArr) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) { $anyNull = true; break; }
         |}
         |long $sig = 0L;
         |if (!$anyNull) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    long $hp = $xxh.hashInt($p, 42L);
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $m = $xxh.hashInt($i, $hp) % 100000L;
         |      if ($m < 0) $m += 100000L;
         |      $dot += $getX * ($m / 100000.0 - 0.5);
         |    }
         |    if ($dot > 0) $sig |= (1L << $p);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column-API face; accepts array<double> or array<float>. */
  def hyperplane_sig(vec: Column, planes: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HyperplaneSig(org.apache.spark.sql.graftbridge.Bridge.expression(vec), planes))
}
