package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as ONE expression: per subspace `s`,
  * `code[s] = argmax_c ( dot(v_s, cb[s][c]) − ‖cb[s][c]‖²/2 )` (the
  * L2-nearest codebook entry; first index wins ties, matching
  * `array_position(_, array_max(_))`).
  *
  * The composed-Column form of this — m × ksub `array_dot` nodes plus
  * argmax plumbing — builds a several-thousand-node Catalyst tree
  * whose analysis/optimization costs ~seconds per query regardless of
  * data volume. Here the codebook rides along as ONE reference object
  * (`ctx.addReferenceObj`) and the whole encode is a single tight
  * codegen'd loop nest: plan size is O(1) in m·ksub.
  *
  * Input must be `array<double>` (normalize/cast first). Null element
  * or length not divisible into the codebook's subspaces → null.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val m = codebooks.length
  @transient private lazy val sub = codebooks.head.head.length
  // flattened [m][ksub*sub] layout: cache-friendly and directly
  // shippable as a codegen reference object
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten)
  @transient private lazy val halves: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum / 2.0))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<double>, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != m * sub) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = flat(s)
      val hs = halves(s)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < hs.length) {
        var d = 0.0
        var j = 0
        while (j < sub) {
          if (arr.isNullAt(s * sub + j)) return null
          d += arr.getDouble(s * sub + j) * cb(c * sub + j)
          j += 1
        }
        val score = d - hs(c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[][]")
    val halfRef = ctx.addReferenceObj("pqHalves", halves, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val score = ctx.freshName("score")
      val cb = ctx.freshName("cb")
      val hs = ctx.freshName("hs")
      s"""
         |if ($a.numElements() != ${m * sub}) { ${ev.isNull} = true; } else {
         |  int[] $out = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    double[] $cb = $flatRef[$s];
         |    double[] $hs = $halfRef[$s];
         |    int $best = 0;
         |    double $bestScore = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $hs.length; $c++) {
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        if ($a.isNullAt($s * $sub + $j)) { ${ev.isNull} = true; break; }
         |        $d += $a.getDouble($s * $sub + $j) * $cb[$c * $sub + $j];
         |      }
         |      if (${ev.isNull}) break;
         |      double $score = $d - $hs[$c];
         |      if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |    }
         |    $out[$s] = $best;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

object PqEncode {
  def pq_encode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PqEncode(org.apache.spark.sql.graftbridge.Bridge.expression(v), codebooks))
}
