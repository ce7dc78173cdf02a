package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** L2-normalize + symmetric int quantization of an embedding column in
  * ONE codegen'd pass: `out[i] = (int) floor(v[i] / ‖v‖ · scale + 0.5)`
  * — the fused hot-path form of the interpreted
  * `transform(v, x -> floor(x / norm * scale + 0.5))` +
  * `sqrt(array_dot(v, v))` pair (Spark 4 higher-order functions run
  * interpreted per element; a quantization sweep over 100 TB of
  * embeddings would spend most of its time in that interpreter).
  * Identical IEEE operation order to the HOF form, so results are
  * bit-compatible with the q_vector_quantize oracle recipe.
  *
  * Null element, empty array, or an all-zero vector (‖v‖ = 0, where
  * the division is undefined) → null result.
  */
case class ArrayNormQuantize(child: Expression, scale: Int)
    extends UnaryExpression {

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_norm_quantize requires array<double>/array<float>, got $other")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "array_norm_quantize"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val vs = new Array[Double](n)
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = if (isFloatArr) arr.getFloat(i).toDouble else arr.getDouble(i)
      vs(i) = v
      acc += v * v
      i += 1
    }
    val norm = math.sqrt(acc)
    if (norm == 0.0) return null
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(vs(i) / norm * scale + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val vs = ctx.freshName("vs")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val get = if (isFloatArr) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  double[] $vs = new double[$n];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $vs[$i] = $get;
         |    $acc += $vs[$i] * $vs[$i];
         |  }
         |  if (!${ev.isNull}) {
         |    double $norm = Math.sqrt($acc);
         |    if ($norm == 0.0) { ${ev.isNull} = true; } else {
         |      int[] $out = new int[$n];
         |      for (int $i = 0; $i < $n; $i++) {
         |        $out[$i] = (int) Math.floor($vs[$i] / $norm * $scale + 0.5);
         |      }
         |      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ArrayNormQuantize =
    copy(child = c)
}

object ArrayNormQuantize {
  /** Column-API face. */
  def array_norm_quantize(v: Column, scale: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ArrayNormQuantize(org.apache.spark.sql.graftbridge.Bridge.expression(v), scale))
}
