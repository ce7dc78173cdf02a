package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** L2 unit-normalization of an embedding column in ONE codegen'd
  * pass: `out[i] = v[i] / ‖v‖` as double. The fused hot-path form of
  * the interpreted `transform(v, x -> x / norm)` +
  * `sqrt(array_dot(v, v))` pair — Spark 4 higher-order functions run
  * interpreted per ELEMENT, which profiled at ~0.28 ms/row on 64-dim
  * vectors (StageProfile: three 5.6 s single-thread stages at sf1,
  * one per plan consumer — the whole q_dedup_embedding budget).
  *
  * IEEE operation order matches the HOF form exactly (sequential
  * left-to-right norm accumulation, per-element division), so results
  * are bit-identical to the previous `Similarity.normalized` and to
  * the DuckDB oracle's `[x / nrm FOR x IN e]` with
  * `nrm = sqrt(list_sum([x*x FOR x IN e]))`.
  *
  * Null element, empty array, or an all-zero vector (no direction) →
  * null result — same contract as the HOF form it replaces.
  */
case class ArrayUnit(child: Expression) extends UnaryExpression {

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
          s"array_unit requires array<double>/array<float>, got $other")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "array_unit"
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
    i = 0
    while (i < n) {
      vs(i) = vs(i) / norm
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(vs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val vs = ctx.freshName("vs")
      val norm = ctx.freshName("norm")
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
         |      for (int $i = 0; $i < $n; $i++) { $vs[$i] = $vs[$i] / $norm; }
         |      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($vs);
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ArrayUnit =
    copy(child = c)
}

object ArrayUnit {
  /** Column-API face. */
  def array_unit(v: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ArrayUnit(org.apache.spark.sql.graftbridge.Bridge.expression(v)))
}
