package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The ADC lookup table for a PQ query vector as ONE expression:
  * `table[s][c] = dot(q_s, cb[s][c])` — the per-query companion of
  * [[PqEncode]], for the same reason: the composed-Column form is a
  * m×ksub-node tree whose plan-time cost dwarfs its execution on the
  * (small, broadcast) query side. Null element or wrong length → null.
  */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  @transient private lazy val m = codebooks.length
  @transient private lazy val sub = codebooks.head.head.length
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.map(_.flatten)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_table requires array<double>, got $other")
    }

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_table"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() != m * sub) return null
    val tbl = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = flat(s)
      val ksub = cb.length / sub
      val row = new Array[Any](ksub)
      var c = 0
      while (c < ksub) {
        var d = 0.0
        var j = 0
        while (j < sub) {
          if (arr.isNullAt(s * sub + j)) return null
          d += arr.getDouble(s * sub + j) * cb(c * sub + j)
          j += 1
        }
        row(c) = d
        c += 1
      }
      tbl(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(tbl)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("adcFlat", flat, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.freshName("tbl")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val cb = ctx.freshName("cb")
      val row = ctx.freshName("row")
      val ksub = ctx.freshName("ksub")
      s"""
         |if ($a.numElements() != ${m * sub}) { ${ev.isNull} = true; } else {
         |  Object[] $tbl = new Object[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    double[] $cb = $flatRef[$s];
         |    int $ksub = $cb.length / $sub;
         |    double[] $row = new double[$ksub];
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $sub; $j++) {
         |        if ($a.isNullAt($s * $sub + $j)) { ${ev.isNull} = true; break; }
         |        $d += $a.getDouble($s * $sub + $j) * $cb[$c * $sub + $j];
         |      }
         |      if (${ev.isNull}) break;
         |      $row[$c] = $d;
         |    }
         |    $tbl[$s] = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($row);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tbl);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTable =
    copy(child = c)
}

object PqAdcTable {
  def pq_adc_table(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PqAdcTable(org.apache.spark.sql.graftbridge.Bridge.expression(v), codebooks))
}
