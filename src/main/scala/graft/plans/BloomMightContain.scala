package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` — membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over long keys.
  *
  * The sketch rides along as ONE codegen reference object (same
  * pattern as [[PqEncode]]'s codebooks): the filter predicate stays
  * inside whole-stage codegen and, because it sits directly above the
  * scan, Catalyst keeps it in the scan stage — the fact table is
  * pruned BEFORE its shuffle. That is the whole point of the bloom:
  * a broadcast hash join filters build-side misses only after the
  * probe rows were already read and (for shuffle joins) moved; the
  * bloom rejects ~(1−fpp) of non-matching rows at the scan for the
  * cost of a few XXH64 probes into a bit array that is millions of
  * times smaller than the dim table's key set.
  *
  * No false negatives (every true key passes), so following it with
  * the exact join keeps results exact — the bloom only prunes.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint, got $other")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomMightContain {
  def bloom_might_contain(key: Column, bloom: BloomFilter): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.Bridge.expression(key), bloom))
}
