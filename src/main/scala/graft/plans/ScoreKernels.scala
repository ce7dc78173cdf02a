package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Doc-at-a-time scoring kernels for the bounded-query retrieval
  * family (optimization round 19, guide §1.2 step 1 "the distributed
  * algorithm" + §2.3 "shuffle fewer bytes").
  *
  * Both kernels exploit the same structural fact the retrieval design
  * already rests on: the QUERY side is bounded by contract (a query
  * workload is KBs-MBs against a 100 TB corpus) and is broadcast by
  * construction. Instead of fanning the corpus out into one row per
  * (query, doc-term) / (query, doc) pair through a join and paying a
  * corpus×queries-sized hash aggregate, each kernel holds the compiled
  * query set as a task-local reference object and scores one DOCUMENT
  * row against every query in a tight loop, emitting one (query,
  * score) struct per matching query. The downstream bounded
  * [[TopKPerKey]] heaps consume those structs directly — the
  * (query_id, doc_id) aggregation exchange disappears from the plan.
  *
  * Values are BIT-IDENTICAL per pair to the join+aggregate
  * formulations they replace, except for double-sum association in
  * BM25 (the per-(query,doc) contribution sum accumulates in ascending
  * term order rather than hash-bucket order — both are "some fixed
  * order of the same addends"; the r4 output rounding absorbs the
  * ≤1-ulp-per-addend difference exactly as it already absorbs the
  * engine-vs-oracle association difference, and the DuckDB gate
  * verifies the results row-for-row at every gate SF).
  */
object ScoreKernels {

  private def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** Compiled query-term table for [[Bm25Scores]]: `qids(q)` is query
    * ordinal q's id, `term2q(t)` the ordinals of the queries containing
    * compiled term index t. Built once on the driver from the bounded
    * distinct (query_id, term-hash) set.
    */
  final class Bm25QuerySet(val qids: Array[Long],
                           val term2q: Array[Array[Int]]) extends Serializable {
    val nQueries: Int = qids.length
    val nTerms: Int = term2q.length
  }

  /** BM25 scores of ONE document against every query sharing ≥1 term
    * with it: input is the document's (term-index, contribution) pairs
    * (each term index appears at most once — the tf table is keyed by
    * (doc, term)), output one (query_id, score) struct per touched
    * query, score = r4(Σ contributions of the query's terms), summed in
    * ascending term-index order (deterministic across runs and
    * partitionings, unlike the hash-aggregate order it replaces).
    */
  def bm25Scores(qs: Bm25QuerySet, entries: ArrayData): ArrayData = {
    val n = entries.numElements()
    val termC = new Array[Double](qs.nTerms)
    val termSeen = new Array[Boolean](qs.nTerms)
    var i = 0
    while (i < n) {
      val e = entries.getStruct(i, 2)
      val idx = e.getInt(0)
      termC(idx) = e.getDouble(1)
      termSeen(idx) = true
      i += 1
    }
    val acc = new Array[Double](qs.nQueries)
    val touched = new Array[Boolean](qs.nQueries)
    var nTouched = 0
    var t = 0
    while (t < qs.nTerms) {
      if (termSeen(t)) {
        val c = termC(t)
        val qsOf = qs.term2q(t)
        var j = 0
        while (j < qsOf.length) {
          val q = qsOf(j)
          if (!touched(q)) { touched(q) = true; nTouched += 1 }
          acc(q) += c
          j += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](nTouched)
    var q = 0
    var o = 0
    while (q < qs.nQueries) {
      if (touched(q)) {
        out(o) = InternalRow(qs.qids(q), r4(acc(q)))
        o += 1
      }
      q += 1
    }
    new GenericArrayData(out)
  }

  /** Compiled query-vector table for [[CosineSims]]: unit-normalized
    * double vectors (null for zero-norm/null embeddings, which have no
    * direction — their sims stay null exactly like the join form).
    */
  final class CosineQuerySet(val qids: Array[Long],
                             val qvecs: Array[Array[Double]]) extends Serializable {
    val nQueries: Int = qids.length
  }

  /** r4-rounded cosine of ONE (unit-normalized) corpus vector against
    * every query vector except itself (query_id ≠ neighbor_id — the
    * self-pair the join condition excludes). Dot accumulation is the
    * same left-to-right fold as [[ArrayDot]] (q·c per element, in
    * element order), so sims are bit-identical to the
    * join+ArrayDot+r4 pipeline this replaces. A null corpus vector or
    * null query vector yields a null sim (not a dropped pair), and a
    * dimension mismatch yields null, both matching ArrayDot.
    */
  def cosineSims(qs: CosineQuerySet, id: Long, vec: ArrayData): ArrayData = {
    val cvec: Array[Double] = if (vec == null) null else vec.toDoubleArray()
    // count pairs (every query except a self-match)
    var self = 0
    var q = 0
    while (q < qs.nQueries) { if (qs.qids(q) == id) self += 1; q += 1 }
    val out = new Array[Any](qs.nQueries - self)
    q = 0
    var o = 0
    while (q < qs.nQueries) {
      if (qs.qids(q) != id) {
        val qv = qs.qvecs(q)
        if (qv == null || cvec == null || qv.length != cvec.length) {
          out(o) = InternalRow(qs.qids(q), null)
        } else {
          var acc = 0.0
          var i = 0
          while (i < qv.length) { acc += qv(i) * cvec(i); i += 1 }
          out(o) = InternalRow(qs.qids(q), r4(acc))
        }
        o += 1
      }
      q += 1
    }
    new GenericArrayData(out)
  }
}

/** array<struct<query_id:long, score:double>> of a document's BM25
  * scores — see [[ScoreKernels.bm25Scores]]. Child is the document's
  * array<struct<idx:int, c:double>> (term-index, contribution) pairs.
  */
case class Bm25Scores(child: Expression, qs: ScoreKernels.Bm25QuerySet)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
      if a.dataType == IntegerType && b.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bm25_scores requires array<struct<int,double>>, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "bm25_scores"
  override protected def nullSafeEval(input: Any): Any =
    ScoreKernels.bm25Scores(qs, input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bm25qs", qs, classOf[ScoreKernels.Bm25QuerySet].getName)
    defineCodeGen(ctx, ev, c => s"graft.plans.ScoreKernels.bm25Scores($ref, $c)")
  }
  override protected def withNewChildInternal(c: Expression): Bm25Scores = copy(child = c)
}

/** array<struct<query_id:long, sim:double>> of a corpus vector's
  * r4-rounded cosines against the compiled query set — see
  * [[ScoreKernels.cosineSims]]. Child is a non-null
  * struct<id:long, vec:array<double>> (the struct() constructor never
  * yields null, so a null VECTOR field reaches the kernel and keeps
  * its pairs with null sims, matching the join form; a null ID field
  * nulls the result — the row the join condition drops).
  */
case class CosineSims(child: Expression, qs: ScoreKernels.CosineQuerySet)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
      if a.dataType == LongType &&
        b.dataType.isInstanceOf[ArrayType] &&
        b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_sims requires struct<long, array<double>>, got $other")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = true))), containsNull = false)
  override def prettyName: String = "cosine_sims"
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val r = input.asInstanceOf[InternalRow]
    if (r.isNullAt(0)) null
    else ScoreKernels.cosineSims(qs, r.getLong(0),
      if (r.isNullAt(1)) null else r.getArray(1))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosqs", qs, classOf[ScoreKernels.CosineQuerySet].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.isNullAt(0)) { ${ev.isNull} = true; }
      |else {
      |  ${ev.value} = graft.plans.ScoreKernels.cosineSims($ref, $c.getLong(0),
      |    $c.isNullAt(1) ? null : $c.getArray(1));
      |}
    """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): CosineSims =
    copy(child = c)
}

/** Column faces. */
object ScoreKernelCols {
  private def bridge(e: Expression): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftbridge.Bridge.expression(c)

  def bm25Scores(entries: Column, qs: ScoreKernels.Bm25QuerySet): Column =
    bridge(Bm25Scores(expr(entries), qs))
  def cosineSims(idVec: Column, qs: ScoreKernels.CosineQuerySet): Column =
    bridge(CosineSims(expr(idVec), qs))
}
