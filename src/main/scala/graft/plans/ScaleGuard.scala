package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan lint for the two quietest scale-killers Spark allows:
  *
  *  1. a window with an EMPTY partition spec — every row moves to one
  *     task (Spark itself only logs a WARN from the physical operator,
  *     after you're already running);
  *  2. a join with NO cross-side equality predicate — plans as a
  *     nested-loop/cartesian join, O(|L|·|R|) at scale. Joins where
  *     either side is provably ≤1 row (`maxRows`, e.g. a global
  *     aggregate broadcast as a scalar) are exempt: those are the
  *     legitimate broadcast-scalar pattern.
  *
  * Both are flagged at plan time, before execution.
  *
  * Modes via `spark.graft.scaleGuard`:
  *  - `warn` (default): log each offence
  *  - `fail`: refuse the plan — the right setting for production
  *    pipelines where a single-partition sort or an accidental
  *    cartesian is always a bug
  *  - `off`: disabled
  *
  * Wired by [[GraftExtensions]] as a pre-CBO rule (runs once per
  * query), or imperatively on an existing session via
  * [[ScaleGuard.register]] (`experimental.extraOptimizations`).
  */
case class ScaleGuardRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hasCrossSideEquality(j: Join): Boolean = {
    def crossSide(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) &&
        r.references.subsetOf(j.right.outputSet) && l.references.nonEmpty) ||
      (l.references.subsetOf(j.right.outputSet) &&
        r.references.subsetOf(j.left.outputSet) && l.references.nonEmpty)
    // top-level AND-conjuncts only, like the planner's own equi-key
    // extraction: an EqualTo buried under Not/Or (e.g. `a =!= b`)
    // provides no hash key and must not silence the lint
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    j.condition.exists(c => conjuncts(c).exists {
      case EqualTo(l, r) => crossSide(l, r)
      case EqualNullSafe(l, r) => crossSide(l, r)
      case _ => false
    })
  }

  private def scalarSide(j: Join): Boolean =
    j.left.maxRows.exists(_ <= 1L) || j.right.maxRows.exists(_ <= 1L)

  /** An explicit broadcast hint on either side is a conscious opt-in
    * to a nested-loop join with a bounded build side (brute-force
    * scoring, tiny dim tables) — not an accident to flag.
    */
  private def broadcastHinted(j: Join): Boolean =
    (j.hint.leftHint ++ j.hint.rightHint)
      .exists(_.strategy.exists(_.toString.toLowerCase.contains("broadcast")))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    spark.conf.get("spark.graft.scaleGuard", "warn") match {
      case "off" => ()
      case mode =>
        def flag(msg: String): Unit =
          if (mode == "fail") throw new SparkException(s"[graft.ScaleGuard] $msg")
          else logWarning(s"[graft.ScaleGuard] $msg")
        plan.foreach {
          case w: Window if w.partitionSpec.isEmpty =>
            val what = w.windowExpressions.map(_.name).mkString(", ")
            flag(s"empty-partition Window over [$what]: every row " +
              "moves to ONE task at scale; partition the window or use a " +
              "range-partitioned formulation (e.g. graft GlobalNtile)")
          case j: Join if !hasCrossSideEquality(j) && !scalarSide(j) &&
              !broadcastHinted(j) =>
            flag(s"${j.joinType} join with no cross-side equality " +
              "predicate plans as a nested-loop/cartesian join — " +
              "O(|L|*|R|) at scale; add an equi-key (block key, time " +
              "bucket) and keep ranges/inequalities as residual filters")
          case _ => ()
        }
    }
    plan
  }
}

object ScaleGuard {
  /** Attach to an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[ScaleGuardRule]))
      spark.experimental.extraOptimizations = cur :+ ScaleGuardRule(spark)
  }

  /** Detach from a session registered via [[register]]. */
  def unregister(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[ScaleGuardRule])

  /** Physical-plan audit: the broadcast MISS the logical lint can't
    * see — a sort-merge or shuffled-hash join whose one side's static
    * size estimate is under `broadcastableBytes` (default: the
    * session's autoBroadcastJoinThreshold). Both sides of such a join
    * shuffle even though one would fit a broadcast; the usual causes
    * are a disabled threshold, missing stats upstream of a
    * non-pruning operator, or a join key wrapped in an expression
    * that blocked the planner's size propagation. AQE often rescues
    * these at runtime from observed sizes — this audit catches the
    * ones static planning already knew about, before execution.
    *
    * Returns one finding per offending join (empty = clean). Audits
    * the pre-AQE physical plan, so it is side-effect free.
    */
  def auditPhysical(df: org.apache.spark.sql.DataFrame,
                    broadcastableBytes: Long = -1L): Seq[String] = {
    val thresh: Long =
      if (broadcastableBytes >= 0) broadcastableBytes
      else org.apache.spark.sql.graftbridge.Bridge
        .autoBroadcastThreshold(df.sparkSession)
    if (thresh <= 0) return Nil
    def sizeOf(p: org.apache.spark.sql.execution.SparkPlan): Option[BigInt] =
      p.logicalLink.map(_.stats.sizeInBytes)
    df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        (j: org.apache.spark.sql.execution.SparkPlan, "SortMergeJoin",
          sizeOf(j.left), sizeOf(j.right))
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        (j, "ShuffledHashJoin", sizeOf(j.left), sizeOf(j.right))
    }.flatMap { case (_, kind, l, r) =>
      val small = Seq("left" -> l, "right" -> r).collect {
        case (side, Some(sz)) if sz <= thresh => s"$side≈${sz}B"
      }
      if (small.nonEmpty)
        Some(s"$kind shuffles both sides but ${small.mkString(",")} is under " +
          s"the ${thresh}B broadcast threshold — a broadcast was missed " +
          "(stats gap, disabled threshold, or non-propagating operator)")
      else None
    }
  }
}
