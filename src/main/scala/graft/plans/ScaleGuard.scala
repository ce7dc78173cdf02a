package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan lint for the quietest scale-killer Spark allows: a window
  * with an EMPTY partition spec moves every row to one task — fine on
  * a laptop, a stalled stage at 100 TB (Spark itself only logs a
  * WARN from the physical operator, after you're already running).
  * This rule flags it at plan time, before execution.
  *
  * Modes via `spark.graft.scaleGuard`:
  *  - `warn` (default): log each offending window expression
  *  - `fail`: refuse the plan — the right setting for production
  *    pipelines where a single-partition sort is always a bug (use
  *    [[graft.operators.GlobalNtile]] / range-partitioned
  *    alternatives instead)
  *  - `off`: disabled
  *
  * Wired by [[GraftExtensions]] as a pre-CBO rule (runs once per
  * query), or imperatively on an existing session via
  * [[ScaleGuard.register]] (`experimental.extraOptimizations`).
  */
case class ScaleGuardRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    spark.conf.get("spark.graft.scaleGuard", "warn") match {
      case "off" => ()
      case mode =>
        plan.foreach {
          case w: Window if w.partitionSpec.isEmpty =>
            val what = w.windowExpressions.map(_.name).mkString(", ")
            val msg = s"empty-partition Window over [$what]: every row " +
              "moves to ONE task at scale; partition the window or use a " +
              "range-partitioned formulation (e.g. graft GlobalNtile)"
            if (mode == "fail") throw new SparkException(s"[graft.ScaleGuard] $msg")
            else logWarning(s"[graft.ScaleGuard] $msg")
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
}
