package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks (the Deequ-style validation gate a
  * production pipeline runs before publishing a table): each rule
  * becomes ONE aggregate expression, every rule is evaluated in a
  * SINGLE pass over the data (one scan, map-side partial aggregation,
  * one tiny result row), and the result unpivots to one row per rule
  * with its violation count. At 100 TB the cost is one full scan —
  * the same price as any count — regardless of rule count.
  */
object Checks {

  sealed trait Rule {
    def name: String
    /** Aggregate expression counting VIOLATIONS of the rule. */
    private[functions] def violations: Column
  }

  /** Null values in `col`. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"
    private[functions] def violations =
      sum(when(org.apache.spark.sql.functions.col(col).isNull, 1L).otherwise(0L))
  }

  /** Duplicate values of `col` (rows beyond the first per value;
    * nulls count as a value). Exact `count_distinct` — a distinct
    * shuffle, never a collected set, so cardinality doesn't bound it.
    */
  final case class Unique(col: String) extends Rule {
    val name = s"unique($col)"
    private[functions] def violations = {
      val c = org.apache.spark.sql.functions.col(col)
      (count(c) - countDistinct(c)) +
        greatest(sum(when(c.isNull, 1L).otherwise(0L)) - 1L, lit(0L))
    }
  }

  /** Non-null values outside [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col)"
    private[functions] def violations = {
      val c = org.apache.spark.sql.functions.col(col)
      sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
    }
  }

  /** Non-null values outside the accepted set. */
  final case class InSet(col: String, values: Seq[String]) extends Rule {
    val name = s"in_set($col)"
    private[functions] def violations = {
      val c = org.apache.spark.sql.functions.col(col)
      sum(when(c.isNotNull && !c.isin(values: _*), 1L).otherwise(0L))
    }
  }

  /** Runs all rules in one scan. Returns one row per rule:
    * (rule, violations, n_rows, pass), ordered by rule name.
    */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules given")
    val aggs = count(lit(1)).as("_n") +:
      rules.zipWithIndex.map { case (r, i) => r.violations.cast("long").as(s"_v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', _v$i" }.mkString(", ")
    one.selectExpr(s"stack(${rules.length}, $stackArgs) AS (rule, violations)", "_n AS n_rows")
      .select(col("rule"), coalesce(col("violations"), lit(0L)).as("violations"),
        col("n_rows"), (coalesce(col("violations"), lit(0L)) === 0L).as("pass"))
      .orderBy("rule")
  }
}
