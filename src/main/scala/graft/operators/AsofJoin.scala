package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row whose
  * timestamp is ≤ the left row's timestamp, per key (the canonical
  * "price as of trade time" operator).
  *
  * Spark lacks it natively; rather than a custom SparkPlan, it
  * composes from built-ins with the union+window trick: tag both
  * sides, union them, sort each key's timeline once, and carry the
  * last-seen right values forward with `last(_, ignoreNulls)`.
  * ONE shuffle (by key), no range-join row explosion, fully
  * codegen'd — the plan a custom physical operator would aspire to.
  * Right rows at the exact left timestamp are visible (ties sort
  * right-before-left), matching DuckDB's `ASOF JOIN ... ON l.ts >=
  * r.ts` semantics; left rows with no prior right row keep nulls
  * (left-join semantics).
  */
object AsofJoin {
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           valueCols: Seq[String]): DataFrame = {
    val clash = valueCols.toSet.intersect(left.columns.toSet) ++
      (if (left.columns.contains("_src")) Seq("_src") else Nil)
    require(clash.isEmpty,
      s"asof: left side already has column(s) ${clash.mkString(", ")} — " +
        "they would mask the right side's forward-filled values")
    val l = left.withColumn("_src", lit(1))
    val r = right.select((Seq(col(key), col(tsCol)) ++ valueCols.map(col)): _*)
      .withColumn("_src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_src") === 1).drop("_src")
  }
}
