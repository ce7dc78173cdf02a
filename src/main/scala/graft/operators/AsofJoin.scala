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
      Seq("_src", "_vals").filter(left.columns.contains)
    require(clash.isEmpty,
      s"asof: left side already has column(s) ${clash.mkString(", ")} — " +
        "they would mask the right side's forward-filled values")
    val l = left.withColumn("_src", lit(1))
    // all right values travel as ONE struct, so the forward fill picks
    // every value from the same matched right row — per-column fills
    // would mix values across right rows whenever one column is null
    val r = right.select(col(key), col(tsCol),
        struct(valueCols.map(col): _*).as("_vals"))
      .withColumn("_src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // final tie-break on a hash of the right-side value struct: when
    // multiple right rows share the same (key, ts) the forward-filled
    // _vals would otherwise be picked nondeterministically across runs
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("_src").asc, xxhash64(col("_vals")).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("_vals", last(col("_vals"), ignoreNulls = true).over(w))
    val projected = valueCols.foldLeft(filled) { (df, c) =>
      df.withColumn(c, col(s"_vals.$c"))
    }
    projected.filter(col("_src") === 1).drop("_src", "_vals")
  }
}
