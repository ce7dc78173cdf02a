package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global `ntile(n)` without a single-partition sort.
  *
  * Spark's `ntile(n).over(Window.orderBy(...))` funnels EVERY row
  * through one task (the "No Partition Defined for Window" plan) —
  * fine at 150k rows, unrunnable at 100 TB. This operator computes the
  * identical bucket assignment with a scalable plan:
  *
  *  1. `repartitionByRange` on the sort key — the same distributed
  *     range-shuffle a global `orderBy` uses, every partition sorted
  *     relative to the others;
  *  2. per-partition row counts → prefix-sum offsets (a handful of
  *     rows, one per partition — the only driver-scale data);
  *  3. global rank = partition-local `row_number` (parallel window,
  *     partitioned by the range-partition id) + broadcast offset;
  *  4. bucket from rank via ntile's ceil/floor split, pure arithmetic.
  *
  * The sort key must be a total order (include a unique id as the
  * final column) — with ties across partition boundaries the range
  * shuffle could split equal keys between partitions and make local
  * ranks nondeterministic.
  *
  * Determinism note: the plan references the range-shuffled child
  * twice (counts + rank). `repartitionByRange` samples with seeds
  * derived from partition index, so both evaluations see identical
  * bounds, and Spark's ReuseExchange dedupes the shuffle.
  */
object GlobalNtile {

  /** Adds `bucketCol` (1-based ntile bucket) to `df`. */
  def ntile(df: DataFrame, n: Int, ord: Seq[Column], bucketCol: String): DataFrame = {
    require(n > 0, "ntile bucket count must be positive")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(parts, ord: _*)
      .withColumn("_pid", spark_partition_id())
    // tiny: one row per range partition — prefix-sum window is fine
    val counts = ranged.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
    val wOff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col("_pid"),
      (sum("_cnt").over(wOff) - col("_cnt")).as("_off"),
      sum("_cnt").over(wAll).as("_n"))
    val wLocal = Window.partitionBy("_pid").orderBy(ord.map(_.asc): _*)
    val ranked = ranged.join(broadcast(offsets), "_pid")
      .withColumn("_rk", row_number().over(wLocal) + col("_off"))
    // ntile semantics: N rows into n buckets — base = N div n rows per
    // bucket, the first N mod n buckets get one extra row
    val base = expr(s"_n div $n")
    val rem = pmod(col("_n"), lit(n.toLong))
    val bigSpan = rem * (base + 1) // ranks covered by the larger buckets
    val bucket = when(col("_rk") <= bigSpan,
      floor((col("_rk") - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((col("_rk") - bigSpan - 1) / base) + 1)
    ranked.withColumn(bucketCol, bucket.cast("int"))
      .drop("_pid", "_off", "_n", "_rk")
  }
}
