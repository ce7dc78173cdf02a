package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel

/** Exact global `ntile(n)` without a single-partition sort.
  *
  * Spark's `ntile(n).over(Window.orderBy(...))` funnels EVERY row
  * through one task (the "No Partition Defined for Window" plan) —
  * fine at 150k rows, unrunnable at 100 TB. This operator computes the
  * identical bucket assignment with a scalable plan:
  *
  *  1. `repartitionByRange` on the sort key — the same distributed
  *     range-shuffle a global `orderBy` uses, every partition sorted
  *     relative to the others — then an in-partition sort;
  *  2. `monotonically_increasing_id` over the sorted partitions
  *     encodes (partition id << 33 | row sequence), giving the
  *     partition-LOCAL rank with no extra shuffle and no window (the
  *     id is assigned in iteration order, which after the sort IS the
  *     sorted order; it is nondeterministic to Catalyst, so no rule
  *     reorders it across the sort);
  *  3. per-partition row counts are collected (one row per partition —
  *     legitimately driver-scale) and prefix-summed into global-rank
  *     offsets, broadcast-joined back on partition id;
  *  4. bucket from rank via ntile's ceil/floor split, pure arithmetic.
  *
  * The sort key must be a total order (include a unique id as the
  * final column) — with ties across partition boundaries the range
  * shuffle could split equal keys between partitions and make local
  * ranks nondeterministic.
  *
  * Consistency of counts and ranks is pinned by persisting the
  * range-sorted child before anything reads it: the collected counts
  * and the returned rows provably come from ONE evaluation of the
  * range exchange (`repartitionByRange` bounds come from a sample
  * whose seed incorporates the RDD id, so two independent evaluations
  * could legally disagree; exchange reuse is an optimization, not a
  * guarantee). MEMORY_ONLY: an evicted block recomputes from the same
  * pinned physical RDD — same shuffle files, same bounds — so
  * eviction cannot break the pin, and blocks don't pile up on disk in
  * long sessions. The persist stays owned by the returned plan; in a
  * long-lived session use [[GlobalNtile.ntileWithHandle]] and call the
  * handle once the result is fully consumed.
  */
object GlobalNtile {

  /** Adds `bucketCol` (1-based ntile bucket) to `df`.
    *
    * `ord` must be plain columns, not `.asc`/`.desc` sort orders: the
    * same columns drive both the range partitioning and the local
    * sort, and a SortOrder accepted in one but defaulted in the other
    * would silently mis-rank. Wrap descending keys as negations or
    * pre-compute a sort key column instead.
    */
  def ntile(df: DataFrame, n: Int, ord: Seq[Column], bucketCol: String): DataFrame =
    ntileWithHandle(df, n, ord, bucketCol)._1

  /** As [[ntile]], plus an unpersist handle for the internal
    * range-sorted cache: call it AFTER the returned frame has been
    * fully materialized (written / collected / checkpointed) — before
    * that it would un-pin the single-evaluation guarantee the ranks
    * depend on. Repeated `ntile` calls in a long-lived session leak
    * one cached plan each without this.
    */
  def ntileWithHandle(df: DataFrame, n: Int, ord: Seq[Column],
                      bucketCol: String): (DataFrame, () => Unit) = {
    require(n > 0, "ntile bucket count must be positive")
    ord.foreach { c =>
      require(!Bridge.isSortOrder(c),
        s"ntile ord columns must be plain (got sort order: $c); " +
          "negate or precompute a key column for descending order")
    }
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val ranged = graft.plans.CacheHandles.track("globalntile.ranged",
      df.repartitionByRange(parts, ord: _*)
        .sortWithinPartitions(ord: _*)
        .withColumn("_mid", monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_ONLY))
    // one count row per range partition → driver-side prefix sum (the
    // only driver-scale data; no single-partition window anywhere)
    val midMask = (1L << 33) - 1
    val cnts = ranged
      .groupBy(shiftright(col("_mid"), 33).as("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = cnts.map(_._2).sum
    val offsets = cnts.scanLeft(0L)(_ + _._2) // rows before partition i
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = cnts.indices.map(i => (cnts(i)._1, offsets(i))).toDF("_pid", "_off")
    val ranked = ranged
      .withColumn("_pid", shiftright(col("_mid"), 33))
      .join(broadcast(offDf), Seq("_pid"), "left")
      .withColumn("_rk", col("_mid").bitwiseAND(lit(midMask)) + 1 + coalesce(col("_off"), lit(0L)))
    // ntile semantics: N rows into n buckets — base = N div n rows per
    // bucket, the first N mod n buckets get one extra row
    val base = total / n
    val rem = total % n
    val bigSpan = rem * (base + 1) // ranks covered by the larger buckets
    val bucket =
      if (base == 0L) floor((col("_rk") - 1) / lit(base + 1)) + 1 // n > N: rank == bucket
      else when(col("_rk") <= bigSpan, floor((col("_rk") - 1) / lit(base + 1)) + 1)
        .otherwise(lit(rem) + floor((col("_rk") - bigSpan - 1) / lit(base)) + 1)
    val out = ranked.withColumn(bucketCol, bucket.cast("int"))
      .drop("_pid", "_off", "_mid", "_rk")
    (out, () => { ranged.unpersist(); () })
  }
}
