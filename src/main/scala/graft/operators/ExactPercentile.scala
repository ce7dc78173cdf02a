package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Exact interpolated percentiles per group with BOUNDED per-task
  * memory — the scale-safe replacement for `percentile(col,
  * array(...))`.
  *
  * Spark's exact `percentile` aggregate buffers a value→count map per
  * group. Over near-unique doubles the map is O(rows) per group, and
  * the final merge concentrates each group's whole map into one task:
  * at 100 TB those executors OOM. This operator computes the identical
  * value (same p·(n−1) linear-interpolation definition, same IEEE
  * arithmetic as Spark's `Percentile.getPercentile`) by rank selection
  * instead of value-count maps:
  *
  *  1. range-partition on (group…, value) + in-partition sort — the
  *     same distributed range shuffle a global `orderBy` uses; each
  *     group's rows land value-ordered across contiguous partitions;
  *  2. `monotonically_increasing_id` over the sorted partitions gives
  *     the partition-local sequence with no window and no extra
  *     shuffle (assigned in iteration order — after the sort that IS
  *     the sorted order; nondeterministic to Catalyst, never reordered
  *     across the sort);
  *  3. per-(partition, group) counts and minimum local sequence are
  *     collected — at most `partitions + groups − 1` rows because each
  *     group spans a contiguous partition range (legitimately
  *     driver-scale, the GlobalNtile trick) — and prefix-summed into
  *     within-group rank offsets;
  *  4. the target ranks ⌊p·(n−1)⌋ / ⌈p·(n−1)⌉ per (group, fraction)
  *     are a tiny broadcast table; one broadcast join + filter keeps
  *     exactly the bracketing rows (≤ 2·|fractions| per group), and a
  *     final tiny aggregation interpolates
  *     `lower + (higher − lower)·(p·(n−1) − ⌊p·(n−1)⌋)`.
  *
  * No task ever holds more than its input split; the only driver-side
  * data is one count row per (partition, group) run and the final
  * one-row-per-group result.
  *
  * Consistency is pinned by persisting the range-sorted frame before
  * anything reads it (`repartitionByRange` bounds are sampled with an
  * RDD-id seed; two independent evaluations could legally disagree —
  * see [[GlobalNtile]]). Use [[percentilesWithHandle]] to release the
  * cache after the result is materialized.
  */
object ExactPercentile {

  /** One row per group: `groupCols ++ outNames`, where `outNames(i)`
    * is the exact `fractions(i)` percentile of `valueCol` (cast to
    * double; nulls ignored, like Spark's `percentile`). Holds a
    * MEMORY_ONLY persist owned by the returned plan — prefer
    * [[percentilesWithHandle]] in long-lived sessions.
    */
  def percentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  fractions: Seq[Double], outNames: Seq[String]): DataFrame =
    percentilesWithHandle(df, groupCols, valueCol, fractions, outNames)._1

  /** As [[percentiles]], plus an unpersist handle: call it once the
    * returned frame has been fully materialized (written / collected /
    * checkpointed) to release the range-sorted cache. Calling it
    * before materialization would un-pin the range bounds the ranks
    * were computed from.
    */
  def percentilesWithHandle(df: DataFrame, groupCols: Seq[String], valueCol: String,
                            fractions: Seq[Double], outNames: Seq[String])
      : (DataFrame, () => Unit) = {
    require(fractions.nonEmpty && fractions.length == outNames.length,
      "one output name per fraction")
    require(fractions.forall(p => p >= 0.0 && p <= 1.0),
      s"fractions must be in [0, 1], got $fractions")
    val spark = df.sparkSession
    // backtick-quote every interpolated column reference so names
    // containing dots (or backticks) resolve as single columns
    def bq(n: String): String = "`" + n.replace("`", "``") + "`"
    val gcols = groupCols.map(c => col(bq(c)))
    val base = df
      .select(gcols :+ col(bq(valueCol)).cast("double").as("_v"): _*)
      .filter(col("_v").isNotNull)
    // the pid|seq rank encoding gives each range partition 2^33 local
    // sequence numbers — partition count must therefore scale with the
    // input, not with executor count alone. Size from plan stats at
    // ~256 MB per partition (>250x below the 2^33-row ceiling for any
    // realistic row width); the post-collect require below is the
    // exact backstop for when stats lie.
    val statBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val byStats: Int =
      if (statBytes > 0 && statBytes < BigInt(Long.MaxValue) / 2)
        (statBytes / (256L << 20)).min(BigInt(1 << 17)).toInt
      else 0
    val parts = math.max(spark.sparkContext.defaultParallelism, byStats)
    val ranged = graft.plans.CacheHandles.track("exactpercentile.ranged",
      base
        .repartitionByRange(parts, gcols :+ col("_v"): _*)
        .sortWithinPartitions(gcols :+ col("_v"): _*)
        .withColumn("_mid", monotonically_increasing_id())
        .persist(StorageLevel.MEMORY_ONLY))
    val midMask = (1L << 33) - 1
    // one row per (partition, group) RUN — groups are contiguous under
    // the range partitioning, so this is ≤ parts + groups − 1 rows
    val slots = ranged
      .groupBy(shiftright(col("_mid"), 33).as("_pid") +: gcols: _*)
      .agg(count(lit(1)).as("_cnt"),
        min(col("_mid").bitwiseAND(lit(midMask))).as("_seq0"))
      .collect()
    val g = groupCols.length
    // exact overflow backstop: if any real partition held ≥ 2^33 rows,
    // its sequence numbers bled into the pid bits — and the first 2^33
    // of them still land on the true pid, so that observed pid bucket
    // counts ≥ 2^33 and this check CANNOT miss the corruption
    locally {
      val lim = 1L << 33
      slots.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
        val n = rs.map(_.getLong(g + 1)).sum
        require(n < lim, s"range partition $pid holds $n rows >= 2^33: " +
          "the pid|seq rank encoding would corrupt ranks; increase " +
          "partition count (input stats under-estimated the data size)")
      }
    }
    // driver: per group, partition slots in pid order → prefix-sum
    // offsets; rank of a row = localSeq + (offset − seq0) = localSeq + adj
    // group key for driver-side equality: binary columns collect as
    // Array[Byte], whose JVM equals is reference identity — normalize
    // arrays to Seq for the key, keep originals for row construction
    def comparable(v: Any): Any = v match {
      case a: Array[_] => a.toSeq
      case x => x
    }
    val byGroup: Map[Seq[Any], Array[Row]] = slots
      .groupBy(r => (1 to g).map(i => comparable(r.get(i))): Seq[Any])
      .view.mapValues(_.sortBy(_.getLong(0))).toMap
    val groupSchema = StructType(groupCols.map(base.schema(_)))
    val adjRows = Seq.newBuilder[Row]
    val neededRows = Seq.newBuilder[Row]
    byGroup.foreach { case (_, slotRows) =>
      val gv = (1 to g).map(slotRows.head.get)
      var off = 0L
      slotRows.foreach { r =>
        adjRows += Row.fromSeq(r.getLong(0) +: gv :+ (off - r.getLong(g + 2)))
        off += r.getLong(g + 1)
      }
      val n = off
      fractions.zipWithIndex.foreach { case (p, i) =>
        // Spark Percentile.getPercentile, replicated operation-for-
        // operation so the result is bit-identical: position =
        // (count − 1) × p; result = (higher − position)·lowerValue +
        // (position − lower)·higherValue, with early return of
        // lowerValue when lower == higher or the values are equal
        val position = (n - 1) * p
        val lo = math.floor(position).toLong
        val hi = math.ceil(position).toLong
        val wl = hi - position
        val wh = position - lo
        // Seq[Any], NOT Seq(...): mixed Long/Int/Double literals would
        // numeric-widen everything to Double and corrupt the LongType slot
        neededRows += Row.fromSeq(gv ++ Seq[Any](lo, i, 0, wl, wh))
        neededRows += Row.fromSeq(gv ++ Seq[Any](hi, i, 1, wl, wh))
      }
    }
    import scala.jdk.CollectionConverters._
    val adjDf = spark.createDataFrame(adjRows.result().asJava,
      StructType(StructField("_pid", LongType) +: groupSchema.fields :+
        StructField("_adj", LongType)))
    val neededDf = spark.createDataFrame(neededRows.result().asJava,
      StructType(groupSchema.fields ++ Seq(
        StructField("_grank", LongType), StructField("_fidx", IntegerType),
        StructField("_role", IntegerType), StructField("_wl", DoubleType),
        StructField("_wh", DoubleType))))
    // null-safe group equality: groupBy above treats null as a group,
    // so the joins must too
    def groupEq(l: String, r: String): Column =
      groupCols.map(c => col(s"$l.${bq(c)}") <=> col(s"$r.${bq(c)}"))
        .foldLeft(lit(true))(_ && _)
    val cand = ranged
      .withColumn("_pid", shiftright(col("_mid"), 33)).as("l")
      .join(broadcast(adjDf.as("r")),
        col("l._pid") === col("r._pid") && groupEq("l", "r"))
      .withColumn("_grank",
        col("_mid").bitwiseAND(lit(midMask)) + col("_adj"))
      .select(groupCols.map(c => col(s"l.${bq(c)}")) :+ col("_grank") :+ col("_v"): _*)
    val hits = cand.as("l")
      .join(broadcast(neededDf.as("r")),
        col("l._grank") === col("r._grank") && groupEq("l", "r"))
      .select(groupCols.map(c => col(s"l.${bq(c)}")) ++
        Seq(col("_fidx"), col("_role"), col("_wl"), col("_wh"), col("_v")): _*)
    // ≤ 2·|fractions| rows per group reach this aggregation
    val aggExprs = fractions.indices.flatMap { i => Seq(
      max(when(col("_fidx") === i && col("_role") === 0, col("_v"))).as(s"_l$i"),
      max(when(col("_fidx") === i && col("_role") === 1, col("_v"))).as(s"_h$i"),
      max(when(col("_fidx") === i, col("_wl"))).as(s"_wl$i"),
      max(when(col("_fidx") === i, col("_wh"))).as(s"_wh$i"))
    }
    val perGroup = hits
      .groupBy(gcols: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val out = perGroup.select(gcols ++ fractions.indices.map { i =>
      // identical IEEE ops to Spark's Percentile.getPercentile: early
      // return of the lower value when the bracket is degenerate,
      // else (higher − position)·lower + (position − lower)·higher
      when(col(s"_l$i") === col(s"_h$i"), col(s"_l$i"))
        .otherwise(col(s"_wl$i") * col(s"_l$i") + col(s"_wh$i") * col(s"_h$i"))
        .as(outNames(i))
    }: _*)
    (out, () => { ranged.unpersist(); () })
  }
}
