package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed keyed prefix scan: exact running totals and ranks over
  * a total order, restarting per key — WITHOUT the single-task global
  * window (`sum(...).over(Window.orderBy(...))` funnels every row
  * through one task; even `partitionBy(key)` buffers one key's WHOLE
  * sequence in one task, unrunnable when a key spans millions of
  * rows). The [[GlobalNtile]] two-pass shape, generalized:
  *
  *  1. `repartitionByRange` on (keys ++ ord) + in-partition sort —
  *     the same distributed range shuffle a global orderBy uses;
  *  2. `monotonically_increasing_id` over the sorted partitions
  *     encodes (partition << 33 | local sequence) = the local order;
  *  3. per-(partition, key) sum/count partials collect to the driver
  *     (bounded: #partitions × #keys — callers pass a bounded
  *     DIMENSION key like an event type, never a high-cardinality
  *     id), prefix-summed into per-(partition, key) offsets,
  *     broadcast back;
  *  4. partition-local running sum/rank via a window partitioned by
  *     (physical partition, key) — each window group is a SUBSET of
  *     one task's rows by construction, so no task ever buffers more
  *     than its own partition.
  *
  * Exactness: with an integer value column the running totals are
  * exact longs in any grouping — the reason [[q_cusum]]-style
  * consumers quantize to integer units first. The ord columns
  * together with the keys must form a TOTAL order (include a unique
  * id last): ties split across a range boundary would make local
  * ranks nondeterministic.
  *
  * The range-sorted child is persisted (MEMORY_ONLY) so the collected
  * partials and the returned rows provably come from ONE evaluation
  * of the range exchange (its sample seed incorporates the RDD id —
  * two evaluations could legally disagree; see [[GlobalNtile]]).
  * Returns the scanned frame plus an unpersist handle to call after
  * full materialization.
  */
object PrefixScan {

  /** Adds `sumCol` (running Σ `value`, value rows included up to and
    * INCLUDING the current row) and `rankCol` (1-based position)
    * per key group, ordered by `ord` within each key.
    */
  def runningPerKey(df: DataFrame, keys: Seq[Column], ord: Seq[Column],
                    value: Column, sumCol: String, rankCol: String)
      : (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    // keys materialize as named columns BEFORE the range exchange and
    // the sorts reference those attributes, never the caller's raw
    // expressions: an INTEGER LITERAL key (a constant grouping for a
    // global scan) would otherwise be resolved by Sort as an ORDER BY
    // ordinal — "sort by column 1" — silently scrambling the scan
    // order (orderByOrdinal applies to foldable integer sort keys)
    val keyNames = keys.indices.map(i => s"_k$i")
    val all = keyNames.map(col) ++ ord
    val ranged = graft.plans.CacheHandles.track("prefixscan.ranged", df
      .withColumn("_v", value)
      .withColumns(keyNames.zip(keys).toMap)
      .repartitionByRange(parts, all: _*)
      .sortWithinPartitions(all: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_ONLY))
    val keyed = ranged
      .withColumn("_pid", shiftright(col("_mid"), 33))
    // one row per (physical partition, key) — driver-scale only for
    // bounded-dimension keys, which is this operator's contract
    val partials = keyed
      .groupBy(("_pid" +: keyNames).map(col): _*)
      .agg(sum(col("_v")).as("_psum"), count(lit(1)).as("_pcnt"))
      .collect()
    val byKey = partials.groupBy(r => keyNames.map(n => r.get(r.fieldIndex(n))))
    val offsetRows = byKey.toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var accS = 0L; var accC = 0L
      sorted.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(
          r.toSeq.dropRight(2) ++ Seq(accS, accC))
        accS += r.getLong(r.fieldIndex("_psum"))
        accC += r.getLong(r.fieldIndex("_pcnt"))
        out
      }
    }
    // schema built from the keyed frame, not the collected partials —
    // an EMPTY input must still produce a joinable (if empty) offset
    // frame rather than a missing-column error
    val keyedSchema = keyed.schema
    val offSchema = org.apache.spark.sql.types.StructType(
      (org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.LongType) +:
        keyNames.map(n => keyedSchema(n))) ++
        Seq(org.apache.spark.sql.types.StructField("_offs",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_offc",
            org.apache.spark.sql.types.LongType)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    val w = Window.partitionBy(("_pid" +: keyNames).map(col): _*).orderBy(col("_mid"))
    // the offset join must be NULL-SAFE on the key columns: a nullable
    // dimension key puts its null rows in one groupBy group (whose
    // offsets the driver computes), but plain equality never matches
    // null = null — every null-keyed row would coalesce to offset 0
    // and silently restart its running totals at each partition
    // boundary
    val offRenamed = offDf.toDF(
      ("_opid" +: keyNames.map("_o" + _)) ++ Seq("_offs", "_offc"): _*)
    val joinCond = keyNames
      .map(n => col(n) <=> col("_o" + n))
      .foldLeft(col("_pid") === col("_opid"))(_ && _)
    val out = keyed
      .join(broadcast(offRenamed), joinCond, "left")
      .withColumn(sumCol,
        sum(col("_v")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) +
          coalesce(col("_offs"), lit(0L)))
      .withColumn(rankCol, row_number().over(w) + coalesce(col("_offc"), lit(0L)))
      .drop((Seq("_v", "_mid", "_pid", "_opid", "_offs", "_offc") ++
        keyNames ++ keyNames.map("_o" + _)): _*)
    (out, () => { ranged.unpersist(); () })
  }
}
