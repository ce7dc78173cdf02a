package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-parameter HyperLogLog (Flajolet et al. 2007) whose register
  * state is PORTABLE: the item hash is the 60-bit md5 prefix
  * ([[EngineNeutral.md5Long60]]'s construction), bucket = low 10 bits,
  * rho = leading-zero rank of the remaining 50 bits — every register
  * is reproducible from md5 + integer ops in any engine, so queries
  * built on it carry full DuckDB oracles (q_approx_distinct since
  * round 15; q_hll_union since round 17).
  *
  * The register TABLE (group, bucket, mr) is itself the mergeable
  * sketch: union = groupBy(bucket).max(mr) — associative, commutative,
  * idempotent — so per-source/per-day register tables persist at
  * ingest and re-aggregate to any grouping without re-scanning the
  * corpus, exactly the DataSketches workflow but with engine-neutral
  * state. m = 1024 registers is fixed: the bias constant α·m² and the
  * 2⁵¹ empty-register weight below are baked into the estimate AND
  * its oracles (rel. std. error 1.04/√1024 ≈ 3.3%).
  */
object PortableHll {
  val m = 1024

  /** Register table of `hashInput` per `groups`: one row per
    * (group..., bucket) with the max rho observed and the bucket's
    * raw row count (`cnt` keeps the sketch's companion total
    * mergeable alongside it). `hashInput` is cast to string before
    * hashing; NULLs are the caller's responsibility to filter.
    * Shuffle rows collapse map-side to ≤ m per group.
    */
  def registers(df: DataFrame, groups: Seq[Column], hashInput: Column): DataFrame = {
    // round-18: codegen md5-prefix kernel, same value (TextHashSpec)
    val h = graft.plans.TextHashCols.md5Prefix(hashInput.cast("string"), 15)
    val rest = expr(s"h div $m")
    df.select(groups :+ h.as("h"): _*)
      .select(groups :+ pmod(col("h"), lit(m.toLong)).as("bucket") :+ rest.as("rest"): _*)
      .select(groups :+ col("bucket") :+
        when(col("rest") === 0L, lit(51))
          .otherwise(lit(51) - length(expr("bin(rest)"))).as("rho"): _*)
      .groupBy(groups :+ col("bucket"): _*)
      .agg(max(col("rho")).as("mr"), count(lit(1)).as("cnt"))
  }

  /** HLL estimate per group from a register table (group..., bucket,
    * mr, cnt): the raw harmonic estimate with Flajolet's small-range
    * linear-counting correction, floor(x + 0.5)-rounded to a long —
    * the exact arithmetic both engines replay bit-for-bit. Also
    * emits `n`, the summed raw row count.
    */
  def estimate(regs: DataFrame, groups: Seq[Column]): DataFrame = {
    val v = lit(m.toLong) - col("nb")
    val sumInt = col("sp") + v * lit(2251799813685248L) // + V empty regs · 2^51
    val e = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
      lit(m.toDouble * m.toDouble) * lit(2251799813685248.0)) / sumInt.cast("double")
    regs.groupBy(groups: _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - mr AS INT))")).as("sp"),
        count(lit(1)).as("nb"), sum(col("cnt")).as("n"))
      .select(groups :+
        when(e <= lit(2.5 * m) && v > 0,
            floor(lit(m.toDouble) * log(lit(m.toDouble) / v.cast("double")) + lit(0.5)))
          .otherwise(floor(e + lit(0.5)))
          .cast("long").as("est_distinct") :+ col("n"): _*)
  }
}
