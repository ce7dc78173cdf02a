package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral numeric helpers for oracle-checked outputs.
  *
  * Spark's `round` converts the double through its shortest decimal
  * representation (BigDecimal.valueOf) before HALF_UP; DuckDB rounds
  * the binary value directly. For results that land exactly on a
  * .xx5 boundary — common for ratios of small integers like
  * avg-word-length — the two disagree. `floor(x·10ⁿ + 0.5)/10ⁿ` is
  * pure IEEE arithmetic, so both engines produce bit-identical
  * results. Use this (with the same formula in the oracle SQL) for
  * any averaged/ratio column; plain sums of fixed-decimal data can't
  * hit the boundary and may use round().
  */
object EngineNeutral {
  def roundHalfUp(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * p + 0.5) / p
  }
  def r2(c: Column): Column = roundHalfUp(c, 2)
  def r4(c: Column): Column = roundHalfUp(c, 4)

  /** The matching SQL fragment for oracle queries. */
  def sql(expr: String, digits: Int): String = {
    val p = math.pow(10.0, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p.0"
  }
}
