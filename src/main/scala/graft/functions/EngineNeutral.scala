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
  def r6(c: Column): Column = roundHalfUp(c, 6)

  /** The matching SQL fragment for oracle queries. */
  def sql(expr: String, digits: Int): String = {
    val p = math.pow(10.0, digits).toLong
    s"floor(($expr) * $p + 0.5) / $p.0"
  }

  /** Exact engine-neutral sum of FIXED-DECIMAL data that parquet
    * stores as doubles (TPC-H money: 2-dp prices/balances, 4-dp
    * price×(1−discount) products, 6-dp ×(1+tax) charges): each addend
    * casts to DECIMAL(18, scale) — recovering the exact fixed-point
    * value its double approximates — sums EXACTLY (decimal addition
    * has no association drift), and lands as double (exact while
    * |sum|·10^scale < 2^53 ≈ 9·10^15). A plain double sum at 1e11
    * magnitude differs by ±0.01 across engines and partition orders —
    * exactly how q_tpch_q5/q9/q_ntile failed the first sf1 oracle
    * gate (round 11) while passing every smaller SF. Use with the
    * matching [[exactSumSql]] fragment; no output rounding needed —
    * the sum IS the exact fixed-point total.
    */
  def exactSum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** [[exactSum]] for high-scale addends whose exact total can exceed
    * double's 2^53 integer range at ×10^scale (e.g. the 6-dp
    * price×(1−disc)×(1+tax) charge at sf1: 4.4e10 × 10⁶ > 9e15 — the
    * decimal→double cast itself then rounds, and engines disagree on
    * the last bit): the EXACT decimal sum is first rounded to
    * `outScale` decimals IN DECIMAL (identical half-up arithmetic in
    * both engines), and only that shorter value crosses into double.
    */
  def exactSumRounded(c: Column, scale: Int, outScale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)"))
      .cast(s"decimal(38,$outScale)").cast("double")

  /** The matching DuckDB fragment for [[exactSum]]. */
  def exactSumSql(expr: String, scale: Int): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** The matching DuckDB fragment for [[exactSumRounded]]. DuckDB's
    * decimal→decimal cast TRUNCATES where Spark's rounds HALF_UP —
    * its `round()` on decimals is the half-away-from-zero that
    * matches Spark's cast, so the fragment rounds explicitly.
    */
  def exactSumRoundedSql(expr: String, scale: Int, outScale: Int): String =
    s"CAST(round(sum(CAST($expr AS DECIMAL(18,$scale))), $outScale) AS DOUBLE)"

  /** Engine-neutral 60-bit hash of a string: the low 60 bits (15 hex
    * chars — within a signed long, always positive) of its md5.
    * DuckDB computes the identical value as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT` — use wherever a hash
    * VALUE participates in oracle-checked arithmetic (bucketed model
    * keys, holder-set signatures), where xxhash64 has no DuckDB
    * counterpart. Round-18: computed by the codegen kernel
    * [[graft.plans.TextHash.md5Prefix]] — same value straight off the
    * digest bytes, no hex string / substring / base-conversion /
    * string→long parse (pinned by TextHashSpec).
    */
  def md5Long60(c: Column): Column =
    graft.plans.TextHashCols.md5Prefix(c.cast("string"), 15)

  /** The matching DuckDB fragment for [[md5Long60]]. */
  def md5Long60Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"
}
