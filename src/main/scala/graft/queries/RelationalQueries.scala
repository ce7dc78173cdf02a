package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytics layer (SURVEY.md §2 rows 19-27): the engine
  * around the pipeline operators. Dimension tables are broadcast
  * explicitly; fact-fact joins shuffle on their keys and are AQE
  * re-plannable; every aggregate is partial→final.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // 19. Broadcast hash join: dim (customer) broadcast to the fact scan.
    "q_join_broadcast" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(graft.functions.EngineNeutral.exactSum(col("o_totalprice"), 2)
          .as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")),

    // 20. Multi-way join + agg (TPC-H Q3 shape): broadcast customer,
    //     shuffle lineitem⋈orders on the order key.
    "q_join_multi" -> ((s, d) =>
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > expr("TIMESTAMP '1998-01-01 00:00:00'"))
        .groupBy("o_orderkey")
        .agg(graft.functions.EngineNeutral.exactSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)),

    // 21. TPC-H Q1: the classic pricing summary.
    //     Round-19 wave 3: prune-then-spread — the single-row-group
    //     lineitem scan fused the whole decimal-heavy aggregate into
    //     ONE task (StageProfile: 1.1 s wall ≈ 1.1 CPU-s, serial); the
    //     early select keeps the round-robin shuffle at the 7 needed
    //     columns and the partial aggregate then runs 32-way. The
    //     three averages move to exact decimal sums over count
    //     (identical machinery to the exactSum columns beside them):
    //     a double avg's partial-sum merge order would become
    //     partition-dependent under the spread, while the decimal sums
    //     are exact in ANY order — the result is bit-stable across
    //     partitionings and the r2/r4 outputs match the oracle's
    //     (order-independent to well below the rounding step; gate
    //     re-verified at sf0.001/0.01/0.1). spreadIfSerial, not spread:
    //     a multi-file table already scans in parallel and the exchange
    //     is pure overhead there (sf1: 0.75 s unspread vs 1.45 spread).
    "q_tpch_q1" -> ((s, d) =>
      Tables.spreadIfSerial(Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= expr("TIMESTAMP '2000-09-02 00:00:00'"))
          .select("l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          graft.functions.EngineNeutral.exactSum(col("l_extendedprice"), 2)
            .as("sum_base_price"),
          graft.functions.EngineNeutral.exactSum(
            col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          graft.functions.EngineNeutral.exactSumRounded(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")), 6, 2)
            .as("sum_charge"),
          // qty is integer-valued: its double sum is exact (< 2^53) in
          // any order, so plain avg stays deterministic under the spread
          graft.functions.EngineNeutral.r2(avg("l_quantity")).as("avg_qty"),
          // discount is 2-dp: sum exact integer CENTS (one long buffer —
          // cheaper than a decimal sum, same exact total; the q_cusum
          // quantization convention)
          sum(floor(col("l_discount") * 100 + lit(0.5)).cast("long"))
            .as("_disc_cents"),
          count(lit(1)).as("count_order"))
        // avg_price derives from the EXACT sum already computed one
        // column up — no second aggregate buffer; avg_disc from the
        // exact cents total. Both order-free, both bit-equal to a
        // decimal-sum/count mean (an exact rational rounds to the same
        // nearest double either way).
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
          col("avg_qty"),
          graft.functions.EngineNeutral.r2(
            col("sum_base_price") / col("count_order")).as("avg_price"),
          graft.functions.EngineNeutral.r4(
            col("_disc_cents") / lit(100.0) / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // 22. 5-way join (TPC-H Q5 shape): all dims broadcast, one fact
    //     shuffle; revenue by supplier nation within a date window.
    "q_tpch_q5" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= expr("TIMESTAMP '1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("TIMESTAMP '1999-01-01 00:00:00'"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(graft.functions.EngineNeutral.exactSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))),

    // 21d. Exact interpolated percentiles per group (both engines use
    //      the same p·(n-1) linear-interpolation definition, so raw
    //      doubles match bit-for-bit). Rank-based range-partitioned
    //      selection, NOT Spark's `percentile()` aggregate: that
    //      buffer is a value→count map that is O(rows) per group over
    //      near-unique doubles and concentrates each group's map into
    //      one merge task — an executor OOM at 100 TB. ExactPercentile
    //      keeps every task bounded by its input split and computes
    //      the bit-identical interpolated value.
    "q_percentile" -> ((s, d) => {
      val (res, release) = graft.operators.ExactPercentile.percentilesWithHandle(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice",
        Seq(0.25, 0.5, 0.95), Seq("p25", "p50", "p95"))
      // one row per group: pin it locally, then release the big
      // range-sorted cache immediately instead of leaking it into the
      // session (the caller only ever sees the 3-row result)
      val out = res.orderBy("l_returnflag").localCheckpoint()
      release()
      out
    }),

    // 21e. Statistical aggregates (corr / stddev / covar), engine-
    //      neutrally rounded: accumulation order differs across engines.
    "q_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(
          graft.functions.EngineNeutral.r4(corr("l_quantity", "l_extendedprice")).as("corr_qty_price"),
          graft.functions.EngineNeutral.r2(stddev_samp("l_extendedprice")).as("sd_price"),
          graft.functions.EngineNeutral.r4(covar_samp("l_quantity", "l_discount")).as("cov_qty_disc"))),

    // 24b. Set operations: INTERSECT / EXCEPT over key projections.
    "q_setops" -> ((s, d) => {
      val custWithOrders = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
      val allCust = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val both = allCust.intersect(custWithOrders)
        .agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), col("n"))
      val only = allCust.except(custWithOrders)
        .agg(count(lit(1)).as("n")).select(lit("except").as("op"), col("n"))
      both.unionAll(only).orderBy("op")
    }),

    // 23. Window functions: top-3 orders per customer + running total.
    "q_window" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_total",
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"), col("running_total"))
        .orderBy("custkey", "rn")
    }),

    // 24. Semi + anti join (EXISTS / NOT EXISTS).
    "q_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
      val noO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("no_orders").as("kind"), col("n"))
      withO.unionAll(noO).orderBy("kind")
    }),

    // 24c. Full outer join: per-customer order rollup joined FULL
    //      OUTER against the customer dim — unmatched customers keep
    //      zero stats, orphan orders (none in TPC-H, but the plan
    //      handles them) keep their keys. At scale this is the one
    //      join type that can never broadcast (both sides must keep
    //      unmatched rows), so it shuffle-joins on the key.
    "q_join_outer" -> ((s, d) => {
      val spend = Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.EngineNeutral.exactSum(col("o_totalprice"), 2).as("spend"))
      Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .join(spend, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_mktsegment"), lit("NONE")).as("segment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("spend"), lit(0.0)).as("spend"))
        .orderBy("custkey")
    }),

    // 25. Time-bucket aggregation on the event stream table.
    "q_events_hourly" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.EngineNeutral.exactSum(col("value"), 2).as("total_value"))
        .orderBy("hr", "event_type")),

    // 26. Approximate distinct — a PORTABLE fixed-seed HyperLogLog
    //     (Flajolet et al. 2007; m = 1024 registers over a 60-bit
    //     md5-derived hash) composed from groupBy/max/sum, so BOTH
    //     engines reproduce the estimate bit-identically and the row
    //     is hash-gated (rows-only for 14 rounds because Spark's
    //     native approx_count_distinct sketch is engine-private —
    //     round-15 verdict ask #8). Engine-neutrality: the register
    //     fold is an EXACT integer sum (register j contributes the
    //     long 2^(51−M_j); Σ ≤ 1024·2^51 = 2^61 fits a long, and
    //     integer addition is order-free where a double Σ2^(−M_j)
    //     would be partial-aggregation-order-dependent); the only
    //     floating math is literal-derived constants divided by that
    //     one long, written in the identical order in both engines.
    //     Small-range linear counting (m·ln(m/V) below 2.5m, V = empty
    //     registers) as published; the 60-bit hash space makes the
    //     32-bit large-range collision correction unnecessary. The
    //     register shuffle is ≤ (types × 1024) rows regardless of
    //     corpus size — strictly cheaper at scale than the old
    //     rsd=0.01 sketch's 2^14-register partials.
    //     ROW CONTRACT (changed with the round-15 rebuild, by design):
    //     `n` counts non-NULL-user rows only, and event types whose
    //     user_id values are ALL NULL are absent from the output —
    //     the pre-round-15 version counted every row and kept the
    //     group. NULLs carry no distinct identity, so the estimator
    //     only sees rows that contribute to it; consumers needing the
    //     old all-rows total should take it from q_events_hourly/
    //     q_count-style ungated counts.
    "q_approx_distinct" -> ((s, d) => {
      val regs = graft.functions.PortableHll.registers(
        Tables.spread(Tables.events(s, d).select("event_type", "user_id"))
          .filter(col("user_id").isNotNull),
        Seq(col("event_type")), col("user_id"))
      graft.functions.PortableHll.estimate(regs, Seq(col("event_type")))
        .select(col("event_type"), col("est_distinct").as("approx_users"), col("n"))
        .orderBy("event_type")
    }),

    // 20b. As-of join (union+window composition, one shuffle): each
    //      purchase gets the user's latest prior-or-equal click value.
    "q_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      graft.operators.AsofJoin.asof(purchases, clicks, "user_id", "ts", Seq("click_value"))
        .select(col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          col("value"), col("click_value"))
        .orderBy("user_id", "purchase_ts", "value")
    }),

    // 21b. Hierarchical aggregation: ROLLUP over two dimensions.
    "q_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // 21c. Pivot: line status values become columns.
    "q_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")),

    // 27b. Gap-based sessionization via native session_window; the
    //      custom-state streaming form is Streams.sessionizeStream.
    "q_sessionize" -> ((s, d) =>
      graft.operators.Sessionize.batch(
          Tables.events(s, d), "user_id", "ts", "value", gap = "30 minutes")
        .orderBy("user_id", "session_start")),

    // 27. Tumbling-window aggregation — the batch-equivalent of the
    //     Structured Streaming query in graft.streaming (same window()
    //     operator; StreamingSpec proves stream/batch equivalence).
    "q_stream_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.EngineNeutral.exactSum(col("value"), 2).as("total_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("win_start", "event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        |  floor(avg(l_quantity) * 100 + 0.5) / 100.0 AS avg_qty,
        |  floor(avg(l_extendedprice) * 100 + 0.5) / 100.0 AS avg_price,
        |  floor(avg(l_discount) * 10000 + 0.5) / 10000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_tpch_q5" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS p25,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats" ->
      """SELECT
        |  floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000.0 AS corr_qty_price,
        |  floor(stddev_samp(l_extendedprice) * 100 + 0.5) / 100.0 AS sd_price,
        |  floor(covar_samp(l_quantity, l_discount) * 10000 + 0.5) / 10000.0 AS cov_qty_disc
        |FROM lineitem""".stripMargin,
    "q_setops" ->
      """SELECT op, n FROM (
        |  SELECT 'intersect' AS op, count(*) AS n FROM (
        |    SELECT c_custkey AS k FROM customer
        |    INTERSECT SELECT DISTINCT o_custkey AS k FROM orders)
        |  UNION ALL
        |  SELECT 'except' AS op, count(*) AS n FROM (
        |    SELECT c_custkey AS k FROM customer
        |    EXCEPT SELECT DISTINCT o_custkey AS k FROM orders))
        |ORDER BY op""".stripMargin,
    "q_window" ->
      """SELECT o_custkey AS custkey, o_orderkey, o_totalprice, rn, running_total FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3 ORDER BY custkey, rn""".stripMargin,
    "q_semi_anti" ->
      """SELECT kind, n FROM (
        |  SELECT 'with_orders' AS kind, count(*) AS n FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'no_orders' AS kind, count(*) AS n FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |ORDER BY kind""".stripMargin,
    "q_join_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  coalesce(c_mktsegment, 'NONE') AS segment,
        |  coalesce(n_orders, 0) AS n_orders,
        |  coalesce(spend, 0.0) AS spend
        |FROM customer FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hr,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY hr, event_type ORDER BY hr, event_type""".stripMargin,
    // the portable fixed-seed HLL, replayed exactly: integer register
    // sums (order-free), float math only on literal-derived constants
    // written in the Spark side's operation order; ::DOUBLE casts keep
    // DuckDB's decimal literals out of the float path
    "q_approx_distinct" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL
        |), r AS (
        |  SELECT event_type, h % 1024 AS bucket,
        |    CASE WHEN h // 1024 = 0 THEN 51
        |         ELSE 51 - length(bin(h // 1024)) END AS rho
        |  FROM ev
        |), regs AS (
        |  SELECT event_type, bucket, max(rho) AS mr, count(*) AS cnt
        |  FROM r GROUP BY 1, 2
        |), agg AS (
        |  SELECT event_type,
        |    sum(CAST(1 AS BIGINT) << CAST(51 - mr AS INT)) AS sp,
        |    count(*) AS nb, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM regs GROUP BY 1
        |), est AS (
        |  SELECT event_type, n, 1024 - nb AS v,
        |    (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0::DOUBLE)
        |      * 1048576.0::DOUBLE * 2251799813685248.0::DOUBLE)
        |      / CAST(sp + (1024 - nb) * (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS e
        |  FROM agg
        |)
        |SELECT event_type,
        |  CAST(CASE WHEN e <= 2560.0::DOUBLE AND v > 0
        |    THEN floor(1024.0::DOUBLE * ln(1024.0::DOUBLE / CAST(v AS DOUBLE)) + 0.5::DOUBLE)
        |    ELSE floor(e + 0.5::DOUBLE) END AS BIGINT) AS approx_users,
        |  n
        |FROM est ORDER BY event_type""".stripMargin,
    "q_asof" ->
      """WITH p AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts, max(value) AS click_value FROM events
        |  WHERE event_type = 'click' GROUP BY user_id, ts
        |)
        |SELECT p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  p.value, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, purchase_ts, p.value""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
        |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), y AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM x
        |)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_stream_window" ->
      """SELECT strftime(make_timestamp((floor(epoch(ts)/21600)*21600*1000000)::BIGINT),
        |    '%Y-%m-%d %H:%M') AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin
  )
}
