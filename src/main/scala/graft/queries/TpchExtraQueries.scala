package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H plan shapes beyond the first waves
  * (Q2/Q6/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q20/Q21-like) — with these, 22 of
  * the 22 TPC-H plan shapes are gated across the suite. The driver's
  * star schema has no partsupp table and no shipmode/commitdate/
  * receiptdate lineitem columns, so queries that need them are
  * adapted to the available columns — the PLAN SHAPES (correlated
  * min-subquery join, pure scan-range aggregate, two-nation OR join,
  * CASE-ratio aggregation, group-agg vs global-scalar HAVING,
  * two-arm conditional count, outer-join count distribution,
  * max-of-agg self-comparison, nested semi chain, exists/not-exists
  * self-joins) are the point, not the exact TPC-H business question.
  *
  * Scale notes: every dim table (nation/region/part/supplier/
  * customer at TPC-H card ratios) broadcasts; the only data-sized
  * shuffles are lineitem⋈orders on orderkey and the groupBys on
  * already-aggregated keys. Q21's exists/not-exists are semi/anti
  * hash joins co-partitioned on l_orderkey — an order's lines land in
  * one partition, so the self-joins never carry the fact table twice.
  */
object TpchExtraQueries {
  type Q = (SparkSession, String) => DataFrame

  private def volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Map[String, Q] = Map(
    // 86. Q7 volume shipping: nation-pair trade by year, both
    //     directions of the pair in one OR-join — nations broadcast
    //     twice under different aliases.
    "q_tpch_q7" -> ((s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("nk1"),
        col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("nk2"),
        col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("nk1"))
        .join(broadcast(n2), col("c_nationkey") === col("nk2"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(graft.functions.EngineNeutral.exactSum(volume, 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // 87. Q8 market share: one nation's share of regional volume per
    //     year — a CASE-conditional ratio of two sums, floor-rounded
    //     (EngineNeutral) because ratios of order-dependent sums can
    //     land on round-boundary bits.
    "q_tpch_q8" -> ((s, d) => {
      val n1 = Tables.nation(s, d).select(col("n_nationkey").as("nk1"),
        col("n_regionkey").as("rk1"))
      val n2 = Tables.nation(s, d).select(col("n_nationkey").as("nk2"),
        col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("nk1"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("rk1") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("nk2"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(graft.functions.EngineNeutral.roundHalfUp(
          graft.functions.EngineNeutral.exactSum(
            when(col("supp_nation") === "NATION_3", volume).otherwise(0.0), 4) /
            graft.functions.EngineNeutral.exactSum(volume, 4), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // 88. Q9 product-type profit by supplier nation and year;
    //     p_retailprice·quantity stands in for the missing
    //     ps_supplycost. The like-filter prunes part BEFORE broadcast.
    "q_tpch_q9" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(graft.functions.EngineNeutral.exactSum(
          volume - col("p_retailprice") * col("l_quantity"), 4)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)),

    // 89. Q13 customer order-count distribution: LEFT join keeps
    //     zero-order customers; the priority filter applies to the
    //     RIGHT side before the join (equivalent to the SQL ON-clause
    //     condition) — a post-join WHERE would turn the outer join
    //     inner and drop the zero-order bucket.
    "q_tpch_q13" -> ((s, d) => {
      val counts = Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // 90. Q15 top supplier: revenue per supplier in a quarter, keep
    //     the max — the scalar-subquery self-comparison runs on the
    //     already-aggregated (100-row) table, broadcast both ways.
    //     The max is derived from the SAME frame and compared on the
    //     UNROUNDED sum: a rounded equi-join can flip which supplier
    //     matches when a sum lands within an ulp of a half-cent
    //     boundary (order-dependent summation), and recomputing rev on
    //     both branches would double the lineitem scan unless
    //     exchange-reuse luck holds (PlanShapeSpec pins the reuse).
    //     Rounding happens once, on output.
    "q_tpch_q15" -> ((s, d) => {
      // the explicit isNotNull mirrors what the join branch would have
      // inferred anyway — WITHOUT it the two rev consumers canonicalize
      // differently (only the join side gets the inferred null filter)
      // and the lineitem scan + suppkey shuffle run twice instead of
      // the exchange being reused
      val rev = Tables.lineitem(s, d)
        .filter(col("l_suppkey").isNotNull &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(graft.functions.EngineNeutral.exactSum(volume, 4).as("rev_raw"))
      val mx = rev.agg(max("rev_raw").as("mx"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(mx), col("rev_raw") === col("mx"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_raw").as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // 91. Q21 waiting-supplier shape: lines that are the strictly
    //     latest shipment in a multi-supplier order — EXISTS (another
    //     supplier in the order) as a left-semi join and NOT EXISTS
    //     (another supplier shipping later) as a left-anti join, both
    //     equi on l_orderkey so the self-joins stay co-partitioned.
    "q_tpch_q21" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_linenumber", "l_shipdate")
      val other = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val later = l.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
      l.join(other, col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(later, col("l_orderkey") === col("o3") &&
          col("l_suppkey") =!= col("s3") && col("d3") > col("l_shipdate"), "left_anti")
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // 95. Q6 forecasting-revenue: the PURE SCAN-RANGE AGGREGATE — no
    //     join, no grouping; the whole query is predicate pushdown +
    //     a one-row map-side-combined sum. The pushdown smoke test:
    //     every filter must reach the parquet scan (PlanShapeSpec
    //     asserts PushedFilters) and shuffle is one partial-agg row
    //     per partition.
    "q_tpch_q6" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(graft.functions.EngineNeutral.exactSum(
          col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))),

    // 96. Q11 important-stock shape: group-aggregate vs a GLOBAL
    //     scalar in the HAVING — parts whose stock value (price ×
    //     quantity over one region's suppliers, standing in for the
    //     missing partsupp) exceeds 1.5× the mean part value. The
    //     threshold derives from the SAME aggregated frame (exchange
    //     reuse, not a second lineitem scan — same trick as q15) and
    //     is mean-relative so the shape is scale-invariant where
    //     TPC-H's literal 0.0001/SF fraction is not.
    "q_tpch_q11" -> ((s, d) => {
      val byPart = Tables.lineitem(s, d)
        .filter(col("l_partkey").isNotNull)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("l_partkey"))
        .agg(graft.functions.EngineNeutral.exactSum(
          col("l_extendedprice") * col("l_quantity"), 2).as("value_raw"))
      // association order mirrors the oracle's `1.5 * sum / count`
      // exactly — a different double association ((sum/count)*1.5) can
      // differ by an ulp and flip the strict > gate on a boundary part
      val thr = byPart.agg(
        (lit(1.5) * sum(col("value_raw").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("thr"))
      byPart.crossJoin(broadcast(thr))
        .filter(col("value_raw") > col("thr"))
        .select(col("l_partkey"), col("value_raw").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // 97. Q12 shipping-priority shape: the TWO-ARM CONDITIONAL COUNT —
    //     late lines (shipped after the order date, standing in for
    //     the missing commit/receipt dates) per linestatus (standing
    //     in for shipmode), split into high- vs low-priority orders in
    //     one pass with sum(CASE). One fact-fact equi-join on
    //     orderkey, map-side-combined counts.
    "q_tpch_q12" -> ((s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // 98. Q20 potential-promotion shape: the NESTED SEMI CHAIN —
    //     suppliers (in one region) who shipped > 30 units of some
    //     red-named part: part-name filter as an inner broadcast
    //     semi-join, a (suppkey, partkey) HAVING aggregate, then the
    //     supplier-level semi-join. No fact rows survive past the
    //     aggregate; both semi joins carry keys only.
    "q_tpch_q20" -> ((s, d) => {
      val shippers = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red%"))
          .select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum("l_quantity").as("qty"))
        .filter(col("qty") > 30)
      Tables.supplier(s, d)
        .join(shippers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }),

    // 92. Q2 min-cost-supplier shape: per (part, supplier) unit cost
    //     from lineitem (no partsupp table), then the correlated
    //     "= (SELECT min ...)" realized as an equi-join against the
    //     per-part min — both aggregates shuffle key-width rows only.
    //     unit_cost is a single division + min (no summation), so the
    //     doubles are bit-identical cross-engine with no rounding.
    "q_tpch_q2" -> ((s, d) => {
      val parts = Tables.part(s, d).filter(col("p_size").between(10, 20))
      // push the part filter BELOW the aggregation as a broadcast
      // semi-join: the per-part min is computed within each part's own
      // lines, so pre-dropping ineligible parts changes nothing except
      // the aggregation input size (~78% cut at uniform p_size 1-50)
      val cost = Tables.lineitem(s, d)
        .join(broadcast(parts.select("p_partkey")),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val best = cost.groupBy(col("l_partkey").as("bp"))
        .agg(min("unit_cost").as("min_cost"))
      cost
        .join(best, col("l_partkey") === col("bp") &&
          col("unit_cost") === col("min_cost"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "unit_cost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
        .limit(20)
    }))

  val oracles: Map[String, String] = Map(
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  floor(CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        |    / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year,
        |  CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    l_extendedprice * (1.0 - l_discount)
        |      - p_retailprice * l_quantity AS amount
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS rev_raw
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, rev_raw AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE rev_raw = (SELECT max(rev_raw) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait FROM (
        |  SELECT s_name, l1.l_orderkey, l1.l_linenumber
        |  FROM lineitem l1
        |  JOIN supplier ON l1.l_suppkey = s_suppkey
        |  WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate))
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_tpch_q11" ->
      """WITH byPart AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value_raw
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value_raw AS value
        |FROM byPart
        |WHERE value_raw > (SELECT 1.5 * CAST(sum(CAST(value_raw AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM byPart)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 30)
        |ORDER BY s_name""".stripMargin,
    "q_tpch_q2" ->
      """WITH cost AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |best AS (
        |  SELECT l_partkey AS bp, min(unit_cost) AS min_cost FROM cost GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, unit_cost
        |FROM cost
        |JOIN best ON cost.l_partkey = bp AND unit_cost = min_cost
        |JOIN part ON cost.l_partkey = p_partkey
        |JOIN supplier ON cost.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size BETWEEN 10 AND 20 AND r_name = 'EUROPE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20""".stripMargin)
}
