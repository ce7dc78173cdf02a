package graft.queries

import graft.Tables
import graft.functions.EngineNeutral
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave analytics operators (SURVEY.md §2 rows 52-58): CUBE /
  * GROUPING SETS, per-group top-k, quartile binning, time-range window
  * frames, exponential time-decay aggregation, embedding centroids.
  * All carry DuckDB oracles.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // 52. CUBE: all grouping combinations in one pass (partial→final
    //     agg per grouping set, single shuffle).
    "q_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // 52b. Explicit GROUPING SETS: only the two single-dimension sets —
    //      strictly less work than CUBE when marginals are all you need.
    "q_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // 53. Top-k per group: top-3 customers by balance per nation via
    //     the NATIVE bounded-heap operator (graft.plans.TopKPerKey —
    //     custom LogicalPlan + Strategy + partial/final SparkPlans):
    //     no full per-key sort, at most k rows per key per map
    //     partition shuffle. The rank window after it runs over ≤k
    //     rows per key on the operator's own hash(key) partitioning
    //     (no extra exchange). Dim broadcast.
    "q_topk_per_group" -> ((s, d) => {
      val joined = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      val top = graft.plans.TopKPerKey.topK(joined, Seq("n_name"),
        Seq("c_acctbal" -> true, "c_custkey" -> false), k = 3)
      val w = Window.partitionBy("n_name")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      top.withColumn("rank", row_number().over(w))
        .select(col("n_name"), col("rank"), col("c_custkey"), col("c_acctbal"))
        .orderBy("n_name", "rank")
    }),

    // 54. Quartile binning: exact global ntile(4) over order value —
    //     NOT Spark's ntile window (whose empty-partition Window is a
    //     single-task sort of the whole table); GlobalNtile range-
    //     partitions, ranks per partition in parallel, and assigns
    //     buckets from broadcast prefix-sum offsets. Same buckets,
    //     scalable plan.
    "q_ntile" -> ((s, d) => {
      graft.operators.GlobalNtile.ntile(Tables.orders(s, d), 4,
          Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
        .groupBy("quartile")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          graft.functions.EngineNeutral.exactSum(col("o_totalprice"), 2)
            .as("total_price"))
        .orderBy("quartile")
    }),

    // 55. Time-range window frame: per-user trailing-1h average event
    //     value (RANGE frame on the microsecond epoch — value-based,
    //     so ties in ts share one frame deterministically).
    "q_window_range" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("tsu"))
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, d)
        .filter(col("user_id") < 5)
        .withColumn("tsu", unix_micros(col("ts")))
        .withColumn("avg_1h", EngineNeutral.r2(avg("value").over(w)))
        .select(col("event_id"), col("user_id"), col("avg_1h"))
        .orderBy("event_id")
    }),

    // 56. Exponential time-decay aggregation (24h half-life-ish decay
    //     relative to the corpus max timestamp) — the standard
    //     recency-weighted rollup; one broadcast scalar + one agg pass.
    "q_decay" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val maxTs = ev.agg(max(unix_micros(col("ts"))).as("max_u"))
      ev.crossJoin(broadcast(maxTs))
        .groupBy("event_type")
        .agg(
          EngineNeutral.r2(sum(col("value") *
            exp(-((col("max_u") - unix_micros(col("ts"))) / lit(3600000000.0)) / lit(24.0))))
            .as("decayed_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // 57. Embedding centroids: dim-wise mean vector per label
    //     (posexplode + partial→final avg; shuffle rows = labels × dims).
    "q_embedding_centroid" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
        .groupBy(col("label"), (col("dim0") + 1).as("dim"))
        .agg(EngineNeutral.r4(avg(col("v").cast("double"))).as("c"))
        .orderBy("label", "dim")),

    // 58b. RFM customer segmentation (round 17): recency (days since
    //      last order vs the corpus max date — tz-free integer day
    //      arithmetic on epoch micros), frequency (order count),
    //      monetary (exact 2-dp decimal spend), each quintiled with
    //      GlobalNtile (the scalable exact ntile — three range
    //      shuffles over a CUSTOMER-sized aggregate, never the raw
    //      fact table; ntile keys carry o_custkey so the total order
    //      is tie-free and engine-reproducible). Output: the ≤125
    //      (r,f,m) segment cells with customer counts and exact-sum
    //      average spend — the classic warehouse segmentation.
    "q_rfm" -> ((s, d) => {
      val o = Tables.orders(s, d)
      // o_orderdate ships as TIMESTAMP_NTZ some rounds — date-level
      // epoch days are tz-free and layout-proof in both engines
      val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
        .cast("long")
      val cust = o.groupBy(col("o_custkey"))
        .agg(max(day).as("last_day"),
          count(lit(1)).as("frequency"),
          EngineNeutral.exactSum(col("o_totalprice"), 2).as("monetary"))
      val anchor = o.agg(max(day).as("now_day"))
      val scored = cust.crossJoin(broadcast(anchor))
        .withColumn("recency_days", col("now_day") - col("last_day"))
      val r = graft.operators.GlobalNtile.ntile(scored, 5,
        Seq(col("recency_days"), col("o_custkey")), "r_q")
      val f = graft.operators.GlobalNtile.ntile(r, 5,
        Seq(col("frequency"), col("o_custkey")), "f_q")
      val m = graft.operators.GlobalNtile.ntile(f, 5,
        Seq(col("monetary"), col("o_custkey")), "m_q")
      m.groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_customers"),
          EngineNeutral.r2(
            EngineNeutral.exactSum(col("monetary"), 2) / count(lit(1)))
            .as("avg_monetary"))
        .orderBy("r_q", "f_q", "m_q")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin,
    "q_topk_per_group" ->
      """SELECT n_name, rank, c_custkey, c_acctbal FROM (
        |  SELECT n_name, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY c_acctbal DESC, c_custkey) AS rank
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |WHERE rank <= 3 ORDER BY n_name, rank""".stripMargin,
    "q_ntile" ->
      """SELECT quartile, count(*) AS n,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM (
        |  SELECT o_totalprice,
        |    ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        |  FROM orders)
        |GROUP BY quartile ORDER BY quartile""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id,
        |  floor(avg(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) * 100 + 0.5) / 100.0
        |    AS avg_1h
        |FROM events WHERE user_id < 5 ORDER BY event_id""".stripMargin,
    "q_decay" ->
      """WITH m AS (SELECT max(epoch_us(ts)) AS max_u FROM events)
        |SELECT event_type,
        |  floor(sum(value * exp(-((max_u - epoch_us(ts)) / 3600000000.0) / 24.0))
        |    * 100 + 0.5) / 100.0 AS decayed_value,
        |  count(*) AS n
        |FROM events, m GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_embedding_centroid" ->
      """SELECT label, dim,
        |  floor(avg(v) * 10000 + 0.5) / 10000.0 AS c
        |FROM (
        |  SELECT label, unnest(range(1, len(embedding)+1)) AS dim,
        |    unnest(embedding::DOUBLE[]) AS v
        |  FROM embeddings)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    // ntile ties broken by o_custkey in both engines (total order);
    // monetary is an exact decimal sum so quintile boundaries and
    // per-cell averages are engine-identical
    "q_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
        |      AS last_day,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM orders GROUP BY 1
        |), anchor AS (
        |  SELECT max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
        |    AS now_day FROM orders
        |), scored AS (
        |  SELECT o_custkey, (now_day - last_day) AS recency_days, frequency, monetary,
        |    ntile(5) OVER (ORDER BY now_day - last_day, o_custkey) AS r_q,
        |    ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_q,
        |    ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_q
        |  FROM cust, anchor
        |)
        |SELECT r_q, f_q, m_q, count(*) AS n_customers,
        |  floor(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    * 100 + 0.5) / 100.0 AS avg_monetary
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  )
}
