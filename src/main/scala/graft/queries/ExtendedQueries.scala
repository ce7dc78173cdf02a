package graft.queries

import graft.Tables
import graft.functions.EngineNeutral
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third-wave operators (SURVEY.md §2 rows 58-69): JSON extraction,
  * event funnels, blocked record linkage, ordered string aggregation,
  * rank-family windows, first/last/nth windows, salted skew joins as a
  * gated query, time-range self-joins, vector quantization, cohort
  * retention, approximate percentiles, and time-series resampling.
  */
object ExtendedQueries {
  type Q = (SparkSession, String) => DataFrame

  // one linkage-index build per sf dir per suite run (the
  // lexIndexCache convention): the INDEXED query's per-run cost is the
  // pairs read, exactly what production pays after the build
  private val linkageIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, Q] = Map(
    // 58. JSON extraction: pull typed fields out of a JSON payload
    //     column and aggregate. get_json_object is a native streaming
    //     path evaluator (CodegenFallback, so the Project runs
    //     interpreted — but single-pass Jackson, no UDF, no full-doc
    //     materialization); the aggregation on top stays partial→final.
    "q_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")),

    // 59. Event funnel: users whose first click converts to a purchase
    //     within 24 hours, with the conversion timestamp. Two
    //     hash-partitioned passes on user_id — the first-click
    //     aggregation reuses its shuffle for the purchase join under
    //     AQE; no window over the full event stream.
    "q_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firstClick = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min(col("ts")).as("first_click"))
      ev.filter(col("event_type") === "purchase").as("p")
        .join(firstClick.as("c"), col("p.user_id") === col("c.user_id"))
        .filter(col("p.ts") > col("first_click") &&
          col("p.ts") <= col("first_click") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("p.user_id").as("user_id"), col("first_click"))
        .agg(min(col("p.ts")).as("first_conversion"))
        .select(col("user_id"),
          date_format(col("first_click"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_click"),
          date_format(col("first_conversion"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_conversion"))
        .orderBy("user_id")
    }),

    // 60. Blocked record linkage: the classic scale shape for fuzzy
    //     matching — equi-join on a cheap blocking key (here
    //     nation × segment) so candidate pairs stay near-linear, then
    //     verify each candidate with an exact edit distance. Never
    //     all-pairs: the block join is a plain hash join and the
    //     quadratic step runs only within blocks.
    "q_linkage" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      // deletion-neighborhood blocking (EditDistanceJoin): the naive
      // in-block self-join is quadratic in block size under the FIXED
      // nation×segment block count — candidates here are near-pair-
      // proportional instead, and the oracle keeps the declarative
      // in-block form (same result set, proven exact for dist ≤ 2)
      graft.operators.EditDistanceJoin.selfJoin(
          c, idCol = "c_custkey", nameCol = "c_name",
          blockCols = Seq("c_nationkey", "c_mktsegment"), maxDist = 2)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy("id_a", "id_b")
    }),

    // 60b. The same linkage through the PERSISTED index (the
    //      q_bm25_indexed convention): writeIndex commits the
    //      deletion-neighborhood keys + verified pair set once per
    //      corpus version; serving is a pairs/ read — no variant
    //      enumeration, no candidate join, no Levenshtein pass.
    //      Gated against the SAME oracle as q_linkage, so index build
    //      + indexed serving are driver-verified end to end.
    "q_linkage_indexed" -> ((s, d) => {
      val root = linkageIndexCache.computeIfAbsent(d, _ => {
        val r = java.nio.file.Files.createTempDirectory("graft_linkidx").toString
        graft.functions.LinkageIndex.writeIndex(
          Tables.customer(s, d)
            .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
          "c_custkey", "c_name", Seq("c_nationkey", "c_mktsegment"), r)
        r
      })
      val vdir = graft.operators.Versioned.resolve(s, root).get
      graft.functions.LinkageIndex.readPairs(s, vdir)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy("id_a", "id_b")
    }),

    // 61. Ordered string aggregation (LISTAGG) — bounded by running it
    //     over the native top-k operator's survivors (≤3 rows per
    //     nation), never over raw groups: an unbounded listagg is a
    //     driver-OOM generator at scale.
    "q_listagg" -> ((s, d) => {
      val joined = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
      graft.plans.TopKPerKey.topK(joined, Seq("n_name"),
          Seq("c_acctbal" -> true, "c_custkey" -> false), k = 3)
        .groupBy("n_name")
        .agg(array_join(sort_array(collect_list(col("c_name"))), ",").as("top_names"))
        .orderBy("n_name")
    }),

    // 62. Rank-family windows: percent_rank / cume_dist / ntile in ONE
    //     window spec (deterministic total order via the custkey
    //     tiebreak), so the whole family shares a single
    //     shuffle + sort.
    "q_percent_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).as("tile"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // 63. Value-position windows: lag/lead/first/last/nth over each
    //     customer's order history — again one window spec, one
    //     shuffle; last/nth need the explicit full frame.
    "q_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          first("o_totalprice").over(full).as("first_price"),
          last("o_totalprice").over(full).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy("o_orderkey")
    }),

    // 64. Salted skew join as a gated query (the operator itself is
    //     spec-tested): orders' hot customers split across 8 salted
    //     reducers, customer replicated 8×; result is row-identical to
    //     the plain join, which is exactly what the oracle checks.
    "q_join_skew" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .withColumnRenamed("c_custkey", "o_custkey")
      graft.operators.SkewJoin
        .saltedEquiJoin(Tables.orders(s, d), cust, "o_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          graft.functions.EngineNeutral.exactSum(col("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment")
    }),

    // 65. Time-range self-join: clicks in the 4 hours before each
    //     purchase, per user. The user_id equi-key keeps it a hash
    //     join with the range as a residual filter — at 100 TB you
    //     would additionally bucket both sides by (user, time window)
    //     so the residual never sees more than two buckets.
    "q_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("pts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cuser"), col("ts").as("cts"), col("value"))
      p.join(c, col("user_id") === col("cuser") &&
          col("cts") >= col("pts") - expr("INTERVAL 4 HOURS") &&
          col("cts") < col("pts"))
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"),
          EngineNeutral.exactSum(col("value"), 2).as("click_value"))
        .orderBy("event_id")
    }),

    // 66. Vector normalize + int8 quantization, fused into ONE
    //     codegen'd expression (plans.ArrayNormQuantize): norm and
    //     per-element floor(x/norm·127 + 0.5) in a single pass —
    //     the interpreted transform() HOF it replaces would dominate
    //     a 100 TB embedding sweep. Output is scalar projections of
    //     the quantized vector (sum/min/max/first): any
    //     single-element divergence shifts q_sum, and array columns
    //     would defeat the oracle's row-sorting compare.
    "q_vector_quantize" -> ((s, d) => {
      val e = graft.Tables.spread(Tables.embeddings(s, d))
        .withColumn("v", col("embedding").cast("array<double>"))
        .withColumn("norm", sqrt(graft.functions.Similarity.dot(col("v"), col("v"))))
        .withColumn("q",
          graft.plans.ArrayNormQuantize.array_norm_quantize(col("v"), 127))
      e.select(col("vec_id"),
          EngineNeutral.roundHalfUp(col("norm"), 6).as("norm_r6"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          element_at(col("q"), 1).as("q0"))
        .orderBy("vec_id")
    }),

    // 67. Cohort retention: users grouped by first-seen day, distinct
    //     actives per day offset. Two user_id-partitioned aggregations
    //     and one join — the cohort table is tiny relative to events
    //     and broadcasts; all counts are exact ints.
    "q_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // 67b. Time-to-convert survival (round 18): Kaplan-Meier curve of
    //      days from a user's first signup to their first subsequent
    //      purchase. With censoring only at the observation end (all
    //      users share one window), the KM product telescopes to
    //      EXACT integer ratios — S(d) = (n₀ − converted≤d)/n₀ — so
    //      no float products and the oracle matches bit-for-bit.
    //      Shape is the q_threshold_sweep broadcast-grid scan: the
    //      user-level conversion table cross-joins a fixed 30-day
    //      literal grid and partial aggregation collapses map-side to
    //      ≤30 rows per partition — no global window, no no-equi-key
    //      self-join, corpus-scale-safe. Day offsets are tz-free
    //      integer floor-divs on epoch micros (unix_micros ≡
    //      epoch_us).
    "q_time_to_convert" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t0_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val conv = su.join(pu, Seq("user_id"), "left")
        .groupBy("user_id", "t0_us")
        .agg(min(when(col("p_us") >= col("t0_us"), col("p_us"))).as("ct_us"))
        .select(expr("(ct_us - t0_us) div 86400000000").as("day"))
      val grid = s.range(0, 30).select(col("id").as("d"))
      conv.crossJoin(broadcast(grid))
        .groupBy("d")
        .agg(count(lit(1)).as("n_cohort"),
          sum(when(col("day") < col("d"), 1L).otherwise(0L)).as("n_lt"),
          sum(when(col("day") === col("d"), 1L).otherwise(0L)).as("n_eq"))
        .select(col("d").as("day"),
          (col("n_cohort") - col("n_lt")).as("n_at_risk"),
          col("n_eq").as("n_converted"),
          ((col("n_cohort") - col("n_lt") - col("n_eq")).cast("double") /
            col("n_cohort")).as("survival"))
        .orderBy("day")
    }),

    // 69. Time-series resample: per-user hourly grid from first to
    //     last purchase with gaps forward-filled. Formulated WITHOUT a
    //     grid⋈hourly join: each hourly row explodes across its own
    //     gap span (hl .. lead(hl)−1, epoch-hour longs), so gap hours
    //     inherit the origin row's value — exactly what
    //     last(v, ignoreNulls) over a running frame produces, since v
    //     is non-null on every hourly row. The explode runs AFTER the
    //     key shuffle in the final stage (the earlier join form let
    //     AQE broadcast the exploded grid from its tiny pre-explode
    //     size estimate: a single 6.6 s build task at sf1 and a
    //     driver OOM at scale), and long sequences replace per-element
    //     calendar-interval arithmetic.
    "q_resample" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (date_trunc("hour", col("ts")).cast("long") / 3600).cast("long").as("hl"),
          col("value"))
        .groupBy("user_id", "hl")
        .agg(EngineNeutral.exactSum(col("value"), 2).as("v"),
          count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("hl")
      hourly
        .withColumn("next_hl", lead(col("hl"), 1).over(w))
        .select(col("user_id"), col("n"), col("v"), col("hl").as("h0"),
          explode(sequence(col("hl"),
            coalesce(col("next_hl") - 1, col("hl")))).as("ghl"))
        .select(col("user_id"),
          date_format(timestamp_seconds(col("ghl") * 3600),
            "yyyy-MM-dd HH:mm").as("hr"),
          when(col("ghl") === col("h0"), col("n")).otherwise(lit(0L)).as("n"),
          col("v").as("ff_value"))
        .orderBy("user_id", "hr")
    }),

    // 68. Approximate percentiles (GK-style mergeable sketch, rank
    //     error ≤ n/accuracy): the bounded-memory counterpart of
    //     ExactPercentile — sketch when ±ε·n rank slack is fine,
    //     exact rank-selection when bit-exactness matters. Rows-only:
    //     DuckDB's approx_quantile is a different sketch; the
    //     quantitative gate is the rank-error invariant in
    //     RowsOnlyInvariantsSpec.
    "q_approx_percentile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("qs"))
        .select(col("l_returnflag"),
          element_at(col("qs"), 1).as("p50"),
          element_at(col("qs"), 2).as("p95"))
        .orderBy("l_returnflag")))

  val oracles: Map[String, String] = Map(
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, min(ts) AS first_click FROM events
        |  WHERE event_type = 'click' GROUP BY user_id)
        |SELECT p.user_id,
        |  strftime(fc.first_click, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
        |  strftime(min(p.ts), '%Y-%m-%d %H:%M:%S.%f') AS first_conversion
        |FROM events p JOIN fc ON p.user_id = fc.user_id
        |WHERE p.event_type = 'purchase'
        |  AND p.ts > fc.first_click
        |  AND p.ts <= fc.first_click + INTERVAL 24 HOUR
        |GROUP BY p.user_id, fc.first_click ORDER BY p.user_id""".stripMargin,
    "q_linkage" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        | AND a.c_mktsegment = b.c_mktsegment
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // the indexed route must reproduce the in-job result EXACTLY —
    // one truth, two physical paths
    "q_linkage_indexed" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey
        | AND a.c_mktsegment = b.c_mktsegment
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q_listagg" ->
      """SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS top_names
        |FROM (
        |  SELECT n_name, c_name,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |WHERE rn <= 3 GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_percent_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  ntile(4) OVER w AS tile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_totalprice) OVER wf AS first_price,
        |  last_value(o_totalprice) OVER wf AS last_price,
        |  nth_value(o_totalprice, 2) OVER wf AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q_join_skew" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id, count(*) AS n_clicks,
        |  CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 4 HOUR
        | AND c.ts < p.ts
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_vector_quantize" ->
      """WITH t AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, norm,
        |    list_transform(v, x -> CAST(floor(x / norm * 127 + 0.5) AS INT)) AS qv
        |  FROM t)
        |SELECT vec_id,
        |  floor(norm * 1000000 + 0.5) / 1000000.0 AS norm_r6,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  list_aggregate(qv, 'min') AS q_min,
        |  list_aggregate(qv, 'max') AS q_max,
        |  qv[1] AS q0
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_resample" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, value
        |  FROM events WHERE event_type = 'purchase'),
        |hourly AS (
        |  SELECT user_id, hr,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v, count(*) AS n
        |  FROM ev GROUP BY user_id, hr),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(min(hr), max(hr),
        |    INTERVAL 1 HOUR)) AS hr
        |  FROM ev GROUP BY user_id)
        |SELECT g.user_id, strftime(g.hr, '%Y-%m-%d %H:%M') AS hr,
        |  coalesce(h.n, 0) AS n,
        |  last_value(h.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.hr = h.hr
        |ORDER BY g.user_id, hr""".stripMargin,
    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', c.cohort_day, e.day) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |GROUP BY c.cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    // epoch_us ≡ Spark's unix_micros (integer micros); // ≡ div on
    // positive longs; NULL day (never-converted) falls out of both
    // engines' conditional counts identically; counts stay BIGINT
    // (count, not sum) so no HUGEINT leaks
    "q_time_to_convert" ->
      """WITH su AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t0_us FROM events
        |  WHERE event_type = 'signup' GROUP BY 1
        |), pu AS (
        |  SELECT user_id, epoch_us(ts) AS p_us FROM events
        |  WHERE event_type = 'purchase'
        |), conv AS (
        |  SELECT s.user_id,
        |    (min(CASE WHEN p.p_us >= s.t0_us THEN p.p_us END) - s.t0_us)
        |      // 86400000000 AS day
        |  FROM su s LEFT JOIN pu p USING (user_id)
        |  GROUP BY s.user_id, s.t0_us
        |)
        |SELECT g.d AS day,
        |  count(*) - count(CASE WHEN c.day < g.d THEN 1 END) AS n_at_risk,
        |  count(CASE WHEN c.day = g.d THEN 1 END) AS n_converted,
        |  (count(*) - count(CASE WHEN c.day <= g.d THEN 1 END))::DOUBLE
        |    / count(*) AS survival
        |FROM conv c CROSS JOIN range(30) g(d)
        |GROUP BY g.d ORDER BY day""".stripMargin)
}
