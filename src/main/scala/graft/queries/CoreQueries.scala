package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pippin-parity operators expressed as declarative DataFrame plans.
  *
  * Each query demonstrates one operator from SURVEY.md §2 rows 1-17
  * (reference semantics: /root/reference/stages/transform/transform.go,
  * /root/reference/stages/aggregate/aggregate.go). The pipeline-API
  * face of the same operators lives in [[graft.pipeline]]; these
  * column-level forms are what a 100 TB job should run — fully
  * codegen'd, pushdown-friendly, no lambdas.
  *
  * Oracle parity rules (SURVEY.md §6): identical aliases both sides,
  * deterministic ORDER BY, round(·,2) only on aggregated doubles
  * (element-wise IEEE arithmetic is bit-reproducible across engines;
  * parallel summation is not).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // 1. Map: 1→1 projection with arithmetic (transform.Map).
    "q_map" -> ((s, d) =>
      // prune BEFORE the round-robin spread: the repartition is a
      // pushdown barrier, so an early select keeps the shuffle at 4
      // columns instead of lineitem's 16
      Tables.spread(Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")),

    // 2. MapWithError: try-parse, errored elements dropped
    //    (transform.MapWithError drops inputs whose mapFunc errs).
    "q_map_with_error" -> ((s, d) =>
      Tables.spread(Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_linenumber") % 2 === 0, col("l_quantity").cast("string"))
            .otherwise(col("l_returnflag")).as("mixed"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          expr("try_cast(mixed AS double)").as("parsed"))
        .filter(col("parsed").isNotNull)
        .orderBy("l_orderkey", "l_linenumber")),

    // 3. MapWithErrorMapper: try-parse, errors mapped to a fallback value.
    "q_map_error_mapper" -> ((s, d) =>
      Tables.spread(Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_linenumber") % 2 === 0, col("l_quantity").cast("string"))
            .otherwise(col("l_returnflag")).as("mixed"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          coalesce(expr("try_cast(mixed AS double)"), lit(-1.0)).as("parsed"))
        .orderBy("l_orderkey", "l_linenumber")),

    // 4. FlatMap: one input → many outputs (explode).
    "q_flatmap" -> ((s, d) =>
      Tables.spread(Tables.documents(s, d))
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("doc_id", "token").agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "token")),

    // 5. Filter.
    "q_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_discount") < 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy("l_orderkey", "l_linenumber")),

    // 6. Sum (map-side partial agg; single-row result). Money sums
    //    use the exact decimal form (EngineNeutral.exactSum): a plain
    //    double sum differs by ±0.01 across engines at sf1 magnitude.
    "q_sum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(graft.functions.EngineNeutral.exactSum(col("l_extendedprice"), 2)
          .as("total"))),

    // 7. Avg (engine-neutral rounding: int/int ratios can land exactly
    //    on the .xx5 boundary where Spark and DuckDB round() disagree).
    "q_avg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(graft.functions.EngineNeutral.r2(avg("l_quantity")).as("avg_qty"))),

    // 8. Min + Max (exact on doubles: no summation order involved).
    "q_min_max" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(min("l_extendedprice").as("min_price"),
             max("l_extendedprice").as("max_price"))),

    // 9. Count.
    "q_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))),

    // 10. Sort / SortDesc — top-100 = TakeOrdered, no full-result shuffle
    //     to one partition; ties broken by key for determinism.
    "q_sort" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    // 11. GroupBy: key → aggregated group contents.
    "q_groupby" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")),

    // 12. Reduce: binary fold ≡ associative aggregate (min over strings).
    "q_reduce" -> ((s, d) =>
      Tables.customer(s, d).agg(min("c_name").as("min_name"))),

    // 13. AsMap: key→value materialization (stays distributed here;
    //     .collect() only at the user's request in the pipeline API).
    "q_as_map" -> ((s, d) =>
      Tables.nation(s, d)
        .select(col("n_nationkey").as("key"), col("n_name").as("value"))
        .orderBy("key")),

    // 14. AsMultiMap: key → all values; list rendered as a sorted
    //     joined string for engine-neutral comparison.
    "q_as_multimap" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey").as("key"))
        .agg(array_join(sort_array(collect_list("n_name")), ",").as("names"))
        .orderBy("key")),

    // 15. Distinct.
    "q_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // 16. DistinctCount.
    "q_distinct_count" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(countDistinct("l_partkey").as("n"))),

    // 17. FromMap source: a driver-side Map[K,V] becomes a distributed
    //     (key,value) Dataset (pipeline.FromMap).
    "q_from_map" -> ((s, d) => {
      import s.implicits._
      val m: Map[String, Int] = Tables.nation(s, d)
        .select("n_name", "n_nationkey")
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      graft.pipeline.Pipeline.fromMap(s, m).toDF("key", "value")
        .orderBy("key")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_map" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_map_with_error" ->
      """SELECT l_orderkey, l_linenumber, parsed FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    TRY_CAST(CASE WHEN l_linenumber % 2 = 0
        |      THEN CAST(l_quantity AS VARCHAR) ELSE l_returnflag END AS DOUBLE) AS parsed
        |  FROM lineitem)
        |WHERE parsed IS NOT NULL ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_map_error_mapper" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(TRY_CAST(CASE WHEN l_linenumber % 2 = 0
        |    THEN CAST(l_quantity AS VARCHAR) ELSE l_returnflag END AS DOUBLE), -1.0) AS parsed
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_flatmap" ->
      """SELECT doc_id, token, count(*) AS n FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |  WHERE doc_id < 100)
        |WHERE length(token) > 0
        |GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_sum" ->
      ("SELECT " + graft.functions.EngineNeutral.exactSumSql("l_extendedprice", 2)
        + " AS total FROM lineitem"),
    "q_avg" ->
      "SELECT floor(avg(l_quantity) * 100 + 0.5) / 100.0 AS avg_qty FROM lineitem",
    "q_min_max" ->
      """SELECT min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price FROM lineitem""".stripMargin,
    "q_count" ->
      "SELECT count(*) AS n FROM lineitem",
    "q_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_groupby" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_reduce" ->
      "SELECT min(c_name) AS min_name FROM customer",
    "q_as_map" ->
      "SELECT n_nationkey AS key, n_name AS value FROM nation ORDER BY key",
    "q_as_multimap" ->
      """SELECT n_regionkey AS key,
        |  array_to_string(list(n_name ORDER BY n_name), ',') AS names
        |FROM nation GROUP BY n_regionkey ORDER BY key""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct_count" ->
      "SELECT count(DISTINCT l_partkey) AS n FROM lineitem",
    "q_from_map" ->
      "SELECT n_name AS key, n_nationkey AS value FROM nation ORDER BY key"
  )
}
