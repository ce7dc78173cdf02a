package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory each queries/oracleSql entry covers.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_tpch_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.LlmQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.AdvancedQueries.queries ++
      graft.queries.TpchExtraQueries.queries ++
      graft.queries.GovernanceQueries.queries ++
      graft.queries.SpanQueries.queries ++
      graft.queries.SelectionQueries.queries ++
      graft.queries.ProfilingQueries.queries ++
      graft.queries.WarehouseQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.CalibrationQueries.queries ++
      graft.queries.CorpusHealthQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check
    * (hash/LSH internals that no portable SQL can reproduce).
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.LlmQueries.oracles ++
      graft.queries.CurationQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.ExtendedQueries.oracles ++
      graft.queries.AdvancedQueries.oracles ++
      graft.queries.TpchExtraQueries.oracles ++
      graft.queries.GovernanceQueries.oracles ++
      graft.queries.SpanQueries.oracles ++
      graft.queries.SelectionQueries.oracles ++
      graft.queries.ProfilingQueries.oracles ++
      graft.queries.WarehouseQueries.oracles ++
      graft.queries.SketchQueries.oracles ++
      graft.queries.CalibrationQueries.oracles ++
      graft.queries.CorpusHealthQueries.oracles
}
