package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: co-locate both sides of a recurring join
  * on the join key so the join compiles with zero Exchange — at
  * 100 TB, pre-bucketing the fact tables turns every subsequent
  * key-join/aggregation into a shuffle-free stage.
  */
object Bucketing {

  /** Writes `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Joins two pre-bucketed tables on their bucket key; with equal
    * bucket counts Catalyst plans a SortMergeJoin with no Exchange on
    * either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
