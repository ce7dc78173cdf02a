package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch sink helpers with the knobs that matter at scale: partition
  * layout (so downstream reads prune), bounded file sizes (so a 100 TB
  * write doesn't produce 10 GB or 10 KB files), and explicit modes.
  */
object Sinks {

  /** Partitioned parquet write: `partitionCols` become directory
    * partitions (downstream `WHERE` on them prunes whole directories);
    * `maxRecordsPerFile` bounds file sizes without an extra
    * repartition pass.
    */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                         maxRecordsPerFile: Long = 1000000L,
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Plain parquet write with bounded file sizes. */
  def parquet(df: DataFrame, path: String,
              maxRecordsPerFile: Long = 1000000L,
              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("maxRecordsPerFile", maxRecordsPerFile).parquet(path)

  /** ORC write (columnar alternative; same file-size bound). */
  def orc(df: DataFrame, path: String,
          maxRecordsPerFile: Long = 1000000L,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("maxRecordsPerFile", maxRecordsPerFile).orc(path)
}
