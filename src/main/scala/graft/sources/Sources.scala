package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch + streaming source helpers. Thin by design: `spark.read`
  * already gives pushdown, pruning, and split planning; these wrappers
  * pin the options that matter for correctness at scale (explicit
  * schemas — never infer on a 100 TB path — and permissive-vs-failfast
  * parsing made explicit).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with a required schema: schema inference would scan the data
    * once before the real job — never acceptable at scale.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, failFast: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  /** JSON-lines with a required schema (same inference rule). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC reader — same pushdown/pruning properties as parquet (ORC is
    * a built-in columnar source with predicate pushdown into stripe
    * and row-group indexes).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Streaming parquet directory source (file arrival = new data). */
  def parquetStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)
}
