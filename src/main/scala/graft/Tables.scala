package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir.
  * Reads are plain `spark.read.parquet` so Catalyst handles column
  * pruning + predicate pushdown; at cluster scale the same call reads
  * a partitioned directory unchanged.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Round-robin repartition to full parallelism. The driver test
    * files are single-row-group parquet, so a scan (and everything
    * fused into its stage) otherwise runs as ONE task; expression-
    * heavy per-row pipelines pay a cheap shuffle here to use every
    * core. On a real multi-file/multi-row-group table this is a no-op
    * decision — don't call it when the scan already splits.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** [[spread]] only when the source is a SINGLE file — the case where
    * a single-row-group test parquet pins the whole scan (and anything
    * fused into it) to one task. A multi-file table (every ScaleUp dir,
    * every production table) already splits across tasks, and the
    * round-robin exchange would just re-shuffle corpus-linear bytes for
    * nothing (measured on q_tpch_q1 at sf1: 0.75 s unspread vs 1.45 s
    * spread, 86 MB of pure overhead). A single LARGE file with many
    * row groups also splits fine and pays one unneeded exchange here —
    * acceptable: that layout occurs in neither the test data nor a
    * sanely-written production table.
    */
  def spreadIfSerial(df: DataFrame): DataFrame =
    if (df.inputFiles.length <= 1) spread(df) else df

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.ts arrives in whichever timestamp layout the generator
    * last used — the driver has shipped both parquet TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects; read nanos as long and
    * integer-divide to micros — no double round-trip, which would
    * lose precision above 2^53) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which Spark reads as TIMESTAMP_NTZ).
    * Branch on the INFERRED type so every layout lands on the same
    * session-TZ TimestampType column and downstream queries + oracle
    * hashes are layout-independent (sessions run UTC, so the NTZ →
    * TimestampType cast reinterprets the same wall-clock instant).
    *
    * Note: nanosAsLong is a session conf (not a per-read option), so
    * it stays set afterwards. It only affects TIMESTAMP(NANOS)
    * columns — events is the sole such table here — and turning it
    * off mid-session could break this table's lazy re-scans, so it is
    * deliberately left on.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nano-of-epoch longs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS) not adjusted to UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw // already session-TZ TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
