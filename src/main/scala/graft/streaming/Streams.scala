package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming re-expression of the reference's unbounded
  * `pipeline.FromChannel` source (/root/reference/pipeline/
  * pipeline.go:131): the channel becomes a streaming Dataset, the
  * consumer goroutines become a streaming query, and back-pressure /
  * rate limiting is the engine's micro-batch planner instead of a
  * semaphore.
  *
  * At cluster scale the same transforms run over Kafka/files by
  * swapping the source (`spark.readStream.format(...)`): state is
  * bounded by watermark × keys and partitioned by key, so windowed
  * aggregation scales horizontally.
  */
object Streams {

  /** An in-process channel: `send` enqueues elements, `toDS` is the
    * unbounded streaming Dataset fed by them. The JVM analogue of
    * handing pippin a `chan T`. (Backed by MemoryStream — Spark's
    * in-memory streaming source; driver-side, test/dev scoped, like
    * the reference's in-process channel.)
    */
  final class Channel[T: Encoder](spark: SparkSession) {
    private val stream = MemoryStream[T](spark)
    def send(ts: T*): Unit = stream.addData(ts)
    def toDS: Dataset[T] = stream.toDS()
  }

  object Channel {
    def apply[T: Encoder](spark: SparkSession): Channel[T] = new Channel[T](spark)
  }

  /** Watermarked tumbling-window aggregation — the streaming form of
    * RelationalQueries.q_stream_window (same `window()` operator, so
    * stream and batch results agree; StreamingSpec asserts it).
    */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col(keyCol), col("n"), col("total_value"))

  /** Runs a streaming DataFrame into an in-memory table and blocks
    * until all currently-available input is processed — the
    * synchronous-aggregation face of a streaming pipeline.
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String = "complete"): StreamingQuery = {
    // default micro-batch trigger (not AvailableNow, which would stop
    // the query and ignore elements sent afterwards)
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }
}
