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
                  windowLen: String, watermark: String,
                  valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(valueCol), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col(keyCol), col("n"), col("total_value"))

  /** A typed event for stateful sessionization. */
  final case class SEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** An emitted session. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           total_value: Double)

  /** Internal open-session accumulator (public: Spark's state encoder
    * codegen must be able to construct it).
    */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Streaming sessionization with CUSTOM state —
    * `flatMapGroupsWithState` + event-time timeout: each user carries
    * one open-session state; when the watermark passes last-event +
    * gap, the session is emitted and the state cleared. State size is
    * O(active users), partitioned by user key — the horizontally
    * scalable shape for 100 TB streams. (Batch/SQL-expressible
    * sessionization should use `session_window` —
    * [[graft.operators.Sessionize]]; this path exists for semantics a
    * built-in window can't express: per-session custom accumulators,
    * early emission, side outputs.)
    */
  def sessionizeStream(events: Dataset[SEvent], gapSeconds: Long,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, evts: Iterator[SEvent],
           state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n, s.total))
      } else {
        val sorted = evts.toSeq.sortBy(_.ts.getTime)
        var cur = state.getOption
        val out = Seq.newBuilder[Session]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            // merge when within gap of the open session's [start, last]
            // interval — a late cross-batch event can extend the
            // session BACKWARDS, so start takes the min
            case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
              cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t),
                s.n + 1, s.total + e.value))
            case Some(s) if t < s.start - gapMs =>
              // late event forming its own earlier session: emit it
              // directly (the watermark bounds how late it can be)
              out += Session(userId, e.ts, e.ts, 1L, e.value)
            case Some(s) =>
              out += Session(userId, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.n, s.total)
              cur = Some(SessionState(t, t, 1L, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1L, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Durable sink: append the stream to a parquet directory with a
    * checkpoint (exactly-once file sink). The production counterpart
    * of [[runToMemory]] — same query, swap the sink.
    */
  def runToParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q
  }

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
