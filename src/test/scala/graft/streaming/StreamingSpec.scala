package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class Evt(ts: Timestamp, event_type: String, value: Double)

/** Channel source (reference pipeline.FromChannel) + watermarked
  * windowed aggregation, and stream/batch agreement for the same
  * window() operator used in q_stream_window.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def evts = Seq(
    Evt(Timestamp.valueOf("2024-01-01 00:05:00"), "click", 1.0),
    Evt(Timestamp.valueOf("2024-01-01 00:15:00"), "click", 2.0),
    Evt(Timestamp.valueOf("2024-01-01 01:05:00"), "click", 4.0),
    Evt(Timestamp.valueOf("2024-01-01 00:20:00"), "view", 8.0))

  test("channel feeds an unbounded stream; windowed agg matches batch") {
    val ch = Streams.Channel[Evt](spark)
    ch.send(evts: _*)
    val agg = Streams.windowedAgg(ch.toDS.toDF(), "ts", "event_type", "1 hour", "10 minutes")
    val q = Streams.runToMemory(agg, "stream_out")
    try {
      val streamed = spark.table("stream_out")
        .as[(String, String, Long, Double)].collect().toSet
      val batch = Streams
        .windowedAgg(evts.toDF(), "ts", "event_type", "1 hour", "10 minutes")
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set(
        ("2024-01-01 00:00", "click", 2L, 3.0),
        ("2024-01-01 01:00", "click", 1L, 4.0),
        ("2024-01-01 00:00", "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("incremental sends are visible after reprocessing") {
    val ch = Streams.Channel[Evt](spark)
    ch.send(evts.head)
    val agg = Streams.windowedAgg(ch.toDS.toDF(), "ts", "event_type", "1 hour", "10 minutes")
    val q = Streams.runToMemory(agg, "stream_inc")
    try {
      assert(spark.table("stream_inc").count() == 1)
      ch.send(evts(2)) // second window
      q.processAllAvailable()
      assert(spark.table("stream_inc").count() == 2)
    } finally q.stop()
  }
}
