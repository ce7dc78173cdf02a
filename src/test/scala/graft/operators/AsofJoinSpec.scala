package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof picks the latest right row with ts <= left ts, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 00:05:00"), 100.0),
      (1L, ts("2024-01-01 00:20:00"), 200.0),
      (2L, ts("2024-01-01 00:07:00"), 300.0))
      .toDF("k", "ts", "qty")
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:10:00"), 20.0),
      (2L, ts("2024-01-01 00:07:00"), 30.0), // exactly at trade time → visible
      (2L, ts("2024-01-01 00:09:00"), 40.0)) // future → invisible
      .toDF("k", "ts", "price")
    val res = AsofJoin.asof(trades, quotes, "k", "ts", Seq("price"))
      .select("k", "qty", "price").as[(Long, Double, Double)].collect().toSet
    assert(res == Set((1L, 100.0, 10.0), (1L, 200.0, 20.0), (2L, 300.0, 30.0)))
  }

  test("asof takes ALL values from the single matched right row (no cross-row mixing)") {
    val l = Seq((1L, ts("2024-01-01 00:06:00"), 7.0)).toDF("k", "ts", "qty")
    val r = Seq(
      (1L, ts("2024-01-01 00:03:00"), Option(1.0), Option(1.0)),
      (1L, ts("2024-01-01 00:05:00"), Option.empty[Double], Option(2.0)))
      .toDF("k", "ts", "a", "b")
    val res = AsofJoin.asof(l, r, "k", "ts", Seq("a", "b"))
      .select("a", "b").as[(Option[Double], Option[Double])].collect().head
    // matched row is ts=00:05 → a must be null (not back-filled from 00:03)
    assert(res == (None, Some(2.0)))
  }

  test("asof rejects value-column collisions with the left side") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 5.0)).toDF("k", "ts", "p")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 9.0)).toDF("k", "ts", "p")
    assertThrows[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "ts", Seq("p"))
    }
  }

  test("salted join rejects right/full outer types") {
    val df = Seq((1L, "a")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(df, df.withColumnRenamed("v", "w"), "k", 4, "right")
    }
  }

  test("late out-of-order session event extends session start backwards") {
    // covered end-to-end in StreamingSpec; here check the batch analog
    // agrees with interval-merge semantics via session_window
    val evs = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0),
      (1L, ts("2024-01-01 00:05:00"), 2.0)) // "late" earlier event
      .toDF("user_id", "ts", "value")
    val sessions = Sessionize.batch(evs, "user_id", "ts", "value", "30 minutes")
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(sessions == Seq((1L, "2024-01-01 00:05:00", "2024-01-01 00:10:00", 2L, 3.0)))
  }

  test("left rows with no prior right row keep null (left-join semantics)") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 01:00:00"), 9.0)).toDF("k", "ts", "p")
    val res = AsofJoin.asof(l, r, "k", "ts", Seq("p"))
      .select("k", "v", "p").as[(Long, Double, Option[Double])].collect().toSeq
    assert(res == Seq((1L, 1.0, None)))
  }
}
