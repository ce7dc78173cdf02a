package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ChecksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some(10.0), Some("F")),
    (Some(1L), Some(-5.0), Some("O")),   // dup id, below range
    (Some(2L), None, Some("P")),         // null value, off-set status
    (None, Some(250.0), None),           // null id, above range, null status
    (None, Some(50.0), Some("F"))        // second null id (one dup)
  ).toDF("id", "v", "status")

  test("each rule counts its violations in one pass") {
    val got = Checks.run(df, Seq(
      Checks.NotNull("id"), Checks.Unique("id"),
      Checks.InRange("v", 0, 100), Checks.InSet("status", Seq("F", "O"))))
      .as[(String, Long, Long, Boolean)].collect().toList
    assert(got == List(
      ("in_range(v)", 2L, 5L, false),   // -5 below, 250 above; null skipped
      ("in_set(status)", 1L, 5L, false), // 'P'; null skipped
      ("not_null(id)", 2L, 5L, false),
      ("unique(id)", 2L, 5L, false)))   // dup 1L + second null
  }

  test("clean data passes every rule") {
    val clean = Seq((1L, 5.0, "F"), (2L, 7.0, "O")).toDF("id", "v", "status")
    val got = Checks.run(clean, Seq(
      Checks.NotNull("id"), Checks.Unique("id"),
      Checks.InRange("v", 0, 100), Checks.InSet("status", Seq("F", "O"))))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._2 == 0L && r._4))
    assert(got.forall(_._3 == 2L))
  }

  test("empty input: zero rows, zero violations, all pass") {
    val got = Checks.run(df.filter($"id" === -99), Seq(
      Checks.NotNull("id"), Checks.Unique("id")))
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.forall(r => r._2 == 0L && r._3 == 0L && r._4))
  }
}
