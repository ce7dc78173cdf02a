package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalNtileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(n: Int, rows: Seq[(Double, Long)]): Unit = {
    val df = rows.toDF("v", "id")
    val expected = df
      .withColumn("b", ntile(n).over(Window.orderBy($"v", $"id")))
      .select($"id", $"b").as[(Long, Int)].collect().toMap
    val got = GlobalNtile.ntile(df, n, Seq($"v", $"id"), "b")
      .select($"id", $"b").as[(Long, Int)].collect().toMap
    assert(got == expected, s"ntile($n) mismatch")
  }

  test("matches Spark's ntile window across bucket counts") {
    val rows = (1L to 97L).map(i => ((i * 37 % 101).toDouble, i))
    Seq(1, 3, 4, 7, 32).foreach(check(_, rows))
  }

  test("n larger than row count: every row its own bucket") {
    check(10, Seq((5.0, 1L), (1.0, 2L), (3.0, 3L)))
  }

  test("ties across partition boundaries break by the unique id key") {
    val rows = (1L to 64L).map(i => (1.0, i)) // all values tie
    check(4, rows)
  }

  test("sort-order columns are rejected") {
    val df = Seq((1.0, 1L)).toDF("v", "id")
    val ex = intercept[IllegalArgumentException] {
      GlobalNtile.ntile(df, 2, Seq($"v".desc, $"id"), "b")
    }
    assert(ex.getMessage.contains("plain"))
  }
}
