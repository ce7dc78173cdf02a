package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int) = {
    val rows = (1 to n).map { i =>
      (i.toLong % 17, ((i * 131) % 97).toDouble, i.toLong)
    }
    spark.createDataFrame(rows).toDF("key", "score", "id").repartition(8)
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy($"score".desc, $"id")))
      .filter($"rn" <= k).drop("rn")
      .as[(Long, Double, Long)].collect().toSet

  test("matches the window formulation across k values") {
    val df = corpus(500)
    Seq(1, 3, 10).foreach { k =>
      val got = TopKPerKey.topK(df, Seq("key"), Seq("score" -> true, "id" -> false), k)
        .as[(Long, Double, Long)].collect()
      assert(got.toSet == windowTopK(df, k), s"k=$k")
      assert(got.length == got.toSet.size, s"k=$k emitted duplicates")
    }
  }

  test("emits each key's rows in order, best first") {
    val got = TopKPerKey.topK(corpus(300), Seq("key"), Seq("score" -> true, "id" -> false), 5)
      .as[(Long, Double, Long)].collect()
    got.groupBy(_._1).foreach { case (key, rows) =>
      val scores = rows.map(r => (-r._2, r._3)).toSeq
      assert(scores == scores.sorted, s"key $key out of order: ${rows.toSeq}")
    }
  }

  test("null scores sort last, matching the window formulation") {
    val df = Seq[(Long, Option[Double], Long)](
      (1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(7.0), 3L), (1L, None, 4L),
      (2L, None, 5L), (2L, None, 6L))
      .toDF("key", "score", "id").repartition(4)
    val expected = df.withColumn("rn", row_number().over(
        Window.partitionBy("key").orderBy($"score".desc, $"id")))
      .filter($"rn" <= 3).drop("rn")
      .as[(Long, Option[Double], Long)].collect().toSet
    val got = TopKPerKey.topK(df, Seq("key"), Seq("score" -> true, "id" -> false), 3)
      .as[(Long, Option[Double], Long)].collect().toSet
    assert(got == expected)
    // nulls fill key 1's third slot and all of key 2 (all-null group)
    assert(got.contains((1L, None, 2L)) && got.contains((2L, None, 5L)))
  }

  test("partial-pass emit-and-clear under a tiny key budget stays exact") {
    // 61 distinct keys per partition against a 4-key budget forces
    // ~15 flush cycles per partition; the final pass must still merge
    // the flush fragments to the exact window-formulation answer
    val df = (1 to 2000).map { i =>
      (i.toLong % 61, ((i * 131) % 97).toDouble, i.toLong)
    }.toDF("key", "score", "id").repartition(8)
    spark.conf.set("spark.graft.topk.partialMaxKeys", "4")
    try {
      Seq(1, 5).foreach { k =>
        val got = TopKPerKey.topK(df, Seq("key"), Seq("score" -> true, "id" -> false), k)
          .as[(Long, Double, Long)].collect()
        assert(got.toSet == windowTopK(df, k), s"k=$k under flush pressure")
        assert(got.length == got.toSet.size, s"k=$k emitted duplicates")
      }
    } finally spark.conf.unset("spark.graft.topk.partialMaxKeys")
  }

  test("k larger than group size returns whole groups") {
    val df = Seq((1L, 1.0, 1L), (1L, 2.0, 2L), (2L, 9.0, 3L)).toDF("key", "score", "id")
    val got = TopKPerKey.topK(df, Seq("key"), Seq("score" -> true, "id" -> false), 10)
      .as[(Long, Double, Long)].collect()
    assert(got.length == 3)
  }

  test("empty input yields empty output") {
    val df = corpus(10).filter($"key" < 0)
    assert(TopKPerKey.topK(df, Seq("key"), Seq("score" -> true), 3).count() == 0)
  }

  test("plans as TopKExec partial+final with no window or array agg") {
    val plan = TopKPerKey.topK(corpus(100), Seq("key"), Seq("score" -> true, "id" -> false), 3)
      .queryExecution.executedPlan.toString
    assert(plan.split("TopK \\[").length == 3, s"expected partial+final TopK in:\n$plan")
    assert(!plan.contains("Window"))
    assert(!plan.contains("collect_list"))
  }

  test("unknown column names fail fast") {
    val ex = intercept[IllegalArgumentException] {
      TopKPerKey.topK(corpus(10), Seq("nope"), Seq("score" -> true), 3)
    }
    assert(ex.getMessage.contains("nope"))
  }
}
