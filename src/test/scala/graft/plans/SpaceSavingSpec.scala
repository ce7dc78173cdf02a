package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions.{col, explode, split}
import org.scalatest.funsuite.AnyFunSuite

class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_top_k finds heavy hitters exactly when capacity suffices") {
    // skewed stream: "a"×100, "b"×50, "c"×20, 30 distinct singletons
    val tokens = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++ Seq.fill(20)("c") ++
      (1 to 30).map(i => s"x$i")
    val df = tokens.map(Tuple1(_)).toDF("t").repartition(8)
    val top = df
      .agg(SpaceSavingTopK.approx_top_k(col("t"), k = 3).as("top"))
      .selectExpr("inline(top)")
      .as[(String, Long, Long)].collect()
    assert(top.map(_._1).toSeq == Seq("a", "b", "c"))
    // lower bounds (count - err) never exceed the true counts
    val truth = Map("a" -> 100L, "b" -> 50L, "c" -> 20L)
    top.foreach { case (item, c, e) => assert(c - e <= truth(item) && c >= truth(item)) }
  }

  test("approx_top_k over exploded text tokens (the corpus use case)") {
    val docs = Seq(
      (1L, "the quick fox the lazy dog the end"),
      (2L, "the dog and the fox")).toDF("doc_id", "text")
    val top = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(SpaceSavingTopK.approx_top_k(col("t"), k = 2).as("top"))
      .selectExpr("inline(top)")
      .as[(String, Long, Long)].collect()
    assert(top.head._1 == "the" && top.head._2 == 5L)
  }

  test("sketch stays within capacity under many distinct values") {
    val df = (1 to 10000).map(i => s"v${i % 3000}").map(Tuple1(_)).toDF("t").repartition(8)
    val top = df
      .agg(SpaceSavingTopK.approx_top_k(col("t"), k = 5, capacityFactor = 4).as("top"))
      .selectExpr("inline(top)").as[(String, Long, Long)].collect()
    assert(top.length == 5) // bounded output regardless of 3000 distinct
  }
}
