package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Pins BoundedCollectLong's contract: element-equal to collect_list
  * (as multisets) for every group strictly under the cap, hard-capped
  * buffer for groups over it, exact count unaffected.
  */
class BoundedCollectSpec extends AnyFunSpec {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  it("equals collect_list as a multiset under the cap; caps above it") {
    val limit = 5
    // group sizes 1, 4 (= limit-1), 5 (= limit), 9 (> limit)
    val rows = (Seq(("a", 1L)) ++
      (1 to 4).map(i => ("b", i.toLong)) ++
      (1 to 5).map(i => ("c", i.toLong)) ++
      (1 to 9).map(i => ("d", i.toLong))).toDF("k", "v")
      .repartition(7) // force multi-partition partials + merges
    val got = rows.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sort_array(BoundedCollect.boundedCollectLong(col("v"), limit)).as("ms"))
    val want = rows.groupBy("k")
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("v"))).as("ms"))
    val g = got.collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    val w = want.collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    // exact counts always
    assert(g.view.mapValues(_._1).toMap === w.view.mapValues(_._1).toMap)
    // under the cap: identical multisets
    for (k <- Seq("a", "b")) assert(g(k)._2 === w(k)._2, s"group $k")
    // at/over the cap: exactly `limit` elements, all from the group
    for (k <- Seq("c", "d")) {
      assert(g(k)._2.size === limit, s"group $k size")
      assert(g(k)._2.toSet.subsetOf(w(k)._2.toSet), s"group $k membership")
    }
  }

  it("null inputs are skipped like collect_list") {
    val rows = Seq(("a", Some(1L)), ("a", None), ("a", Some(2L)))
      .toDF("k", "v")
    val got = rows.groupBy("k")
      .agg(sort_array(BoundedCollect.boundedCollectLong(col("v"), 10)).as("ms"))
      .head.getSeq[Long](1)
    assert(got === Seq(1L, 2L))
  }
}
