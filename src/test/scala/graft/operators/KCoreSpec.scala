package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential reference: textbook min-degree peeling. */
  private def refCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size).min
      k = math.max(k, minDeg.toLong)
      // remove every node of degree ≤ k (cascading) at this level
      var changed = true
      while (changed) {
        val drop = adj.collect { case (v, ns) if ns.size <= k => v }.toSeq
        changed = drop.nonEmpty
        drop.foreach { v =>
          core(v) = k
          adj.remove(v).foreach(_.foreach(n => adj.get(n).foreach(_ -= v)))
        }
      }
    }
    core.toMap
  }

  test("coreness on a hand graph: triangle=2, K4=3, pendants/chain=1") {
    // triangle {1,2,3} with pendant 4; chain 5-6; K4 {7,8,9,10}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (5L, 6L),
      (7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (8L, 10L), (9L, 10L))
    val got = KCore.coreness(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L, 6L -> 1L,
      7L -> 3L, 8L -> 3L, 9L -> 3L, 10L -> 3L)
    assert(got == want)
    assert(got == refCoreness(edges))
  }

  test("kCore(k=2) drops pendants but keeps the cascading-safe cores") {
    // a chain hanging off a triangle: peeling must CASCADE (removing 5
    // leaves 4 at degree 1, which must then also fall out)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val core = KCore.kCore(edges.toDF("id_a", "id_b"), 2)
      .as[(Long, Long)].collect().toSet
    assert(core == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    core.foreach(_ => ()) // materialized above
  }

  test("kCore of an empty or sub-k graph is empty") {
    val single = Seq((1L, 2L)).toDF("id_a", "id_b")
    assert(KCore.kCore(single, 2).isEmpty)
    assert(KCore.kCore(single.limit(0), 2).isEmpty)
  }

  test("coreness on the sf0.001 near-dup graph matches the sequential reference") {
    val edges = graft.functions.Dedup.sharedShingleEdges(
        graft.Tables.documents(spark, "/root/testdata/sf0.001"),
        "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
      .select("id_a", "id_b")
    val collected = edges.as[(Long, Long)].collect().toSeq
    assert(collected.nonEmpty)
    val got = KCore.coreness(edges).as[(Long, Long)].collect().toMap
    assert(got == refCoreness(collected))
    assert(got.values.max >= 2, "degenerate graph: no 2-core found")
  }
}
