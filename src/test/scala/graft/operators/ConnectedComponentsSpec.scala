package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)], maxIter: Int = 50) = {
    val vertices = vs.toDF("id")
    val edges = es.toDF("id_a", "id_b")
    val labels = ConnectedComponents.labelPropagation(vertices, edges, maxIter)
    val out = labels.as[(Long, Long)].collect().toMap
    labels.unpersist()
    out
  }

  test("isolated vertices keep their own label") {
    assert(cc(Seq(1L, 2L, 3L), Seq.empty) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("two blobs merge to their min ids, and stay separate") {
    // blob A: 1-2-3 triangle; blob B: 10-11 edge; isolated: 20
    val labels = cc(
      Seq(1L, 2L, 3L, 10L, 11L, 20L),
      Seq((2L, 3L), (1L, 2L), (1L, 3L), (11L, 10L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("chain graph converges to the chain minimum") {
    // path 5-4-3-2-1: min label must walk the full diameter
    val n = 8
    val labels = cc((1L to n).toSeq, (1L until n).map(i => (i, i + 1)))
    assert(labels == (1L to n).map(_ -> 1L).toMap)
  }

  test("edge ids referencing min-side vertices propagate both directions") {
    // directionality check: min arrives via id_b as well as id_a
    val labels = cc(Seq(1L, 2L, 3L), Seq((3L, 1L), (2L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("maxIter cutoff throws instead of returning unconverged labels") {
    // a 6-chain needs more than 2 min-propagation passes
    val ex = intercept[IllegalStateException] {
      cc((1L to 6L).toSeq, (1L until 6L).map(i => (i, i + 1)), maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("labelPropagation composes with sharedShingleEdges on documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val edges = graft.functions.Dedup.sharedShingleEdges(
      docs, "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
    val labels = ConnectedComponents.labelPropagation(
      docs.select($"doc_id".as("id")), edges)
    val byComp = labels.as[(Long, Long)].collect().groupBy(_._2)
    labels.unpersist()
    // every component label is the min id of its members
    byComp.foreach { case (comp, members) =>
      assert(comp == members.map(_._1).min)
    }
    assert(byComp.size > 0)
  }
}
