package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fleet-maintenance driver: the report's delta depth
  * matches `Versioned.listDeltas` exactly, family detection dispatches
  * the right compaction, thresholds gate the fold, and serving
  * results are bit-identical across a maintain() pass — re-proven
  * through THIS entry point for a representative family sample (each
  * family's own spec already pins its compaction in isolation).
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("report matches listDeltas; thresholds gate; folds are bit-exact per family") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)

    // hash family: base + 2 delta appends
    val hashRoot = tmp("graft_maint_h")
    val h1 = docs.filter(col("doc_id") < 200).select(md5(col("text")).as("h"))
    val h2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      .select(md5(col("text")).as("h"))
    val h3 = docs.filter(col("doc_id") >= 350).select(md5(col("text")).as("h"))
    graft.operators.Versioned.commitNew(spark, hashRoot) { d =>
      h1.distinct().write.parquet(s"$d/grams")
    }
    val hv = graft.operators.Versioned.resolve(spark, hashRoot).get
    Dedup.appendHashIndex(spark, hashRoot, hv, h2)
    Dedup.appendHashIndex(spark, hashRoot, hv, h3)

    // graph family: base + 1 delta
    val graphRoot = tmp("graft_maint_g")
    GraphIndex.writeIndex(docs.filter(col("doc_id") < 300), "doc_id", "text",
      graphRoot)
    GraphIndex.appendIndex(docs.filter(col("doc_id") >= 300), "doc_id", "text",
      graphRoot)

    // ivf family: base + 1 delta
    val ivfRoot = tmp("graft_maint_i")
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 8)
    Ivf.writeIndex(emb.filter(col("vec_id") % 2 === 0), ivfRoot, cents)
    Ivf.appendToIndex(emb.filter(col("vec_id") % 2 === 1), ivfRoot)

    val roots = Seq(hashRoot, graphRoot, ivfRoot)
    val rep = IndexMaintenance.report(spark, roots)
    assert(rep.map(_.family) === Seq("hash", "graph", "ivf"))
    // delta depth must equal listDeltas per root
    rep.foreach { st =>
      val want = graft.operators.Versioned.listDeltas(spark, st.versionDir).size
      assert(st.deltas === want, s"${st.root}: ${st.deltas} != $want")
      assert(st.deltas > 0 && st.deltaBytes > 0 && st.baseBytes > 0)
    }

    // served state BEFORE maintenance
    def hashSet() = {
      val v = graft.operators.Versioned.resolve(spark, hashRoot).get
      Dedup.readHashIndex(spark, v).as[String].collect().toSet
    }
    def edgeSet() = {
      val v = graft.operators.Versioned.resolve(spark, graphRoot).get
      GraphIndex.readEdges(spark, v).select("id_a", "id_b", "shared")
        .as[(Long, Long, Long)].collect().toSet
    }
    def ivfTop() = Ivf.ivfTopKIndexed(spark, ivfRoot,
        emb.filter(col("vec_id") < 5), k = 10, nprobe = 8)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val (hs0, es0, it0) = (hashSet(), edgeSet(), ivfTop())

    // high thresholds: nothing folds
    val idle = IndexMaintenance.maintain(spark, roots, maxDeltas = 100)
    assert(idle.forall(_.compactedTo.isEmpty))

    // maxDeltas=0: every root is past threshold and folds deltaless
    val acted = IndexMaintenance.maintain(spark, roots, maxDeltas = 0)
    assert(acted.forall(_.compactedTo.isDefined))
    acted.foreach { r =>
      val nv = r.compactedTo.get
      assert(graft.operators.Versioned.listDeltas(spark, nv).isEmpty,
        s"${r.status.root} still carries deltas after the fold")
    }
    // bit-exact serving across the fold, per family
    assert(hashSet() === hs0)
    assert(edgeSet() === es0)
    assert(ivfTop() === it0)

    // an unrecognized layout is reported unknown and never compacted
    val alien = tmp("graft_maint_x")
    graft.operators.Versioned.commitNew(spark, alien) { d =>
      Seq((1L, 2L)).toDF("a", "b").write.parquet(s"$d/mystery")
    }
    val ar = IndexMaintenance.maintain(spark, Seq(alien), maxDeltas = 0)
    assert(ar.head.status.family === "unknown")
    assert(ar.head.compactedTo.isEmpty)
  }

  test("detection separates the label families (cluster vs coreness)") {
    val docs = Tables.documents(spark, sf)
    val gRoot = tmp("graft_maint_g2")
    GraphIndex.writeIndex(docs, "doc_id", "text", gRoot)
    val cRoot = tmp("graft_maint_c2")
    ClusterIndex.writeIndex(spark, gRoot, cRoot)
    val kRoot = tmp("graft_maint_k2")
    CorenessIndex.writeIndex(spark, gRoot, kRoot)
    val rep = IndexMaintenance.report(spark, Seq(cRoot, kRoot))
    assert(rep.map(_.family) === Seq("cluster", "coreness"))
  }
}
