package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted cluster index: labels read through any
  * append/compaction history must equal a from-scratch CC labeling of
  * the graph index's current edge set — including component MERGES
  * (new edges) and the hard SPLITS (a df-band crossing deletes edges,
  * disconnecting a previously-joined component), which forward label
  * propagation alone could never undo.
  */
class ClusterIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def rebuildLabels(graphRoot: String): Map[Long, Long] = {
    val gv = graft.operators.Versioned.resolve(spark, graphRoot).get
    val comps = graft.operators.ConnectedComponents.labelPropagation(
      GraphIndex.readPostings(spark, gv).select("id").distinct(),
      GraphIndex.readEdges(spark, gv).select("id_a", "id_b"))
    try labelMap(comps.select("id", "comp")) finally { comps.unpersist(); () }
  }

  private def currentLabels(clusterRoot: String): Map[Long, Long] = {
    val cv = graft.operators.Versioned.resolve(spark, clusterRoot).get
    labelMap(ClusterIndex.readLabels(spark, cv))
  }

  test("incremental updates over the gate corpus ≡ full rebuild") {
    val docs = Tables.documents(spark, sf)
    val gRoot = tmp("graft_cidx_g")
    val cRoot = tmp("graft_cidx_c")
    GraphIndex.writeIndex(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", gRoot)
    ClusterIndex.writeIndex(spark, gRoot, cRoot)
    Seq(1, 2).foreach { m =>
      val delta = GraphIndex.appendIndex(
        docs.filter(col("doc_id") % 3 === m), "doc_id", "text", gRoot)
      assert(delta.isDefined)
      ClusterIndex.updateFromDelta(spark, gRoot, cRoot, delta.get)
    }
    val got = currentLabels(cRoot)
    val want = rebuildLabels(gRoot)
    assert(got === want)
    assert(got.size === docs.count(),
      "every document must carry a label (isolated docs label themselves)")
    assert(got.exists { case (id, l) => id != l },
      "gate corpus must produce non-trivial clusters")
    // compaction folds deltas without changing the labeling
    ClusterIndex.compactIndex(spark, cRoot)
    assert(currentLabels(cRoot) === want)
    val cv = graft.operators.Versioned.resolve(spark, cRoot).get
    assert(graft.operators.Versioned.listDeltas(spark, cv).isEmpty)
  }

  test("band crossings: appends MERGE components and then SPLIT them") {
    import spark.implicits._
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val span = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    def filler(tag: String) = (1 to 8).map(i => s"$tag$i")
    val gRoot = tmp("graft_cidx_gb")
    val cRoot = tmp("graft_cidx_cb")
    // min_df=3: docs 1,2 share the span but sit below the band —
    // two singleton clusters
    GraphIndex.writeIndex(
      Seq(doc(1, span ++ filler("a")), doc(2, span ++ filler("b")))
        .toDF("doc_id", "text"),
      "doc_id", "text", gRoot, shingleK = 3, minShared = 3, minDf = 3, maxDf = 4)
    ClusterIndex.writeIndex(spark, gRoot, cRoot)
    assert(currentLabels(cRoot) === Map(1L -> 1L, 2L -> 2L))

    // doc 3 lifts the span df to min_df=3: all three docs — including
    // the OLD pair (1,2) — must merge into one cluster
    val d2 = GraphIndex.appendIndex(
      Seq(doc(3, span ++ filler("c"))).toDF("doc_id", "text"),
      "doc_id", "text", gRoot).get
    ClusterIndex.updateFromDelta(spark, gRoot, cRoot, d2)
    assert(currentLabels(cRoot) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    // docs 4,5 push the span past max_df=4: every span edge dies and
    // the merged component must SPLIT back into singletons
    Seq(4L, 5L).zip(Seq("d", "e")).foreach { case (id, tag) =>
      val dd = GraphIndex.appendIndex(
        Seq(doc(id, span ++ filler(tag))).toDF("doc_id", "text"),
        "doc_id", "text", gRoot).get
      ClusterIndex.updateFromDelta(spark, gRoot, cRoot, dd)
    }
    assert(currentLabels(cRoot) ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    assert(currentLabels(cRoot) === rebuildLabels(gRoot))
  }

  test("clusterIngest: channel-driven micro-batches + redelivery ≡ rebuild") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = tmp("graft_cidx_s")
    GraphIndex.writeIndex(docs.filter(col("doc_id") < 200), "doc_id", "text",
      s"$dir/gidx")
    ClusterIndex.writeIndex(spark, s"$dir/gidx", s"$dir/cidx")
    val rows = docs.filter(col("doc_id") >= 200)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.clusterIngest(
      ch.toDS.toDF("doc_id", "text"), s"$dir/gidx", s"$dir/cidx",
      s"$dir/out", s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      assert(currentLabels(s"$dir/cidx") === rebuildLabels(s"$dir/gidx"),
        "streamed cluster labels diverge from the rebuild")
      val cv = graft.operators.Versioned.resolve(spark, s"$dir/cidx").get
      val nDeltas = graft.operators.Versioned.listDeltas(spark, cv).size
      // redelivery: every id already indexed → no graph delta, no
      // cluster delta, labels stable
      ch.send(b1: _*)
      q.processAllAvailable()
      assert(graft.operators.Versioned.listDeltas(spark, cv).size === nDeltas,
        "redelivered batch must commit nothing")
      assert(currentLabels(s"$dir/cidx") === rebuildLabels(s"$dir/gidx"))
      // the out sink's latest emission per id agrees with the index
      val lastEmit = spark.read.parquet(s"$dir/out")
        .groupBy("id")
        .agg(max(struct(col("batch_id").cast("long").as("b"), col("label"))).as("m"))
        .select(col("id"), col("m.label").as("label"))
      val emitted = labelMap(lastEmit)
      val truth = currentLabels(s"$dir/cidx")
      emitted.foreach { case (id, l) =>
        assert(truth.get(id).contains(l), s"sink label for $id diverges")
      }
    } finally q.stop()
  }
}
