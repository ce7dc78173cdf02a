package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted coreness index: (label, coreness) read through
  * any append/compaction history must equal a from-scratch
  * decomposition of the graph index's current edge set — including
  * the band-crossing edge DELETIONS that lower old vertices' coreness
  * (the case a forward-only maintenance scheme could never undo).
  */
class CorenessIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corMap(df: DataFrame): Map[Long, Long] =
    df.select("id", "coreness").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def rebuild(graphRoot: String): Map[Long, Long] = {
    val gv = graft.operators.Versioned.resolve(spark, graphRoot).get
    val edges = GraphIndex.readEdges(spark, gv).select("id_a", "id_b")
    val cor = graft.operators.KCore.coreness(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vertices = GraphIndex.readPostings(spark, gv).select("id").distinct()
      .collect().map(_.getLong(0))
    vertices.map(v => v -> cor.getOrElse(v, 0L)).toMap
  }

  private def current(root: String): Map[Long, Long] = {
    val cv = graft.operators.Versioned.resolve(spark, root).get
    corMap(CorenessIndex.readCoreness(spark, cv))
  }

  test("incremental updates over the gate corpus ≡ full rebuild") {
    val docs = Tables.documents(spark, sf)
    val gRoot = tmp("graft_kidx_g")
    val kRoot = tmp("graft_kidx_k")
    GraphIndex.writeIndex(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", gRoot)
    CorenessIndex.writeIndex(spark, gRoot, kRoot)
    Seq(1, 2).foreach { m =>
      val delta = GraphIndex.appendIndex(
        docs.filter(col("doc_id") % 3 === m), "doc_id", "text", gRoot)
      assert(delta.isDefined)
      CorenessIndex.updateFromDelta(spark, gRoot, kRoot, delta.get)
    }
    val got = current(kRoot)
    val want = rebuild(gRoot)
    assert(got === want)
    assert(got.size === docs.count(),
      "every document must carry a row (isolated docs at coreness 0)")
    assert(got.values.max >= 2, "gate corpus must produce a non-trivial core")
    // compaction folds deltas without changing the decomposition
    CorenessIndex.compactIndex(spark, kRoot)
    assert(current(kRoot) === want)
    val cv = graft.operators.Versioned.resolve(spark, kRoot).get
    assert(graft.operators.Versioned.listDeltas(spark, cv).isEmpty)
  }

  test("band crossings: appends RAISE old coreness and then LOWER it") {
    import spark.implicits._
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    val span = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    def filler(tag: String) = (1 to 8).map(i => s"$tag$i")
    val gRoot = tmp("graft_kidx_gb")
    val kRoot = tmp("graft_kidx_kb")
    // min_df=3: docs 1,2 share the span but sit below the band — no
    // edges, both at coreness 0
    GraphIndex.writeIndex(
      Seq(doc(1, span ++ filler("a")), doc(2, span ++ filler("b")))
        .toDF("doc_id", "text"),
      "doc_id", "text", gRoot, shingleK = 3, minShared = 3, minDf = 3, maxDf = 4)
    CorenessIndex.writeIndex(spark, gRoot, kRoot)
    assert(current(kRoot) === Map(1L -> 0L, 2L -> 0L))

    // doc 3 lifts the span df to min_df=3: a triangle forms — every
    // doc, including the OLD pair (1,2), must rise to coreness 2
    val d2 = GraphIndex.appendIndex(
      Seq(doc(3, span ++ filler("c"))).toDF("doc_id", "text"),
      "doc_id", "text", gRoot).get
    CorenessIndex.updateFromDelta(spark, gRoot, kRoot, d2)
    assert(current(kRoot) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))

    // docs 4,5 push the span past max_df=4: every span edge dies and
    // the 2-core must COLLAPSE back to isolated coreness-0 vertices
    Seq(4L, 5L).zip(Seq("d", "e")).foreach { case (id, tag) =>
      val dd = GraphIndex.appendIndex(
        Seq(doc(id, span ++ filler(tag))).toDF("doc_id", "text"),
        "doc_id", "text", gRoot).get
      CorenessIndex.updateFromDelta(spark, gRoot, kRoot, dd)
    }
    assert(current(kRoot) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    assert(current(kRoot) === rebuild(gRoot))
  }

  test("q_coreness_indexed serves a read: no fixpoint work in the plan") {
    val df = graft.SparkEntry.queries("q_coreness_indexed")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("xxhash64") && !plan.contains("explode"),
      s"indexed coreness serving re-derives graph work:\n${plan.take(1500)}")
    assert(df.count() > 0)
  }

  test("corenessIngest: channel-driven micro-batches + redelivery ≡ rebuild") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = tmp("graft_kidx_s")
    GraphIndex.writeIndex(docs.filter(col("doc_id") < 200), "doc_id", "text",
      s"$dir/gidx")
    CorenessIndex.writeIndex(spark, s"$dir/gidx", s"$dir/kidx")
    val rows = docs.filter(col("doc_id") >= 200)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.corenessIngest(
      ch.toDS.toDF("doc_id", "text"), s"$dir/gidx", s"$dir/kidx",
      s"$dir/out", s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      assert(current(s"$dir/kidx") === rebuild(s"$dir/gidx"),
        "streamed coreness diverges from the rebuild")
      val cv = graft.operators.Versioned.resolve(spark, s"$dir/kidx").get
      val nDeltas = graft.operators.Versioned.listDeltas(spark, cv).size
      // redelivery: every id already indexed → no graph delta, no
      // coreness delta, decomposition stable
      ch.send(b1: _*)
      q.processAllAvailable()
      assert(graft.operators.Versioned.listDeltas(spark, cv).size === nDeltas,
        "redelivered batch must commit nothing")
      assert(current(s"$dir/kidx") === rebuild(s"$dir/gidx"))
      // the out sink's latest emission per id agrees with the index
      val lastEmit = spark.read.parquet(s"$dir/out")
        .groupBy("id")
        .agg(max(struct(col("batch_id").cast("long").as("b"),
          col("coreness"))).as("m"))
        .select(col("id"), col("m.coreness").as("coreness"))
      val emitted = corMap(lastEmit)
      val truth = current(s"$dir/kidx")
      // coverage guard: a silently-empty sink would make the per-id
      // agreement loop below vacuous
      assert(emitted.nonEmpty, "out sink emitted no rows")
      emitted.foreach { case (id, k) =>
        assert(truth.get(id).contains(k), s"sink coreness for $id diverges")
      }
    } finally q.stop()
  }
}
