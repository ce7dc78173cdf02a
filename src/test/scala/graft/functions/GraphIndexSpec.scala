package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted near-dup graph index: the edge set read through
  * any append/compaction history must equal a from-scratch rebuild on
  * the same documents — INCLUDING the hard df-band transitions where a
  * batch creates edges between two OLD documents (shingle df reaches
  * min_df) or deletes support under OLD edges (df crosses max_df).
  */
class GraphIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def edgeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def rebuildEdges(docs: DataFrame, minShared: Int = 5,
                           minDf: Int = 2, maxDf: Int = 20): Set[(Long, Long, Long)] =
    edgeSet(Dedup.sharedShingleEdges(docs, "doc_id", "text",
      shingleK = 3, minShared = minShared, minDf = minDf, maxDf = maxDf)
      .select("id_a", "id_b", "shared"))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_gidx").toString

  test("multi-batch append over the gate corpus ≡ full rebuild") {
    val docs = Tables.documents(spark, sf)
    val b1 = docs.filter(col("doc_id") % 3 === 0)
    val b2 = docs.filter(col("doc_id") % 3 === 1)
    val b3 = docs.filter(col("doc_id") % 3 === 2)
    val root = tmp()
    GraphIndex.writeIndex(b1, "doc_id", "text", root)
    GraphIndex.appendIndex(b2, "doc_id", "text", root)
    GraphIndex.appendIndex(b3, "doc_id", "text", root)
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    val got = edgeSet(GraphIndex.readEdges(spark, vdir))
    assert(got === rebuildEdges(docs))
    assert(got.nonEmpty, "gate corpus must produce a non-trivial graph")
    // postings/dfs reconstruct the rebuild's statistics exactly
    val nPost = GraphIndex.readPostings(spark, vdir).count()
    assert(nPost ===
      Dedup.shingleHashes(docs, "doc_id", "text", 3).dropDuplicates("id", "h").count())
  }

  test("df-band crossings: appends create AND delete edges between old docs") {
    import spark.implicits._
    def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))
    // span shared by docs 1,2 — plus per-doc filler so each doc also
    // has unique shingles
    val span = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    def filler(tag: String) = (1 to 8).map(i => s"$tag$i")
    val base = Seq(doc(1, span ++ filler("a")), doc(2, span ++ filler("b"))).toDF("doc_id", "text")
    val root = tmp()
    // min_df = 3: with only docs 1,2 the span shingles sit BELOW the
    // band — no edges yet
    GraphIndex.writeIndex(base, "doc_id", "text", root,
      shingleK = 3, minShared = 3, minDf = 3, maxDf = 4)
    val v1 = graft.operators.Versioned.resolve(spark, root).get
    assert(edgeSet(GraphIndex.readEdges(spark, v1)).isEmpty)

    // batch 2 (doc 3 holds the span): df reaches min_df=3 — edges must
    // appear between ALL THREE docs, including the OLD pair (1,2)
    val b2 = Seq(doc(3, span ++ filler("c"))).toDF("doc_id", "text")
    GraphIndex.appendIndex(b2, "doc_id", "text", root)
    val after2 = edgeSet(GraphIndex.readEdges(spark, v1))
    val all3 = Seq(doc(1, span ++ filler("a")), doc(2, span ++ filler("b")),
      doc(3, span ++ filler("c"))).toDF("doc_id", "text")
    assert(after2 === rebuildEdges(all3, minShared = 3, minDf = 3, maxDf = 4))
    assert(after2.map(e => (e._1, e._2)) === Set((1L, 2L), (1L, 3L), (2L, 3L)))

    // batches 3,4 (docs 4,5 hold the span): df crosses max_df=4 — the
    // span leaves the band and every edge it supported must DIE
    val b3 = Seq(doc(4, span ++ filler("d"))).toDF("doc_id", "text")
    val b4 = Seq(doc(5, span ++ filler("e"))).toDF("doc_id", "text")
    GraphIndex.appendIndex(b3, "doc_id", "text", root)
    GraphIndex.appendIndex(b4, "doc_id", "text", root)
    val after4 = edgeSet(GraphIndex.readEdges(spark, v1))
    val all5 = Seq(doc(1, span ++ filler("a")), doc(2, span ++ filler("b")),
      doc(3, span ++ filler("c")), doc(4, span ++ filler("d")),
      doc(5, span ++ filler("e"))).toDF("doc_id", "text")
    assert(after4 === rebuildEdges(all5, minShared = 3, minDf = 3, maxDf = 4))
    assert(after4.isEmpty, "span df=5 > max_df=4: its edges must be deleted")
  }

  test("graphIngest: channel-driven micro-batches + redelivery ≡ batch rebuild") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_gidx_s").toString
    GraphIndex.writeIndex(docs.filter(col("doc_id") < 200), "doc_id", "text",
      s"$dir/index")
    val rows = docs.filter(col("doc_id") >= 200)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.graphIngest(
      ch.toDS.toDF("doc_id", "text"), s"$dir/index", s"$dir/out", s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      val vdir = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      val nDeltas = graft.operators.Versioned.listDeltas(spark, vdir).size
      assert(edgeSet(GraphIndex.readEdges(spark, vdir)) === rebuildEdges(docs),
        "streamed index diverges from the batch rebuild")
      // source redelivery: every id indexed → no delta, edges stable
      ch.send(b1: _*)
      q.processAllAvailable()
      assert(graft.operators.Versioned.listDeltas(spark, vdir).size === nDeltas,
        "redelivered batch must commit nothing")
      assert(edgeSet(GraphIndex.readEdges(spark, vdir)) === rebuildEdges(docs))
      // the out sink holds each batch's re-judged pairs; an earlier
      // emission may be superseded by a later batch re-judging the
      // pair, but each pair's LATEST emission that survives to the
      // final fold must carry the final shared count
      val lastEmit = spark.read.parquet(s"$dir/out")
        // batch_id comes back via partition-dir inference as an int
        .select(col("id_a"), col("id_b"), col("shared"),
          col("batch_id").cast("long").as("batch_id"))
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getLong(2))))
        .groupBy(_._1)
        .map { case (pair, xs) => pair -> xs.map(_._2).maxBy(_._1)._2 }
      val finalEdges = rebuildEdges(docs).map(e => (e._1, e._2) -> e._3).toMap
      val wrong = lastEmit.keySet.intersect(finalEdges.keySet)
        .filter(k => finalEdges(k) != lastEmit(k))
      assert(wrong.isEmpty, s"latest emissions diverge from the final fold: $wrong")
      assert(lastEmit.nonEmpty, "the ingest must emit re-judged edges")
    } finally q.stop()
  }

  test("replayed batch commits nothing; compaction preserves the fold") {
    val docs = Tables.documents(spark, sf)
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val root = tmp()
    GraphIndex.writeIndex(b1, "doc_id", "text", root)
    GraphIndex.appendIndex(b2, "doc_id", "text", root)
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    val nDeltas = graft.operators.Versioned.listDeltas(spark, vdir).size
    val before = edgeSet(GraphIndex.readEdges(spark, vdir))
    // full redelivery: every id already indexed → no new delta
    GraphIndex.appendIndex(b2, "doc_id", "text", root)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size === nDeltas,
      "replay must not commit a delta")
    assert(edgeSet(GraphIndex.readEdges(spark, vdir)) === before)
    // compaction: new deltaless version, identical edges and dfs
    val nv = GraphIndex.compactIndex(spark, root)
    assert(graft.operators.Versioned.listDeltas(spark, nv).isEmpty)
    assert(edgeSet(GraphIndex.readEdges(spark, nv)) === before)
    assert(before === rebuildEdges(docs))
    val dfsFolded = GraphIndex.readDfs(spark, nv).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfsRebuild = Dedup.shingleHashes(docs, "doc_id", "text", 3)
      .dropDuplicates("id", "h").groupBy("h").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dfsFolded === dfsRebuild)
  }

  test("crash-heal window survives compaction: tagged delta artifacts " +
    "stay locatable by tag") {
    // the graphIngest/clusterIngest crash window: a batch's delta
    // commits with its _TAG_, the stream dies before the sink write,
    // and a COMPACTION folds the delta before the replay runs. The
    // heal (appendIndex → None, deltaByTag → emit) must still find the
    // batch's own edges/affected/postings, or the output partition is
    // silently lost.
    val docs = Tables.documents(spark, sf)
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val root = tmp()
    GraphIndex.writeIndex(b1, "doc_id", "text", root)
    val v1 = graft.operators.Versioned.resolve(spark, root).get
    val delta = GraphIndex.appendIndex(b2, "doc_id", "text", root, Some("t-42")).get
    def edgesOf(d: String) = spark.read
      .schema("id_a long, id_b long, shared long").parquet(s"$d/edges")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def idsOf(d: String, part: String) = spark.read
      .schema("id long").parquet(s"$d/$part")
      .collect().map(_.getLong(0)).toSet
    val wantEdges = edgesOf(delta)
    val wantAffected = idsOf(delta, "affected")
    assert(GraphIndex.deltaByTag(spark, v1, "t-42")
      .exists(_.stripPrefix("file:") == delta.stripPrefix("file:")))

    val nv = GraphIndex.compactIndex(spark, root)
    assert(graft.operators.Versioned.listDeltas(spark, nv).isEmpty)
    // the replay: appendIndex refuses (ids present), the tag heals
    assert(GraphIndex.appendIndex(b2, "doc_id", "text", root, Some("t-42")).isEmpty)
    val healed = GraphIndex.deltaByTag(spark, nv, "t-42")
      .getOrElse(fail("compaction lost the tagged delta's heal artifacts"))
    assert(edgesOf(healed) === wantEdges,
      "healed dir must carry the batch's own re-judged edges")
    assert(idsOf(healed, "affected") === wantAffected)
    // the cluster-heal path reads affected+postings from the healed
    // dir — updateFromDelta must run against it and relabel the same
    // ids a pre-compaction heal would
    val croot = tmp()
    ClusterIndex.writeIndex(spark, root, croot)
    val cd = ClusterIndex.updateFromDelta(spark, root, croot, healed)
    assert(spark.read.schema("id long, label long")
      .parquet(s"$cd/labels").count() > 0)
    // a SECOND compaction carries the store forward
    val nv2 = GraphIndex.compactIndex(spark, root)
    assert(GraphIndex.deltaByTag(spark, nv2, "t-42").nonEmpty,
      "heal artifacts must survive repeated compactions (within retention)")
    // an unknown tag still finds nothing (plain redelivery emits nothing)
    assert(GraphIndex.deltaByTag(spark, nv2, "t-43").isEmpty)
  }

  test("TagRetain overflow is observable: a trimmed tag's heal FAILS " +
    "loud instead of silently emitting nothing") {
    // 17 concurrent streams on one index = 17 tagged in-flight deltas;
    // compaction keeps the newest TagRetain=16 heal dirs. Before this
    // round the 17th's artifacts vanished silently — a crash heal by
    // that tag returned None, which reads as "plain redelivery, emit
    // nothing", and the batch's sink partition was silently lost. The
    // _TRIMMED ledger turns that into a hard, diagnosable error while
    // unknown tags (true redeliveries) still heal to None.
    val docs = Tables.documents(spark, sf)
    val root = tmp()
    GraphIndex.writeIndex(docs.filter(col("doc_id") < 100), "doc_id", "text", root)
    val n = GraphIndex.TagRetain + 1
    (1 to n).foreach { i =>
      val lo = 100 + (i - 1) * 5
      GraphIndex.appendIndex(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 5),
        "doc_id", "text", root, Some(f"t-$i%02d"))
    }
    val nv = GraphIndex.compactIndex(spark, root)
    // newest TagRetain tags still heal by tag
    assert(GraphIndex.deltaByTag(spark, nv, f"t-$n%02d").nonEmpty)
    assert(GraphIndex.deltaByTag(spark, nv, "t-02").nonEmpty)
    // the trimmed oldest tag fails LOUD, naming the cap
    val e = intercept[IllegalStateException] {
      GraphIndex.deltaByTag(spark, nv, "t-01")
    }
    assert(e.getMessage.contains("trimmed") &&
      e.getMessage.contains("TagRetain"), e.getMessage)
    // a tag never committed is still a plain None (redelivery path)
    assert(GraphIndex.deltaByTag(spark, nv, "t-99").isEmpty)
    // the ledger carries forward across a SECOND compaction (which
    // itself drops nothing: 16 preserved dirs, no live deltas)
    val nv2 = GraphIndex.compactIndex(spark, root)
    intercept[IllegalStateException] {
      GraphIndex.deltaByTag(spark, nv2, "t-01")
    }
    assert(GraphIndex.deltaByTag(spark, nv2, f"t-$n%02d").nonEmpty)
  }
}
