package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-independent properties of the tenth wave (SelectionQueries):
  * the DuckDB gate proves engine parity; these pin the ALGORITHMIC
  * claims — prefix-filter completeness, once-per-triangle counting,
  * RRF arithmetic consistency, importance-weight direction, and
  * normalization's collapsing power — on real and hand-built corpora.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q_simjoin equals unfiltered brute force (prefix filter is complete)") {
    val docs = Tables.documents(spark, sf)
    // brute force: EVERY intersecting pair as a candidate (J > 0
    // requires a shared shingle), exact jaccard, same threshold
    val sh = graft.functions.Dedup
      .shingleHashes(docs, "doc_id", "text", shingleK = 3)
      .dropDuplicates("id", "h")
    val allCands = sh.select(col("h"), col("id").as("id_a")).hint("merge")
      .join(sh.select(col("h"), col("id").as("id_b")), "h")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val brute = graft.functions.Dedup
      .ngramJaccard(docs, allCands, "doc_id", "text", shingleK = 3)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = queries.SelectionQueries.queries("q_simjoin")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute,
      s"missing: ${brute -- got}; spurious: ${got -- brute}")
    assert(got.nonEmpty, "sf0.001 must contain true near-dup pairs")
  }

  test("q_triangles equals naive undirected enumeration, once per triangle") {
    val docs = Tables.documents(spark, sf)
    val edges = graft.functions.Dedup.sharedShingleEdges(docs,
        "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
      .select("id_a", "id_b")
    // naive: edges carry id_a < id_b, so (x<y<z) joins count each
    // triangle exactly once regardless of degree orientation
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e2.id_a") === col("e1.id_b"))
      .join(edges.as("e3"),
        col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b"))
      .select(col("e1.id_a").as("x"), col("e1.id_b").as("y"), col("e2.id_b").as("z"))
    val expected = naive
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = queries.SelectionQueries.queries("q_triangles")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "sf0.001 edge graph must contain triangles")
  }

  test("q_rrf_fusion rows recompute from their component rankings") {
    val out = queries.SelectionQueries.queries("q_rrf_fusion")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
    val sparse = graft.functions.Retrieval.bm25TopK(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"), "doc_id", "text", topK = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val emb = Tables.embeddings(spark, sf)
    val srcOf = docs.select(col("doc_id").as("vec_id"), col("source"))
    val embSrc = emb.join(srcOf, "vec_id")
    val dense = graft.functions.Similarity.bruteForceTopK(
        embSrc.filter(col("source") =!= "src0").drop("source"),
        embSrc.filter(col("source") === "src0").drop("source"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    // per query: ≤10 rows, ranks 1..n contiguous, rrf = the exact sum
    // of its component reciprocal ranks
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val expect = sparse.get(key).map(x => 1.0 / (x + 60.0)).getOrElse(0.0) +
        dense.get(key).map(x => 1.0 / (x + 60.0)).getOrElse(0.0)
      assert(r.getDouble(3) == expect, s"rrf mismatch at $key")
    }
  }

  test("q_rrf_fusion_ann: IVF-served fusion holds a recall floor vs the exact fusion") {
    // the production row (118c) trades the dense leg's exactness for
    // an index probe — the quantitative gate is fused-top-10 recall
    // against the exact q_rrf_fusion on the gate corpus (the q_ann_ivf
    // convention: a rows-only query carries a measured floor, never
    // just a rows>0 smoke check)
    val exact = queries.SelectionQueries.queries("q_rrf_fusion")(spark, sf)
      .select("query_id", "doc_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet
    val ann = queries.SelectionQueries.queries("q_rrf_fusion_ann")(spark, sf)
      .select("query_id", "doc_id").as[(Long, Long)](
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet
    assert(exact.nonEmpty && ann.nonEmpty)
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, f"ANN fusion recall degraded: $recall%.3f < 0.9")
    // the sparse leg is identical in both rows, so every divergence is
    // the dense leg's recall — per-query rank/row discipline still holds
    val perQuery = queries.SelectionQueries.queries("q_rrf_fusion_ann")(spark, sf)
      .collect().groupBy(_.getLong(0))
    perQuery.foreach { case (_, rows) =>
      assert(rows.length <= 10)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("importance weights rank target-like docs above off-distribution docs") {
    import spark.implicits._
    // target (src0) speaks {alpha beta}; raw docs: one in-distribution,
    // one off-distribution — the DSIR weight must order them
    val docs = Seq(
      (0L, "alpha beta alpha beta", "src0"),
      (1L, "alpha beta", "src1"),
      (2L, "zeta eta theta", "src1")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_imp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.SelectionQueries.queries("q_importance")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > 0.0, "in-distribution doc must score positive")
    assert(out(1L) > out(2L), "in-distribution must outrank off-distribution")
  }

  test("bucketed importance scoring matches a driver md5-bucket recompute") {
    import spark.implicits._
    // the hashing-trick model (round 11): every engine-side number —
    // bucket ids, Laplace smoothing over OCCUPIED buckets, the r6
    // rounding — re-derived in plain Scala, no Spark expressions
    val rows = Seq(
      (0L, "alpha beta alpha gamma", "src0"),
      (1L, "alpha beta delta", "src1"),
      (2L, "zeta eta theta alpha", "src1"),
      (3L, "beta beta gamma epsilon", "src2"))
    val dir = java.nio.file.Files.createTempDirectory("graft_impdrv").toString
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val n = graft.functions.Selection.DefaultBuckets
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % n
    }
    val tokd = rows.map { case (id, text, src) =>
      (id, src, text.split(" ").filter(_.nonEmpty).toSeq.map(bucket)) }
    def pool(p: Seq[Long]): Map[Long, Long] =
      p.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tgt = pool(tokd.filter(_._2 == "src0").flatMap(_._3))
    val raw = pool(tokd.filter(_._2 != "src0").flatMap(_._3))
    val v = (tgt.keySet ++ raw.keySet).size
    val nt = tgt.values.sum.toDouble + v
    val nr = raw.values.sum.toDouble + v
    def lrOf(h: Long): Double =
      math.log((tgt.getOrElse(h, 0L) + 1.0) / nt) -
        math.log((raw.getOrElse(h, 0L) + 1.0) / nr)
    val expect = tokd.filter(_._2 != "src0").map { case (id, _, hs) =>
      (id, hs.size.toLong,
        math.floor(hs.map(lrOf).sum / hs.size * 1e6 + 0.5) / 1e6)
    }.toSet
    val got = queries.SelectionQueries.queries("q_importance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect, s"driver recompute diverged: $got vs $expect")
  }

  test("auditBroadcastVocab: bucketed model clean, raw-vocab broadcast flagged") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val (lr, defaults) = graft.functions.Selection
      .tokenLogRatios(docs, "text", col("source") === "src0")
    val scored = graft.functions.Selection.scoreAgainst(
      docs.filter(col("source") =!= "src0"), "doc_id", "text", lr, defaults)
    assert(graft.plans.ScaleGuard.auditBroadcastVocab(scored).isEmpty,
      "the bucketed model must pass the bounded-broadcast audit")
    // the pre-bucketing shape: vocabulary table keyed on the raw
    // 64-bit token hash, force-broadcast — must be flagged
    val vocab = docs
      .select(explode(graft.functions.Dedup.tokens(col("text"))).as("t"))
      .select(xxhash64(col("t")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
    val probe = docs.select(xxhash64(col("text")).as("h"))
    val bad = probe.join(broadcast(vocab), Seq("h"), "left")
    assert(graft.plans.ScaleGuard.auditBroadcastVocab(bad).nonEmpty,
      "an unbounded hash-keyed broadcast must be flagged")
  }

  test("persisted importance model scores identically to the in-job path") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_impm").toString
    graft.functions.Selection.writeImportanceModel(
      docs, "doc_id", "text", col("source") === "src0", dir)
    val vdir = graft.operators.Versioned.resolve(spark, dir).get
    val raw = docs.filter(col("source") =!= "src0")
    val indexed = graft.functions.Selection
      .scoreImportanceIndexed(spark, vdir, raw, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = queries.SelectionQueries.queries("q_importance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(indexed == direct)
    assert(indexed.nonEmpty)
  }

  test("importance model appends ≡ rebuild on the union; replay and compaction clean") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val isTgt = col("source") === "src0"
    val base = docs.filter(isTgt || col("doc_id") < 300)
    val batch = docs.filter(!isTgt && col("doc_id") >= 300)
    assert(batch.count() > 0)
    val cand = docs.filter(!isTgt).limit(50)

    val dir = java.nio.file.Files.createTempDirectory("graft_impapp").toString
    graft.functions.Selection.writeImportanceModel(
      base, "doc_id", "text", isTgt, dir)
    val delta = graft.functions.Selection.appendImportanceModel(
      batch, "doc_id", "text", isTgt, dir)
    assert(delta.isDefined, "a genuinely-new batch must commit a delta")
    val vdir = graft.operators.Versioned.resolve(spark, dir).get

    def score(vd: String) = graft.functions.Selection
      .scoreImportanceIndexed(spark, vd, cand, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val appended = score(vdir)
    // fresh rebuild over the SAME union of pools
    val dir2 = java.nio.file.Files.createTempDirectory("graft_impfull").toString
    val v2 = graft.functions.Selection.writeImportanceModel(
      docs, "doc_id", "text", isTgt, dir2)
    assert(appended == score(v2))
    assert(appended.nonEmpty)

    // all-duplicates replay commits nothing
    assert(graft.functions.Selection.appendImportanceModel(
      batch, "doc_id", "text", isTgt, dir).isEmpty)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)

    // compaction folds into a deltaless version scoring identically
    val cdir = graft.functions.Selection.compactImportanceModel(spark, dir)
    assert(graft.operators.Versioned.listDeltas(spark, cdir).isEmpty)
    assert(score(cdir) == appended)
  }

  test("q_drift values are valid JS divergences over all source pairs") {
    val out = queries.SelectionQueries.queries("q_drift")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val nSrc = Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(out.length == nSrc * (nSrc - 1) / 2, "every ordered pair emits")
    val ln2 = math.log(2.0)
    out.foreach { case (a, b, jsd) =>
      assert(a < b)
      assert(jsd >= -1e-9 && jsd <= ln2 + 1e-9,
        s"JSD out of [0, ln2] for ($a,$b): $jsd")
    }
  }

  test("q_phrase_search hits are real occurrences of the top boilerplate shingle") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val probe = graft.functions.Dedup
      .frequentShingles(docs, "text", shingleK = 3, minCount = 2)
      .orderBy(col("n").desc, col("shingle")).limit(1)
      .collect().head.getString(0)
    val out = queries.SelectionQueries.queries("q_phrase_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    val texts = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, nHits, firstPos) =>
      val toks = texts(id).split(" ").filter(_.nonEmpty)
      val occ = (0 to toks.length - 3)
        .filter(i => toks.slice(i, i + 3).mkString(" ") == probe)
      assert(occ.length.toLong == nHits, s"doc $id hit count")
      assert(occ.head == firstPos, s"doc $id first position")
    }
  }

  test("normalized dedup collapses reformattings raw exact dedup keeps apart") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello, World!", "src1"),
      (1L, "hello   world", "src1"),
      (2L, "HELLO WORLD", "src1"),
      (3L, "different text", "src1")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft_norm").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.SelectionQueries.queries("q_dedup_norm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((0L, 3L, 3L), (3L, 1L, 1L)),
      s"got ${out.toSeq}: three reformattings must collapse to keep_id 0 " +
        "with 3 raw variants")
  }
}
