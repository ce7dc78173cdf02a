package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference BM25 computed independently in plain Scala. */
  private def refBm25(corpus: Seq[(Long, String)], query: String,
                      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val n = corpus.size
    val avgdl = corpus.map(d => toks(d._2).size).sum.toDouble / n
    val dfm = corpus.flatMap(d => toks(d._2).distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val qts = toks(query).distinct
    corpus.map { case (id, text) =>
      val ts = toks(text)
      val dl = ts.size
      val tfm = ts.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val s = qts.flatMap { t =>
        tfm.get(t).map { tf =>
          val df = dfm(t)
          math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }
      }.sum
      id -> math.floor(s * 10000 + 0.5) / 10000
    }.toMap
  }

  test("bm25TopK matches an independent scalar implementation") {
    val corpus = Seq(
      (1L, "spark runs distributed queries over parquet tables"),
      (2L, "duck db runs local queries fast"),
      (3L, "spark spark spark repeated token saturation check"),
      (4L, "completely unrelated words about cooking pasta tonight"),
      (5L, "distributed systems shuffle data between executors"))
    val queries = Seq((100L, "spark distributed queries"))
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        queries.toDF("doc_id", "text"), "doc_id", "text", topK = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    val ref = refBm25(corpus, "spark distributed queries")
      .filter(_._2 > 0).toSeq.sortBy(r => (-r._2, r._1)).take(3)
    assert(got.map(_._3) == ref.map(_._1), s"ranking differs: $got vs $ref")
    got.foreach { case (q, _, doc, score) =>
      assert(q == 100L)
      assert(math.abs(score - ref.toMap.apply(doc)) < 1e-9,
        s"doc $doc score $score != ref ${ref.toMap.apply(doc)}")
    }
    // tf saturation: doc 3 repeats "spark" 3x but must not dominate
    // doc 1, which matches all three query terms
    assert(got.head._3 == 1L, "doc matching every query term must rank first")
  }

  test("bm25TopKIndexed over a persisted lexical index equals the direct path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lex").toString
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("source") =!= "src0")
    val queries = docs.filter(col("source") === "src0")
    val vdir = Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir)
    val direct = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val indexed = Retrieval.bm25TopKIndexed(spark, vdir, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(indexed == direct)
    assert(direct.nonEmpty)
    // serving reads PRUNE to the query terms' hash buckets: the tf/df
    // scans must carry pb partition filters (directory skipping —
    // the lexical analog of IVF cell pruning), and a single-term
    // query must plan scans of exactly one bucket's worth of filters
    val plan = Retrieval
      .bm25TopKIndexed(spark, vdir,
        queries.limit(1), "doc_id", "text", topK = 5)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*pb#".r.findFirstIn(plan).isDefined,
      s"bucketed serving lost its partition pruning:\n${plan.take(2000)}")
  }

  test("appendLexicalIndex ≡ full rebuild on the union; replay appends nothing") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val queries = docs.filter(col("source") === "src0")
    val base = docs.filter(col("source") =!= "src0" && col("doc_id") < 300)
    val batch = docs.filter(col("source") =!= "src0" && col("doc_id") >= 300)
    assert(base.count() > 0 && batch.count() > 0)

    val dir = java.nio.file.Files.createTempDirectory("graft_lexapp").toString
    Retrieval.writeLexicalIndex(base, "doc_id", "text", dir)
    val delta = Retrieval.appendLexicalIndex(batch, "doc_id", "text", dir)
    assert(delta.isDefined, "a genuinely-new batch must commit a delta")
    // the delta holds ONLY the batch's docs
    val deltaIds = spark.read.parquet(s"${delta.get}/tf")
      .select("id").distinct().as[Long].collect().toSet
    assert(deltaIds == batch.select("doc_id").as[Long].collect().toSet)

    // appended index scores EXACTLY like a fresh build over the union
    val vdir = graft.operators.Versioned.resolve(spark, dir).get
    val appended = Retrieval
      .bm25TopKIndexed(spark, vdir, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val rebuilt = Retrieval.bm25TopK(
        docs.filter(col("source") =!= "src0"), queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(appended == rebuilt)
    assert(appended.nonEmpty)

    // a replayed (all-duplicates) batch is self-healing: no delta
    assert(Retrieval.appendLexicalIndex(batch, "doc_id", "text", dir).isEmpty)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)

    // compaction folds base+delta into a fresh deltaless version that
    // scores bit-identically
    val cdir = Retrieval.compactLexicalIndex(spark, dir)
    assert(cdir != vdir)
    assert(graft.operators.Versioned.listDeltas(spark, cdir).isEmpty)
    val compacted = Retrieval
      .bm25TopKIndexed(spark, cdir, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(compacted == rebuilt)
  }

  test("zero-token docs replay idempotently and keep counting in stats n") {
    import org.apache.spark.sql.functions.col
    // the empty doc has NO tf rows but DOES count in n — append dedup
    // must key on ids/, not tf presence, or every replay re-appends it
    // and drifts n (hence idf and avgdl) upward
    val corpus = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_lexempty").toString
    Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir)
    val vdir0 = graft.operators.Versioned.resolve(spark, dir).get
    def statsN = {
      val (_, _, stats) = Retrieval.readLexicalIndex(spark,
        graft.operators.Versioned.resolve(spark, dir).get)
      stats.select("n").as[Long].head()
    }
    assert(statsN == 3L, "empty doc must count in n")
    // replay of an all-duplicates batch CONTAINING the empty doc
    assert(Retrieval.appendLexicalIndex(
      corpus.filter(col("doc_id") >= 2), "doc_id", "text", dir).isEmpty)
    assert(statsN == 3L, "replay must not drift n")
    assert(graft.operators.Versioned.listDeltas(spark, vdir0).isEmpty)
    // a genuinely-new empty doc appends once, then replays clean
    val emptyBatch = Seq((4L, "")).toDF("doc_id", "text")
    assert(Retrieval.appendLexicalIndex(emptyBatch, "doc_id", "text", dir).isDefined)
    assert(statsN == 4L)
    assert(Retrieval.appendLexicalIndex(emptyBatch, "doc_id", "text", dir).isEmpty)
    assert(statsN == 4L)
  }

  test("a pre-append-era index (stats = n, avgdl; no ids/) keeps serving") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("source") =!= "src0")
    val queries = docs.filter(col("source") === "src0")
    val dir = java.nio.file.Files.createTempDirectory("graft_lexold").toString
    val vdir = Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir)
    // rewrite the version as the OLD layout: stats carries the derived
    // avgdl instead of the sdl partial, and ids/ does not exist
    val old = spark.read.parquet(s"$vdir/stats")
      .select(col("n"), (col("sdl").cast("double") / col("n")).as("avgdl"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    old.toDF("n", "avgdl").write.mode("overwrite").parquet(s"$vdir/stats")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$vdir/ids"), true)
    // old index still scores identically to the direct path
    val indexed = Retrieval.bm25TopKIndexed(spark, vdir, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val direct = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(indexed == direct)
    // and append still dedups (via the tf-id fallback)
    assert(Retrieval.appendLexicalIndex(
      corpus.limit(10), "doc_id", "text", dir).isEmpty)
  }

  test("bm25TopK: doc_id tiebreak and topK bound are deterministic") {
    val corpus = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta"),
      (4L, "alpha beta"), (5L, "gamma delta"))
    val got = Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        Seq((9L, "alpha")).toDF("doc_id", "text"), "doc_id", "text", topK = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2).toSeq
    // four identical-score docs, k=3: smallest doc ids win, in order
    assert(got.map(_._3) == Seq(1L, 2L, 3L))
    assert(got.map(_._2) == Seq(1, 2, 3))
    assert(got.map(_._4).distinct.size == 1)
  }

  test("bm25TopKIndexed stays type-generic in the QUERY id column") {
    // the round-14 pruned serving path collects the query-side
    // (query_id, term-hash) pairs and round-trips them as Rows with
    // the frame's own schema — a getLong on the id would break every
    // string/int-id caller of this public API and silently retype the
    // output schema. Corpus ids stay long (the index layout); QUERY
    // ids are caller-defined.
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_sid").toString
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon")).toDF("doc_id", "text")
    val vdir = Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir)
    val queries = Seq(("qA", "beta gamma"), ("qB", "epsilon"))
      .toDF("qid", "text")
    val got = Retrieval
      .bm25TopKIndexed(spark, vdir, queries, "qid", "text", topK = 2)
      .as[(String, Int, Long, Double)].collect()
    assert(got.map(_._1).toSet == Set("qA", "qB"))
    assert(got.nonEmpty && got.forall(_._4 > 0.0))
    // pruned ≡ unpruned on the same string-id workload
    val unpruned = Retrieval
      .bm25TopKIndexed(spark, vdir, queries, "qid", "text", topK = 2,
        prune = false)
      .as[(String, Int, Long, Double)].collect()
    assert(got.toSet == unpruned.toSet)
  }

  test("a corrupt tf/ component THROWS instead of scoring empty") {
    // the tolerant read exists for all-empty bucketed writes (absent
    // dir / nothing to infer). A CORRUPT component must not take that
    // branch — an index whose tf files stopped parsing would otherwise
    // quietly return zero scores for every query forever.
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_bad").toString
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "beta gamma delta"),
      (3L, "gamma delta epsilon")).toDF("doc_id", "text")
    val vdir = Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir)
    // clobber every tf parquet file with non-parquet bytes
    val tf = new java.io.File(s"$vdir/tf")
    def clobber(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(clobber)
      else if (f.getName.endsWith(".parquet")) {
        val w = new java.io.FileOutputStream(f)
        try w.write("not a parquet file".getBytes) finally w.close()
      }
    clobber(tf)
    val queries = Seq((9L, "beta")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Retrieval.bm25TopKIndexed(spark, vdir, queries, "doc_id", "text", topK = 3)
        .collect()
    }
    assert(!e.isInstanceOf[org.scalatest.exceptions.TestFailedException])
  }

  test("indexes built at different idBuckets coexist in one session, scoring identically") {
    // a cluster build sizes the by-id bucketing per corpus (the
    // writeIndex parameter); readers adapt via each index's own
    // _ID_BUCKETS marker, so a session serving an old 32-bucket index
    // and a new 128-bucket one must keep both correct simultaneously
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val corpus = docs.filter(col("source") =!= "src0")
    val queries = docs.filter(col("source") === "src0")
    val direct = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(direct.nonEmpty)
    val served = Seq(4, 16).map { nb =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_lex_b$nb").toString
      val vdir = Retrieval.writeLexicalIndex(corpus, "doc_id", "text", dir,
        idBuckets = nb)
      val marker = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$vdir/tf/_ID_BUCKETS")), "UTF-8").trim
      assert(marker == nb.toString, s"marker $marker != requested $nb")
      vdir -> Retrieval
        .bm25TopKIndexed(spark, vdir, queries, "doc_id", "text", topK = 5)
        .as[(Long, Int, Long, Double)].collect().toSet
    }
    // interleave: re-serve the FIRST index after the second registered,
    // so per-session table registrations demonstrably don't collide
    served.foreach { case (_, got) => assert(got == direct) }
    val again = Retrieval
      .bm25TopKIndexed(spark, served.head._1, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(again == direct)
    // compaction may RE-bucket: fold the 4-bucket index at 8 and the
    // marker, layout, and scores must all follow
    val dir4 = new java.io.File(served.head._1).getParent
    val cdir = Retrieval.compactLexicalIndex(spark, dir4, idBuckets = 8)
    val cm = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$cdir/tf/_ID_BUCKETS")), "UTF-8").trim
    assert(cm == "8")
    val compacted = Retrieval
      .bm25TopKIndexed(spark, cdir, queries, "doc_id", "text", topK = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(compacted == direct)
  }
}
