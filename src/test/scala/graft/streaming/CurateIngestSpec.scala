package graft.streaming

import graft.SparkTestSession
import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the streaming curation funnel (`Streams.curateIngest`):
  * the incremental keep-set must equal a sequential driver reference
  * (quality gate → first-seen exact dedup → span dup-frac against
  * history ∪ within-batch), per-batch stats must trace the funnel,
  * and redelivered documents must re-emit NOTHING (value-level
  * exactly-once via the seen-hash index).
  *
  * Note the deliberate semantics difference from the BATCH funnel
  * (q_curate_e2e): batch span df counts the whole kept corpus at
  * once; the online form counts history + the current batch — the
  * q_novelty-style arrival-order semantics every incremental curator
  * has.
  */
class CurateIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val SpanK = 8
  private val MinWords = 10
  private val MaxDup = 0.5

  /** Sequential reference over ordered batches. Quality/lang columns
    * come from the same operator expressions (the parity under test
    * is the incremental index plumbing, not lang-id itself); dedup
    * and span logic are independent driver re-implementations.
    */
  private def reference(batches: Seq[Seq[(Long, String)]])
      : (Seq[(Long, Double)], Seq[(Long, Long, Long, Long, Long)]) = {
    val seenHashes = scala.collection.mutable.Set.empty[String]
    val seenSpans = scala.collection.mutable.Set.empty[Seq[String]]
    val keptOut = Seq.newBuilder[(Long, Double)]
    val stats = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    def spansOf(text: String): Seq[Seq[String]] = {
      val ts = text.split(" ").filter(_.nonEmpty).toSeq
      if (ts.length < SpanK) Seq.empty
      else (0 to ts.length - SpanK).map(i => ts.slice(i, i + SpanK))
    }
    batches.zipWithIndex.foreach { case (rows, bi) =>
      val df = rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          TextAnalysis.nWords(col("text")).as("nw"),
          TextAnalysis.langIdScored(col("text")).as("lg"),
          md5(col("text").cast("binary")).as("h"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong,
          r.getString(3), r.getString(4)))
        .sortBy(_._1)
      val filtered = df.filter { case (_, _, nw, lg, _) => nw >= MinWords && lg != "unk" }
      val batchFirst = filtered.groupBy(_._5).view.mapValues(_.map(_._1).min).toMap
      val kept = filtered.filter { case (id, _, _, _, h) =>
        batchFirst(h) == id && !seenHashes.contains(h)
      }
      val keptSpans = kept.map { case (id, t, _, _, _) => id -> spansOf(t) }.toMap
      val perDocDistinct = keptSpans.view.mapValues(_.distinct).toMap
      val batchDf = perDocDistinct.values.flatten
        .groupBy(identity).view.mapValues(_.size).toMap
      val trimmed = kept.flatMap { case (id, _, _, _, _) =>
        val ss = perDocDistinct(id)
        val nDup = ss.count(s => seenSpans.contains(s) || batchDf(s) >= 2)
        val frac = nDup.toDouble / ss.size
        if (frac <= MaxDup) Some(id -> frac) else None
      }
      keptOut ++= trimmed
      stats += ((bi.toLong, df.length.toLong, filtered.length.toLong,
        kept.length.toLong, trimmed.length.toLong))
      // grow: exact with quality-passing hashes, spans with kept docs
      filtered.foreach { case (_, _, _, _, h) => seenHashes += h }
      perDocDistinct.values.flatten.foreach(seenSpans += _)
    }
    (keptOut.result(), stats.result())
  }

  test("curateIngest equals the sequential funnel reference; redelivery emits nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_ingest").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val third = docs.length / 3
    val (b1, rest) = docs.toSeq.splitAt(third)
    val (b2, b3) = rest.splitAt(third)
    // bootstrap both indexes empty (exact keys are 16-byte md5
    // binaries, span keys 8-byte xxhash64 longs)
    Dedup.writeHashIndex(Seq.empty[Array[Byte]].toDF("h"), s"$dir/exact")
    Dedup.writeHashIndex(Seq.empty[Long].toDF("h"), s"$dir/span")
    val ch = Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = Streams.curateIngest(ch.toDS.toDF("doc_id", "text"),
      s"$dir/exact", s"$dir/span", s"$dir/out", s"$dir/stats", s"$dir/ckpt",
      minWords = MinWords, maxDupFrac = MaxDup, spanK = SpanK)
    try {
      ch.send(b2: _*); q.processAllAvailable()
      ch.send(b3: _*); q.processAllAvailable()
      val (wantKept, wantStats) = reference(Seq(b1, b2, b3))
      val gotKept = spark.read.parquet(s"$dir/out")
        .select("doc_id", "dup_frac").as[(Long, Double)].collect().toSet
      assert(gotKept == wantKept.toSet,
        s"kept set diverged: got ${gotKept.size}, want ${wantKept.size}")
      assert(gotKept.nonEmpty, "degenerate gate: nothing kept")
      val gotStats = spark.read.parquet(s"$dir/stats")
        .select("batch_id", "scored", "filtered", "kept", "trimmed")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(gotStats == wantStats, s"stats diverged:\n$gotStats\nvs\n$wantStats")
      gotStats.foreach { case (b, s, f, k, t) =>
        assert(s >= f && f >= k && k >= t, s"funnel shape violated in batch $b")
      }
      // value-level exactly-once: redeliver b2 — every hash is already
      // in the exact index, so nothing new lands under the new
      // batch_id and both indexes stay put
      def deltas(p: String) = graft.operators.Versioned.listDeltas(spark,
        graft.operators.Versioned.resolve(spark, p).get).size
      val (de0, ds0) = (deltas(s"$dir/exact"), deltas(s"$dir/span"))
      ch.send(b2: _*); q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out")
        .select("doc_id", "dup_frac").as[(Long, Double)].collect().toSet == gotKept,
        "redelivery changed the kept set")
      val redeliveredStats = spark.read.parquet(s"$dir/stats")
        .filter(col("batch_id") === 3).select("kept", "trimmed")
        .as[(Long, Long)].collect().toSeq
      assert(redeliveredStats == Seq((0L, 0L)),
        s"redelivered batch must keep nothing: $redeliveredStats")
      assert(deltas(s"$dir/exact") == de0 && deltas(s"$dir/span") == ds0,
        "redelivery must grow neither index")
    } finally q.stop()
  }

  test("LM gate: frozen reference model filters streamed docs like the driver reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_lm").toString
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = docs.toSeq.splitAt(docs.length / 2)
    // reference LM trained on the WHOLE corpus (the frozen clean-corpus
    // discipline), served to the stream by version dir
    val lmRoot = s"$dir/lm"
    graft.functions.Curation.writeLmModel(
      docs.toSeq.toDF("doc_id", "text"), "text", lmRoot)
    val lmV = graft.operators.Versioned.resolve(spark, lmRoot).get
    // driver-side scorer mirroring the contract: mean NLL over
    // IN-VOCAB occurrences, r6 half-up; no in-vocab tokens → fail
    val model = graft.functions.Curation.readLmModel(spark, lmV)
      .as[(String, Double)].collect().toMap
    def scoreOk(text: String, cutoff: Double): Boolean = {
      val nlls = text.split(" ").filter(_.nonEmpty).flatMap(model.get)
      nlls.nonEmpty &&
        math.floor(nlls.sum / nlls.length * 1e6 + 0.5) / 1e6 <= cutoff
    }
    // cutoff at the corpus median-ish value so BOTH branches are
    // demonstrably exercised on this data
    val cutoff = 3.402
    Dedup.writeHashIndex(Seq.empty[Array[Byte]].toDF("h"), s"$dir/exact")
    Dedup.writeHashIndex(Seq.empty[Long].toDF("h"), s"$dir/span")
    val ch = Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = Streams.curateIngest(ch.toDS.toDF("doc_id", "text"),
      s"$dir/exact", s"$dir/span", s"$dir/out", s"$dir/stats", s"$dir/ckpt",
      minWords = MinWords, maxDupFrac = MaxDup, spanK = SpanK,
      lmModelPath = Some(lmRoot), maxAvgNll = cutoff)
    try {
      ch.send(b2: _*); q.processAllAvailable()
      val (wantNoLm, _) = reference(Seq(b1, b2))
      val textOf = docs.toMap
      val want = wantNoLm.filter { case (id, _) => scoreOk(textOf(id), cutoff) }
      val got = spark.read.parquet(s"$dir/out")
        .select("doc_id", "dup_frac").as[(Long, Double)].collect().toSet
      assert(got == want.toSet,
        s"LM-gated kept set diverged: got ${got.size}, want ${want.size}")
      // the gate demonstrably gates: strictly between 0 and the
      // ungated kept count
      assert(got.nonEmpty && got.size < wantNoLm.size,
        s"degenerate LM gate: ${got.size} of ${wantNoLm.size}")
      // stats trace the new stage: lm_kept ≤ trimmed per batch, and
      // kept rows carry the score
      val st = spark.read.parquet(s"$dir/stats")
        .select("batch_id", "trimmed", "lm_kept")
        .as[(Long, Long, Long)].collect()
      assert(st.nonEmpty && st.forall { case (_, t, l) => l <= t })
      assert(st.map(_._3).sum == got.size.toLong)
      val nullScores = spark.read.parquet(s"$dir/out")
        .filter(col("avg_nll").isNull).count()
      assert(nullScores == 0, "kept rows must carry their LM score")
    } finally q.stop()
  }
}
