package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted health profile: incremental tagged appends must
  * agree BIT-EXACTLY with a one-shot build (count partials merge by
  * addition — distributive, unlike sketches there is no rank-bound
  * slack), the served KS must equal the in-job q_ks_test, replayed
  * tags must be refused before and after compaction, and the
  * streaming face must stay exactly-once.
  */
class HealthProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def ks(root: String): Seq[(String, Long, Double)] = {
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    HealthProfile.readKs(spark, vdir)
      .as[(String, Long, Double)].collect().toSeq
  }

  test("tagged incremental appends ≡ one-shot build ≡ in-job q_ks_test; " +
    "replay refused; compaction preserves hist AND tags") {
    val docs = Tables.documents(spark, sf)
    val inc = tmp("graft_health_inc")
    val full = tmp("graft_health_full")
    HealthProfile.writeIndex(docs.filter(col("doc_id") % 3 === 0),
      "source", "n_chars", inc)
    HealthProfile.appendBatch(docs.filter(col("doc_id") % 3 === 1),
      "source", "n_chars", inc, Some("b1"))
    HealthProfile.appendBatch(docs.filter(col("doc_id") % 3 === 2),
      "source", "n_chars", inc, Some("b2"))
    HealthProfile.writeIndex(docs, "source", "n_chars", full)

    val got = ks(inc)
    assert(got == ks(full),
      "incremental count folds must equal the one-shot build bit-exactly")
    // the served report equals the in-job scan query — the production
    // claim: the profile replaces the corpus re-scan, not approximates it
    val inJob = graft.SparkEntry.queries("q_ks_test")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == inJob, "profile-served KS diverges from the in-job scan")

    // replayed tag: refused, profile unchanged (count merges
    // double-count — the tag is the only replay guard)
    assert(HealthProfile.appendBatch(docs.filter(col("doc_id") % 3 === 1),
      "source", "n_chars", inc, Some("b1")).isEmpty)
    assert(ks(inc) == got)

    // compaction: result identical, deltas folded, tags survive
    HealthProfile.compactIndex(spark, inc)
    val cv = graft.operators.Versioned.resolve(spark, inc).get
    assert(graft.operators.Versioned.listDeltas(spark, cv).isEmpty)
    assert(ks(inc) == got)
    assert(HealthProfile.committedTags(spark, cv) === Set("b1", "b2"))
    assert(HealthProfile.appendBatch(docs.filter(col("doc_id") % 3 === 2),
      "source", "n_chars", inc, Some("b2")).isEmpty,
      "a tag must stay refused across compaction")
  }

  test("healthIngest: channel-driven micro-batches + crash-window replay " +
    "keep the profile exactly-once, report lands per batch") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("graft_health_s")
    HealthProfile.writeIndex(docs.filter(col("doc_id") < 200),
      "source", "n_chars", s"$dir/idx")
    val rows = docs.filter(col("doc_id") >= 200)
      .select("doc_id", "source", "n_chars").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String, Long)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.healthIngest(
      ch.toDS.toDF("doc_id", "source", "n_chars"), s"$dir/idx",
      s"$dir/out", s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      val full = tmp("graft_health_sf")
      HealthProfile.writeIndex(docs, "source", "n_chars", full)
      assert(ks(s"$dir/idx") == ks(full),
        "streamed profile diverges from the one-shot build")
      // the drift report landed per batch under batch_id partitions
      val out = spark.read.parquet(s"$dir/out")
      assert(out.select("batch_id").distinct().count() >= 2)
      // latest batch's report equals the current served KS
      val last = out.agg(max("batch_id")).as[Long].head()
      val sink = out.filter(col("batch_id") === last)
        .select("source", "n_docs", "ks")
        .orderBy("source").as[(String, Long, Double)].collect().toSeq
      assert(sink == ks(s"$dir/idx"))
      // crash-window replay: an already-committed tag is refused
      val vdir = graft.operators.Versioned.resolve(spark, s"$dir/idx").get
      val tags = HealthProfile.committedTags(spark, vdir)
      assert(tags.size >= 2, s"expected one tag per non-empty batch: $tags")
      assert(HealthProfile.appendBatch(
        docs.filter(col("doc_id") < 10), "source", "n_chars",
        s"$dir/idx", Some(tags.head)).isEmpty)
      assert(ks(s"$dir/idx") == ks(full))
    } finally q.stop()
  }

  test("q_ks_test_indexed gated face equals the in-job query") {
    val a = graft.SparkEntry.queries("q_ks_test")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val b = graft.SparkEntry.queries("q_ks_test_indexed")(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
