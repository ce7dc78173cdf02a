package graft.functions

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the persisted sketch profile: incremental tagged appends must
  * agree with a one-shot whole-corpus build — EXACTLY for the HLL
  * distinct estimates and the counts (HLL union is register-wise max,
  * order-invariant), within the rank bound for KLL — and a replayed
  * batch tag must be refused before AND after compaction (sketch
  * merges double-count; the tag is the only replay guard).
  */
class SketchProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def estimates(root: String): Map[String, (Double, Long, Long)] = {
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    SketchProfile.readEstimates(spark, vdir)
      .select($"source".as[String], $"est_distinct_tokens".as[Double],
        $"n_docs".as[Long], $"n_tokens".as[Long])
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  private def kllP50(root: String): Map[String, Double] = {
    import graft.plans.KllQuantiles._
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    SketchProfile.readProfile(spark, vdir)
      .select($"source".as[String],
        kll_quantiles(col("kll"), Seq(0.5)).getItem(0).as[Double])
      .collect().toMap
  }

  test("tagged incremental appends ≡ one-shot build; replay refused; " +
    "compaction preserves profile AND tags") {
    val docs = Tables.documents(spark, sf)
    val inc = tmp("graft_prof_inc")
    val full = tmp("graft_prof_full")
    SketchProfile.writeIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", "source", inc)
    SketchProfile.appendBatch(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "source", inc, Some("b1"))
    SketchProfile.appendBatch(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", "source", inc, Some("b2"))
    SketchProfile.writeIndex(docs, "doc_id", "text", "source", full)

    val got = estimates(inc)
    val want = estimates(full)
    assert(got.keySet == want.keySet)
    got.foreach { case (src, (est, nd, nt)) =>
      val (wEst, wNd, wNt) = want(src)
      assert(nd == wNd && nt == wNt, s"$src: exact counts diverge")
      assert(est == wEst,
        s"$src: HLL union of increments must EQUAL the one-shot sketch " +
          s"($est vs $wEst) — register-wise max is order-invariant")
    }
    // KLL medians: both routes honor the rank bound vs exact per-doc
    // token counts (merge is randomized, so cross-route equality is
    // not guaranteed — the bound is)
    val exact = docs
      .select($"source".as[String],
        size(Dedup.tokens(col("text"))).cast("long").as[Long].as("n"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    Seq(kllP50(inc), kllP50(full)).foreach { m =>
      m.foreach { case (src, p50) =>
        val vs = exact(src)
        val n = vs.length.toDouble
        val lt = vs.count(_ < p50); val le = vs.count(_ <= p50)
        assert(lt <= 0.5 * n + 0.025 * n + 1 && le >= 0.5 * n - 0.025 * n - 1,
          s"$src: KLL median $p50 outside the rank bound")
      }
    }

    // replayed tag: refused, profile unchanged
    assert(SketchProfile.appendBatch(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "source", inc, Some("b1")).isEmpty)
    assert(estimates(inc) === got)

    // compaction: profile identical, deltas folded, tags SURVIVE —
    // the replay stays refused afterwards
    SketchProfile.compactIndex(spark, inc)
    val cv = graft.operators.Versioned.resolve(spark, inc).get
    assert(graft.operators.Versioned.listDeltas(spark, cv).isEmpty)
    assert(estimates(inc) === got)
    assert(SketchProfile.committedTags(spark, cv) === Set("b1", "b2"))
    assert(SketchProfile.appendBatch(docs.filter(col("doc_id") % 3 === 2),
      "doc_id", "text", "source", inc, Some("b2")).isEmpty,
      "a tag must stay refused across compaction — re-merging double-counts")
  }

  test("concurrent same-tag appends commit exactly once (guard under lock)") {
    // the check-then-act race commitDeltaIf closes: two appends carrying
    // the same tag both pass a caller-side committedTags check, then
    // race to commit — sketch merges are non-idempotent, so a double
    // commit double-counts every token. The writer _LOCK throws on
    // contention (single-writer artifacts), so each thread retries on
    // the "locked by another writer" IOException; what must hold is the
    // END state: exactly one Some across both threads, and the profile
    // equal to a single append.
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val root = tmp("graft_prof_race")
    SketchProfile.writeIndex(base, "doc_id", "text", "source", root)

    val oneShot = tmp("graft_prof_race_ref")
    SketchProfile.writeIndex(base, "doc_id", "text", "source", oneShot)
    SketchProfile.appendBatch(batch, "doc_id", "text", "source", oneShot, Some("rb"))

    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Option[String]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def contender(): Thread = new Thread(() => {
      barrier.await()
      var done = false
      while (!done)
        try {
          results.add(SketchProfile.appendBatch(
            batch, "doc_id", "text", "source", root, Some("rb")))
          done = true
        } catch {
          case e: java.io.IOException
            if e.getMessage.contains("locked by another writer") ||
               e.getMessage.contains("re-acquiring expired lock") =>
            Thread.sleep(50) // lock contention: retry until a clean verdict
          case t: Throwable => errors.add(t); done = true
        }
    })
    val ts = Seq(contender(), contender())
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(ts.forall(!_.isAlive), "contender thread hung")
    assert(errors.isEmpty,
      s"contender died: ${errors.toArray.toSeq.map(_.toString).mkString("; ")}")
    val rs = results.toArray(Array.empty[Option[String]]).toSeq
    assert(rs.count(_.nonEmpty) == 1 && rs.count(_.isEmpty) == 1,
      s"same tag must commit exactly once: $rs")
    assert(estimates(root) === estimates(oneShot),
      "double-committed sketch merge detected — profile diverges from one append")
    val vdir = graft.operators.Versioned.resolve(spark, root).get
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)
  }

  test("profileIngest: channel-driven micro-batches + redelivery keep " +
    "the profile exactly-once") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp("graft_prof_s")
    SketchProfile.writeIndex(docs.filter(col("doc_id") < 200),
      "doc_id", "text", "source", s"$dir/idx")
    val rows = docs.filter(col("doc_id") >= 200)
      .select("doc_id", "text", "source").as[(Long, String, String)]
      .collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String, String)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.profileIngest(
      ch.toDS.toDF("doc_id", "text", "source"), s"$dir/idx", s"$dir/out",
      s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      val full = tmp("graft_prof_sf")
      SketchProfile.writeIndex(docs, "doc_id", "text", "source", full)
      assert(estimates(s"$dir/idx") === estimates(full),
        "streamed profile diverges from the one-shot build")
      // channel redelivery is NOT a checkpoint replay (new batch id →
      // new tag), so the duplicate CONTENT double-counts tokens — the
      // tag guards the crash-replay window, not content dedup. What
      // must hold: the same (queryId, batchId) appending twice is
      // refused, which the crash-window spec below exercises directly.
      val vdir = graft.operators.Versioned.resolve(spark, s"$dir/idx").get
      val tags = SketchProfile.committedTags(spark, vdir)
      assert(tags.size >= 2, s"expected one tag per non-empty batch: $tags")
      // direct crash-window simulation: re-append an already-committed
      // tag — refused, estimates stable
      val t0 = tags.head
      assert(SketchProfile.appendBatch(
        docs.filter(col("doc_id") < 10), "doc_id", "text", "source",
        s"$dir/idx", Some(t0)).isEmpty)
      assert(estimates(s"$dir/idx") === estimates(full))
    } finally q.stop()
  }
}
