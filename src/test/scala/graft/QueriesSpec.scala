package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: the full Verify+DuckDB oracle run is the
  * real gate (tools/check.py); this spec guards the contract shape
  * plus a few end-to-end smokes at sf0.001.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("SURVEY §2 inventory is fully wired") {
    // Derived, not hard-coded sizes (which rot as waves of operators
    // land): every query either carries a DuckDB oracle or is on the
    // explicit rows-only allowlist (SURVEY §2 "✅rows" — hash/LSH
    // internals no portable SQL can reproduce). A new query without an
    // oracle fails here until it is consciously declared rows-only.
    // q_fingerprint LEFT this list in round 10 (DuckDB's list_reduce
    // reproduces the byte-fold exactly on the verified-ASCII corpus);
    // q_approx_distinct left in round 15 (rebuilt as a portable
    // fixed-seed HLL whose integer register sums both engines replay)
    // q_dedup_minhash / q_dedup_simhash left in round 17 (portable
    // md5-derived double-hash signatures / 60-bit simhashes both
    // engines reproduce bit-for-bit)
    // q_embed_pca joined in round 17 (rows-only BY NATURE: no SQL
    // eigensolve; EmbedStatsSpec pins the spectrum against a direct
    // two-pass covariance recompute)
    // q_ann_lsh left in round 18 (md5-derived hyperplane weight
    // literals — the oracle reproduces signatures, buckets and r4
    // rerank sims; the last hash-family graduation VERDICT r17 #8
    // asked to evaluate). The 11 remaining are rows-only by NATURE:
    // k-means/PQ quantizers (ivf/pq/ivfpq + rrf_fusion_ann on top),
    // Spark-internal sketches (approx_percentile, kll), an iterative
    // driver loop (bpe), native DEFLATE (compress_ratio), a fixpoint
    // peel (coreness ×2), and the eigensolve (embed_pca).
    val rowsOnly = Set(
      "q_ann_ivf", "q_ann_ivfpq", "q_ann_pq",
      "q_approx_percentile",
      "q_bpe_merges", "q_compress_ratio", "q_coreness", "q_coreness_indexed",
      "q_embed_pca",
      "q_kll_quantiles",
      "q_rrf_fusion_ann")
    val withoutOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(withoutOracle == rowsOnly,
      s"queries without oracle != declared rows-only allowlist; " +
        s"undeclared: ${withoutOracle -- rowsOnly}, stale: ${rowsOnly -- withoutOracle}")
    assert(SparkEntry.queries.size >= 62, "query inventory shrank below the round-2 level")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_curate_e2e funnel-stage observed counts catch silent regressions") {
    val df = SparkEntry.queries("q_curate_e2e")(spark, sf)
    df.collect()
    val m = df.queryExecution.observedMetrics
    val scored = m("curate_scored").getAs[Long]("rows")
    val filtered = m("curate_filtered").getAs[Long]("rows")
    val kept = m("curate_kept").getAs[Long]("rows")
    val trimmed = m("curate_span_trimmed").getAs[Long]("rows")
    val lmKept = m("curate_lm_kept").getAs[Long]("rows")
    // stage 1 sees every document; each later stage can only shrink
    assert(scored == graft.Tables.documents(spark, sf).count())
    assert(filtered < scored, "the quality filter stopped filtering")
    assert(kept <= filtered && kept > 0,
      s"funnel shape violated: $scored -> $filtered -> $kept")
    assert(trimmed <= kept && trimmed > 0,
      s"span-trim shape violated: $kept -> $trimmed")
    // monotone only: whether the FIXED production cutoff (3.41)
    // drops anything at this SF is a property of the synthetic
    // corpus, not of the gate machinery — coupling the two would
    // fail the suite with correct code on regenerated test data
    assert(lmKept <= trimmed && lmKept > 0,
      s"LM-gate shape violated: $trimmed -> $lmKept")
    // the gate MACHINERY must demonstrably gate at a cutoff derived
    // from the corpus itself: the per-doc mean-NLL distribution
    // (q_lm_score — the same scoring pipeline the funnel's gate
    // runs) must be non-degenerate around its measured 90th
    // percentile, i.e. thresholding there keeps some docs and drops
    // some docs regardless of where the fixed constant happens to
    // sit relative to this corpus
    val nlls = SparkEntry.queries("q_lm_score")(spark, sf)
      .select("avg_nll").collect().map(_.getDouble(0))
    val cutoff = nlls.sorted.apply((nlls.length * 9) / 10)
    val dropped = nlls.count(_ > cutoff)
    assert(dropped > 0 && dropped < nlls.length,
      s"corpus-quantile LM gate degenerate: $dropped/${nlls.length} above " +
        s"the measured p90 cutoff $cutoff")
  }

  test("representative queries return rows at sf0.001") {
    Seq("q_tpch_q1", "q_dedup_minhash", "q_ann_bruteforce", "q_stream_window")
      .foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q returned 0 rows")
      }
  }

  test("q_minhash_clusters partitions the corpus and keeps the min id") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_minhash_clusters")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs,
      "cluster sizes must partition the corpus (every doc in exactly one)")
    // labelPropagation's component label IS the min member id, and
    // keep-first dedup keeps exactly that — a divergence means the
    // canonical-id rule drifted
    rows.foreach { case (comp, _, keep) =>
      assert(comp == keep, s"component $comp keeps $keep, not its min id")
    }
    assert(rows.exists(_._2 > 1), "no multi-doc cluster — weak corpus")
  }

  test("q_time_to_convert is a coherent KM table: 30-day grid, telescoping " +
    "at-risk counts, exact-ratio survival, non-increasing") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_time_to_convert")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L until 30L), "grid must be days 0..29")
    val n0 = rows.head._2 // day 0 at-risk = full cohort
    assert(n0 > 0, "empty signup cohort — weak corpus")
    rows.foreach { case (d, atRisk, conv, surv) =>
      assert(conv <= atRisk, s"day $d: more conversions than at-risk")
      // survival is the exact integer ratio — reproduce it bit-for-bit
      assert(surv == (atRisk - conv).toDouble / n0,
        s"day $d: survival $surv is not the exact (atRisk-conv)/n0 ratio")
    }
    // end-of-window-only censoring: at-risk telescopes by conversions
    rows.sliding(2).foreach { case Array((d, ar, c, _), (_, ar2, _, _)) =>
      assert(ar2 == ar - c, s"day $d->${d + 1}: at-risk $ar-$c != $ar2")
    }
    assert(rows.map(_._4).sliding(2).forall(p => p(1) <= p(0)),
      "survival must be non-increasing")
  }
}
