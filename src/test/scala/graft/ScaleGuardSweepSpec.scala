package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every gated query must OPTIMIZE cleanly under ScaleGuard's fail
  * mode — "the repo is warn-free" as a failing test instead of prose.
  * A future query that sneaks in an empty-partition window or a
  * no-equi-key join fails here at plan time, before any oracle run.
  */
class ScaleGuardSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("all gated queries optimize under ScaleGuard fail mode") {
    graft.plans.ScaleGuard.register(spark)
    spark.conf.set("spark.graft.scaleGuard", "fail")
    try {
      val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try {
          // optimizedPlan runs the optimizer (and with it the guard);
          // some operators run bounded driver work during CONSTRUCTION
          // (ntile offsets, ivf training, pagerank iterations) — that
          // work itself plans under the same fail-mode session
          SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
          None
        } catch {
          case e: Throwable if e.getMessage != null &&
              e.getMessage.contains("ScaleGuard") => Some(name -> e.getMessage)
        }
      }
      assert(bad.isEmpty, bad.map { case (n, m) => s"$n: $m" }.mkString("\n"))
    } finally {
      spark.conf.set("spark.graft.scaleGuard", "warn")
      graft.plans.ScaleGuard.unregister(spark)
    }
  }

  test("no NEW gated query broadcasts an unhinted Generate (explode) build side") {
    // size-only stats don't model the explode multiplier, so a
    // planner-chosen broadcast of an exploded subtree can materialize
    // arbitrarily more than estimated in one build task (q_resample's
    // old grid join did exactly this: ~10 M rows in a single 6.6 s
    // task at sf1 — fixed by restructuring). Hinted broadcasts and
    // constant-multiplier explodes (salt replication) are exempt in
    // the audit itself.
    //
    // The queries below are KNOWN to trip at tiny SF and are accepted
    // deliberately: each is a candidate-pair / shingle pipeline whose
    // exploded side is bucket-cap-bounded (maxBucket² pairs per
    // bucket; shingles per doc bounded by doc length), and whose size
    // estimate grows with the corpus — at production scale the
    // estimate exceeds the broadcast threshold and the join reverts
    // to a key shuffle (the sf1 run measures exactly that: linear
    // shuffles, no broadcast builds). The pin is a tripwire for NEW
    // queries introducing the pattern, not an endorsement of it.
    // (q_ngram_jaccard and the round-9 span queries used to be here:
    // merge-hinting the collect_set-of-explode joins inside
    // Dedup.ngramJaccard/ngramContainment/sharedShingleEdges removed
    // the pattern at the source rather than accepting it. q_linkage
    // left in round 15 the hard way: its accepted broadcast was the
    // exact pattern that killed the query at the sf10 sweep — the
    // column-pruned corpus scan's estimate slipped under the
    // threshold and the planner collected ~1 GiB to the driver;
    // EditDistanceJoin's payload joins are merge-hinted now. The
    // remaining accepted entries all completed the full sf10 sweep
    // with ~linear shuffle ratios (PERF.md round 15), so their builds
    // are empirically bounded TWO decades above the gate SF — but the
    // lesson stands: acceptance here is a debt ledger, and decade
    // sweeps are what call it in.)
    val accepted = Set(
      "q_cooccur", "q_dedup_embedding", "q_dedup_minhash",
      "q_inverted_index",
      "q_repetition", "q_tfidf")
    val flagged = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val fs = graft.plans.ScaleGuard
        .auditBroadcastGenerate(SparkEntry.queries(name)(spark, sf))
      if (fs.isEmpty) None else Some(name)
    }.toSet
    val fresh = flagged -- accepted
    assert(fresh.isEmpty,
      s"new broadcast-of-explode build sides (restructure or hint): $fresh")
    val stale = accepted -- flagged
    assert(stale.isEmpty,
      s"accepted list is stale — these no longer trip, remove them: $stale")
  }
}
