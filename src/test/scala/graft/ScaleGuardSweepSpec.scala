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
    // The accepted set is EMPTY as of round 16 — the debt ledger is
    // paid. Its history: candidate-pair / shingle pipelines whose
    // exploded sides tripped the audit at tiny SF used to be accepted
    // with a "the estimate grows past the threshold at scale"
    // argument. q_ngram_jaccard and the round-9 span queries left
    // first (merge hints inside Dedup.ngramJaccard/ngramContainment/
    // sharedShingleEdges); q_linkage left in round 15 the hard way —
    // its accepted broadcast was the exact pattern that killed the
    // query at the sf10 sweep (a column-pruned corpus scan's estimate
    // slipped under the threshold and the planner collected ~1 GiB to
    // the driver; EditDistanceJoin's payload joins are merge-hinted
    // now). Round 16 merge-hinted the last six at their sources
    // (q_cooccur/q_inverted_index unigram+postings joins,
    // Curation.repetitionStats/tfidfTopK, Dedup.minhashCandidates and
    // Similarity.embeddingNearDupsAxis payload joins), so ANY query
    // tripping this audit is now a regression to fix at the source,
    // never to re-accept.
    val accepted = Set.empty[String]
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
