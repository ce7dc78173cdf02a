package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins flat-to-linear shuffle growth across a 10× data jump for the
  * heaviest-shuffle queries (VERDICT r7 ask #2): wall-clock at one SF
  * cannot see a superlinear shuffle — a fixed-bucket-count
  * parameterization or an accidental broadcast flip shows up as
  * shuffle bytes growing ~100× across a 10× scale-up, long before a
  * driver box ever feels it. Measured between the two driver-provided
  * SFs (0.01 → 0.1); the one-off sf1 checkpoint in PERF.md extends
  * the same ratios another decade up.
  *
  * Ceiling 14×: 10× linear + headroom for compression-ratio drift and
  * AQE partition-count effects. Queries whose shuffle is
  * partition-bounded rather than row-bounded (pure aggregates) stay
  * far below it; that is the point of an UPPER bound.
  */
class ScaleGrowthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  /** Shuffle write bytes of one execution via the noop sink (same
    * measurement as Bench and ShuffleBoundSpec).
    */
  private def shuffleWrite(q: String, sf: String): Long = {
    // drop cached lineage first: suites sharing this session persist
    // subtrees (q_simjoin's sh, q_triangles' edges) whose CacheManager
    // plan-match would zero THIS measurement's small-SF shuffle and
    // inflate the growth ratio — the same hygiene Bench applies
    // between queries
    try spark.catalog.clearCache() catch { case _: Throwable => () }
    val l = new Bench.TaskTotals
    spark.sparkContext.addSparkListener(l)
    try SparkEntry.queries(q)(spark, sf).write.mode("overwrite").format("noop").save()
    finally {
      org.apache.spark.sql.graftbridge.Bridge.drainListeners(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
    }
    l.shuffleWrite.get
  }

  // the top-shuffle inventory from the r7 bench detail, minus the
  // iteration-cached graph queries (their cache makes per-call bytes
  // run-order-dependent) and minus the two candidate-pair pipelines
  // (separate invariant below) — these are the queries where a
  // superlinear regression would cost the most at 100 TB
  // q_dedup_embedding earns its slot here by the adaptive banding:
  // with a FIXED planes value its shuffle grew 65× across this jump
  // (the round-8 sf1 checkpoint's headline catch); adaptiveHalf holds
  // mean bucket size flat so in-bucket pair volume tracks rows
  // the round-9 span wave joins the pinned set: q_span_dedup /
  // q_span_dup_frac shuffle one (hash, id) pair per span occurrence —
  // token-linear by construction — and q_decontam_overlap shuffles
  // only the per-doc aggregation (bench grams are broadcast); all
  // three must stay that way. q_span_trim (r9's late arrival) pins
  // too: its shuffle is (id, pos, hash) span rows + per-doc int
  // coverage arrays — token-linear, and the one query whose text-width
  // spread could silently start riding a hash exchange
  private val heavy = Seq(
    "q_map", "q_map_error_mapper", "q_first_last", "q_resample",
    "q_sessionize", "q_percentile", "q_boilerplate", "q_tpch_q2",
    "q_dedup_embedding",
    "q_span_dedup", "q_span_dup_frac", "q_decontam_overlap",
    "q_span_trim",
    // round-10 arrivals, pinned the round they land: q_span_max_run
    // moves the same (id, pos, hash) rows as span_trim; the leakage
    // matrix shuffles distinct (source, gram-hash) rows — both
    // token-linear by construction
    "q_span_max_run", "q_source_leakage",
    // q_bm25's only corpus-sized exchanges are the (id, term-hash) tf
    // aggregation and the (query, doc) partial-agg score shuffle —
    // token-linear; everything query-derived is broadcast and the
    // ranking is partial-TopK'd before its one exchange. A broadcast
    // flip (query side growing) or a global sort sneaking in would
    // show here first
    "q_bm25",
    // q_bigram_lm shuffles the training bigram-count aggregation and
    // the merge-joined scoring probe — both one row per token
    // position, token-linear; the unigram sides must STAY broadcasts
    "q_bigram_lm",
    // wave-10 arrivals: q_importance shuffles the (token-hash →
    // ct, cr) aggregation and the per-doc scoring agg — token-linear;
    // the log-ratio table must STAY a broadcast. q_rrf_fusion's only
    // corpus-sized exchanges are BM25's tf/score shuffles and the
    // dense partial-top-k — query-side tables are broadcast by
    // construction, so a flip (or a global sort sneaking past
    // TopKPerKey) shows here first
    "q_importance", "q_rrf_fusion",
    // q_drift shuffles one (source, token-hash) count row per token —
    // token-linear, (#sources)²-bounded pair fan-out; q_phrase_search
    // moves (id, pos, hash) trigram rows — token-linear; q_cusum's
    // range exchange moves one (type, ts, id, cents) row per event —
    // event-linear, offsets driver-bounded
    "q_drift", "q_phrase_search", "q_cusum",
    // q_novelty shuffles one (id, shingle-hash) row per distinct
    // shingle occurrence plus the min-aggregate — token-linear, and
    // the merge-join-back must never flip to a broadcast build
    "q_novelty",
    // wave-11 arrivals: q_semdedup shuffles assigned (id, cluster,
    // unit-vector) rows into the per-cluster merge join — row-linear
    // (pair volume is compute inside tasks, not exchange; the
    // centroid table must STAY a bounded broadcast); q_acf and
    // q_weighted_median move one row per event/lineitem through the
    // PrefixScan range exchange plus driver-bounded offsets;
    // q_vocab_coverage's exchanges are the token-count aggregation
    // (vocabulary-sized, corpus-sublinear) and the vocab-row scan
    "q_semdedup", "q_acf", "q_weighted_median", "q_vocab_coverage",
    // wave-12 arrivals: q_scd2 / q_interval_merge move one compact
    // (user, ts_us, …) long row per event through user-partitioned
    // window exchanges — event-linear, no text, no hash keys;
    // q_rare_tokens shuffles the (token → count) aggregation plus the
    // semi-join probe — token-linear, and the hapax side must NEVER
    // flip to a broadcast build (it is vocabulary-sized);
    // q_sample_group_k moves ≤ k rows per group past the partial
    // TopK — its shuffle must stay ~FLAT, far under the ceiling
    "q_scd2", "q_interval_merge", "q_rare_tokens", "q_sample_group_k",
    // wave-13 arrivals — the sketch family's entire point is a
    // BOUNDED shuffle: q_source_minhash_overlap's signature aggregate
    // is map-side combinable to partitions × sources × 16 rows (no
    // shingle distinct — min over the multiset equals min over the
    // set), q_quantile_sketch's histogram is sources × ≤70 decimal
    // buckets, q_kll_quantiles moves ~3 KB sketch bytes per partial.
    // All three must stay far under the ceiling — growth here means a
    // corpus-sized exchange snuck in
    "q_source_minhash_overlap", "q_quantile_sketch", "q_kll_quantiles",
    // wave-15 arrivals: q_cond_entropy shuffles the (source, t1, t2)
    // bigram-count aggregation plus the merge-joined c1 probe — one
    // row per token position into map-side combine, token-linear; the
    // c1 side must STAY a merge join (it is vocabulary-scale — the
    // auto-broadcast ScaleGuardSweep caught on arrival). q_gini_tokens
    // moves (source, token) count rows plus PrefixScan's vocab-sized
    // range exchange — vocabulary-scale, corpus-sublinear; growth
    // here means token rows started riding an exchange un-combined
    "q_cond_entropy", "q_gini_tokens",
    // round-15 arrivals: q_approx_distinct's portable HLL shuffles
    // ≤ (event-types × 1024) register rows by construction — it must
    // stay ~FLAT across any SF jump (growth means the register
    // aggregation stopped map-side-combining); q_curate_e2e gained
    // the LM stage — its exchanges are the kept-docs token/vocab/NLL
    // aggregations plus the span rows, all token-linear, and the
    // probs table must STAY a broadcast (vocabulary-bounded). The two
    // new INDEXED serves are deliberately absent here: their iter-1
    // index builds make per-call bytes run-order-dependent (the
    // graph-query exclusion), and their warm-serve shuffle is ~zero
    "q_approx_distinct", "q_curate_e2e")

  test("top-shuffle queries grow ≤ ~linear in shuffle bytes across a 10× SF jump") {
    val failures = heavy.flatMap { q =>
      val b01 = shuffleWrite(q, small)
      val b10 = shuffleWrite(q, big)
      val ratio = b10.toDouble / math.max(b01, 1L)
      if (ratio > 14.0)
        Some(f"$q: ${b01 / 1048576.0}%.2f MB -> ${b10 / 1048576.0}%.2f MB " +
          f"(${ratio}%.1fx > 14x) — superlinear shuffle growth")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** Intermediate candidate volume of the shared-shingle blocking the
    * two near-dup pipelines use: Σ_h C(df_h, 2) over shingles in the
    * [minDf, maxDf] band — the number of raw pairs the posting-list
    * self-join materializes before the minShared filter.
    */
  private def candidateVolume(sf: String): Long = {
    import org.apache.spark.sql.functions._
    graft.functions.Dedup
      .shingleHashes(Tables.documents(spark, sf), "doc_id", "text", 3)
      .dropDuplicates("id", "h")
      .groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 20))
      .agg(sum(col("n") * (col("n") - 1) / 2)).head.getDouble(0).toLong
  }

  test("candidate-pair pipelines shuffle ∝ candidate volume, not worse") {
    // q_ngram_jaccard / q_dedup_clusters shuffle is CANDIDATE-pair
    // proportional by design (VERDICT r7's plan audit) — on this
    // corpus candidates grow superlinearly in rows (shingles that were
    // df=1 singletons at sf0.01 enter the [2,20] df band at sf0.1), so
    // the honest invariant is bytes-per-candidate staying flat: if
    // shuffle outgrows the candidate volume, an exchange started
    // carrying payload (or the maxDf guard stopped binding). At
    // extreme scale the documented swap is minhash blocking — same
    // downstream, bucket-capped candidates.
    val c01 = candidateVolume(small)
    val c10 = candidateVolume(big)
    val candGrowth = c10.toDouble / math.max(c01, 1L)
    assert(candGrowth > 1.0, s"degenerate corpus: candidates $c01 -> $c10")
    // q_simjoin and q_triangles join the candidate-proportional set:
    // simjoin's prefix postings and triangles' wedge volume both ride
    // the same shingle-df corpus property the banded candidate volume
    // measures (prefix candidates ⊆ all intersecting pairs; triangle
    // edges ARE the banded blocking's output)
    // q_clustering_coef rides the identical edge list + wedge volume
    // as q_triangles (same blocking, same orientation); q_coreness
    // peels the same edge set — its shuffle is (peel-depth ×
    // shrinking-edges), edge-volume-shaped with a slowly-growing
    // depth factor, so it shares this invariant rather than the flat
    // ≤14× bound
    val failures = Seq("q_ngram_jaccard", "q_dedup_clusters", "q_containment",
      "q_simjoin", "q_triangles", "q_clustering_coef", "q_coreness").flatMap { q =>
      val b01 = shuffleWrite(q, small)
      val b10 = shuffleWrite(q, big)
      val ratio = b10.toDouble / math.max(b01, 1L)
      // 2× slack: the fixed input-linear parts (shingle explode,
      // window df count) ride the same measurement
      if (ratio > candGrowth * 2.0)
        Some(f"$q: shuffle grew ${ratio}%.1fx vs candidate volume " +
          f"${candGrowth}%.1fx ($c01 -> $c10 candidates) — " +
          "bytes-per-candidate regressed")
      else None
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
