package graft.queries

import graft.Tables
import graft.functions.{Bpe, Dedup, EngineNeutral, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eleventh query wave — corpus profiling, semantic dedup, privacy
  * risk, and tokenizer training (SURVEY.md §2 rows 125-131). Algorithm
  * families are public literature: semantic deduplication via
  * cluster-then-pairwise-cosine (the SemDeDup recipe, Abbas et al.
  * 2023), k-anonymity over quasi-identifiers (Sweeney 2002),
  * lag-k autocorrelation with exact sufficient statistics, vocabulary
  * coverage curves (the Heaps'/Zipf budgeting number behind
  * vocab-size choices), byte-pair-encoding merge learning
  * (Sennrich et al. 2016 — [[graft.functions.Bpe]]), exact weighted
  * medians on the keyed prefix scan, and local clustering
  * coefficients (Watts–Strogatz) on the near-dup graph.
  */
object ProfilingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** SemDeDup similarity threshold. The synthetic embeddings have no
    * true near-dups (max pairwise cosine ≈ 0.5 — see
    * q_dedup_embedding's note), so 0.3 demonstrates the operator on
    * the most-similar tail; production callers pass ~0.9.
    */
  private val SemDedupTau = 0.3

  val queries: Map[String, Q] = Map(
    // 125. Semantic dedup (the SemDeDup shape): cluster the embedding
    //      space, then drop all but one of any within-cluster pair
    //      whose cosine clears τ — catches paraphrases exact/minhash
    //      dedup structurally cannot. Clustering here assigns each
    //      vector to its nearest label-centroid (r4-rounded dim-wise
    //      means — a bounded labels × dims table, hint-broadcast
    //      everywhere; a 100 TB deployment trains k ~ √n sampled
    //      k-means centroids, same bounded-broadcast shape). The
    //      pairwise stage joins on the cluster id — within-cluster
    //      quadratic is the published algorithm's cost model, bounded
    //      by (n/k)² per cluster, and unit vectors are normalized
    //      ONCE so each pair costs a single dot. Keep rule: the
    //      smaller vec_id of a qualifying pair survives (drop id_b).
    //      All doubles are r4-rounded sequential-dot results on
    //      identical operands in both engines.
    "q_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(EngineNeutral.r4(avg(col("v").cast("double"))).as("cv"))
        .groupBy("label")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          x => x("cv")).as("cvec"))
        .select(col("label"), graft.plans.ArrayUnit.array_unit(col("cvec")).as("uc"))
      val units = emb
        .select(col("vec_id"), graft.plans.ArrayUnit.array_unit(col("embedding")).as("u"))
        .filter(col("u").isNotNull) // zero-norm vectors have no direction
      val scored = units.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("u"), col("label"),
          EngineNeutral.r4(Similarity.dot(col("u"), col("uc"))).as("sim"))
      // persisted: assignment feeds the pair join's a side, b side,
      // and the final verdict join — without it each consumer replays
      // the normalize → cross join → TopK chain (no cross-consumer
      // exchange reuse). Vector-count-sized, MEMORY_ONLY per the
      // family convention; Bench/Verify clear cached lineage between
      // queries.
      val assigned = graft.plans.CacheHandles.track("query.semdedup.assigned",
        graft.plans.TopKPerKey.topK(scored, Seq("vec_id"),
            Seq("sim" -> true, "label" -> false), k = 1)
          .select(col("vec_id"), col("u"), col("label").as("cluster"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      val a = assigned.select(col("cluster"), col("vec_id").as("id_a"), col("u").as("ua"))
      val b = assigned.select(col("cluster"), col("vec_id").as("id_b"), col("u").as("ub"))
      val dropped = a.hint("merge").join(b, "cluster")
        .filter(col("id_a") < col("id_b"))
        .filter(EngineNeutral.r4(Similarity.dot(col("ua"), col("ub"))) >= SemDedupTau)
        .select(col("id_b").as("vec_id")).distinct()
        .withColumn("is_dropped", lit(true))
      assigned.select("vec_id", "cluster")
        .join(dropped.hint("merge"), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster"),
          coalesce(col("is_dropped"), lit(false)).as("dropped"))
        .orderBy("vec_id")
    }),

    // 126. k-anonymity risk scan over quasi-identifiers (lang, source,
    //      100-char length bucket): group sizes plus the k < 5 re-
    //      identification flag — the privacy-governance companion to
    //      PII redaction (a document whose quasi-identifier combination
    //      is near-unique is re-identifiable even with PII scrubbed).
    //      One map-side-combinable groupBy; output is bounded by the
    //      quasi-identifier cross product, corpus-size-independent.
    "q_k_anonymity" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), col("source"),
          (floor(col("n_chars") / 100) * 100).cast("long").as("chars_bucket"))
        .groupBy("lang", "source", "chars_bucket")
        .agg(count(lit(1)).as("group_size"))
        .withColumn("at_risk", col("group_size") < 5)
        .orderBy("lang", "source", "chars_bucket")),

    // 127. Lag-k autocorrelation per event type (lags 1 and 2): the
    //      seasonality/momentum diagnostic behind drift monitors.
    //      Exactness via integer sufficient statistics: values
    //      quantize to cents (q_cusum's convention), so Σx, Σx², Σab,
    //      and the lagged-slice sums are exact longs in any partition
    //      grouping, and the ACF closed form
    //        (Σab − μ(Σa+Σb) + mμ²) / (Σx² − nμ²),  μ = S/n
    //      is a fixed double expression on identical operands in both
    //      engines — bit-identical, unrounded. The lag pairing is a
    //      merge self-join on [[graft.operators.PrefixScan]] ranks
    //      (range shuffle + driver offsets), NEVER a whole-sequence-
    //      in-one-task window.
    "q_acf" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      val stats = e.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("c").as("sx"), sum(col("c") * col("c")).as("sxx"))
      val (scanned, _) = graft.operators.PrefixScan.runningPerKey(
        e, Seq(col("event_type")), Seq(col("ts"), col("event_id")),
        col("c"), "p", "k")
      // NOT persisted (round-18 measurement): caching the ranked rows
      // for the 4 lag-join references re-ran 2.5× SLOWER (bench iters
      // [20.5, 7.8, 5.3] vs [6.9, 2.7, 2.0]) — PrefixScan's range
      // exchange is already reused across the references, and the
      // extra materialization pass only serializes the plan.
      val rows = scanned.select("event_type", "k", "c")
      // round 19: ONE pass instead of per-lag merge self-joins. The
      // old shape evaluated the ranked subtree FOUR times (a/b sides ×
      // 2 lags — StageProfile: four concurrent scan+rank stages plus
      // four single-task range stages) and paid two keyed join
      // exchanges. Each row now contributes to the three group cells
      // (k, k−1, k−2) it participates in, one groupBy reunites
      // (c_k, c_{k+1}, c_{k+2}) per cell — k is the per-type
      // PrefixScan rank, unique by construction, so max(when) IS the
      // single value — and the per-lag sums are the join's sums
      // verbatim: b0·sL is null (sum-skipped) exactly when the inner
      // join had no (k, k+L) pair, the guarded sa/sb/m count the same
      // surviving rows, and m>0 filters the (event_type, lag) groups
      // the join form never emitted. Bounded group size (≤3) — never a
      // per-type window. The keyed repartition keeps the r18 width pin
      // (AQE would coalesce the bytes-small cell exchange to 1 task).
      val par = s.sparkContext.defaultParallelism
      val cells = rows.select(col("event_type"), col("c"), explode(array(
          struct(col("k").as("kk"), lit(0).as("tag")),
          struct((col("k") - 1).as("kk"), lit(1).as("tag")),
          struct((col("k") - 2).as("kk"), lit(2).as("tag")))).as("e"))
        .select(col("event_type"), col("e.kk").as("kk"), col("e.tag").as("tag"),
          col("c"))
        .repartition(par, col("event_type"), col("kk"))
        .groupBy("event_type", "kk")
        .agg(max(when(col("tag") === 0, col("c"))).as("b0"),
          max(when(col("tag") === 1, col("c"))).as("s1"),
          max(when(col("tag") === 2, col("c"))).as("s2"))
      val agg8 = cells.groupBy("event_type").agg(
        sum(col("b0") * col("s1")).as("sab1"),
        sum(when(col("s1").isNotNull, col("b0"))).as("sa1"),
        sum(when(col("b0").isNotNull, col("s1"))).as("sb1"),
        count(when(col("b0").isNotNull && col("s1").isNotNull, lit(1))).as("m1"),
        sum(col("b0") * col("s2")).as("sab2"),
        sum(when(col("s2").isNotNull, col("b0"))).as("sa2"),
        sum(when(col("b0").isNotNull, col("s2"))).as("sb2"),
        count(when(col("b0").isNotNull && col("s2").isNotNull, lit(1))).as("m2"))
      val perLag = agg8.select(col("event_type"), explode(array(
          struct(lit(1).as("lag"), col("sab1").as("sab"), col("sa1").as("sa"),
            col("sb1").as("sb"), col("m1").as("m")),
          struct(lit(2).as("lag"), col("sab2").as("sab"), col("sa2").as("sa"),
            col("sb2").as("sb"), col("m2").as("m")))).as("e"))
        .select(col("event_type"), col("e.lag").as("lag"), col("e.sab").as("sab"),
          col("e.sa").as("sa"), col("e.sb").as("sb"), col("e.m").as("m"))
        .filter(col("m") > 0)
      val mu = col("sx").cast("double") / col("n")
      perLag.join(broadcast(stats), "event_type")
        .select(col("event_type"), col("lag"),
          ((col("sab") - mu * (col("sa") + col("sb")) + col("m") * mu * mu) /
            (col("sxx") - col("n") * mu * mu)).as("acf"))
        .orderBy("event_type", "lag")
    }),

    // 128. Vocabulary coverage curve: the smallest rare-last vocabulary
    //      prefix covering 50/90/99% of corpus token mass — the
    //      budgeting number behind vocab-size and min-frequency
    //      choices. Token counts are a map-side-combinable groupBy
    //      (vocabulary-sized, corpus-sublinear); the cumulative mass
    //      over the (count desc, token) order is the distributed
    //      keyed prefix scan, never a single-task global window; the
    //      crossing test is exact integer arithmetic (cum·100 vs
    //      total·pct) and coverage divides the same two longs in both
    //      engines.
    "q_vocab_coverage" -> ((s, d) => {
      val counts = Tables.spread(Tables.documents(s, d))
        .select(explode(Dedup.tokens(col("text"))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c"))
      val (scanned, _) = graft.operators.PrefixScan.runningPerKey(
        counts, Seq(lit(1)), Seq(col("c").desc, col("t")), col("c"), "cum", "k")
      // total token mass = the scan's last cumulative value — computed
      // from the PrefixScan-persisted subtree instead of re-running
      // the tokenize→count aggregation
      val tot = scanned.agg(max("cum").as("total"))
      import s.implicits._
      val pcts = Seq(50, 90, 99).toDF("pct")
      scanned.crossJoin(broadcast(tot)).crossJoin(broadcast(pcts))
        .filter(col("cum") * 100 >= col("total") * col("pct") &&
          (col("cum") - col("c")) * 100 < col("total") * col("pct"))
        .select(col("pct"), col("k").as("vocab_size"),
          col("cum").as("covered_tokens"),
          (col("cum").cast("double") / col("total")).as("coverage"))
        .orderBy("pct")
    }),

    // 130. Exact weighted median per group (median order value
    //      weighted by quantity — the robust-center statistic where
    //      rows carry unequal mass): smallest price whose cumulative
    //      quantity reaches half the group total. Weights quantize to
    //      integer centi-units so cumulative mass is an exact long in
    //      any partition grouping; the crossing test is exact integer
    //      arithmetic (2·cum ≥ total); the scan is the distributed
    //      keyed prefix scan over the bounded returnflag dimension,
    //      ordered by (price, orderkey, linenumber) — a total order,
    //      never a whole-group single-task window.
    "q_weighted_median" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("wq"))
      val tot = li.groupBy("l_returnflag").agg(sum("wq").as("total"))
      val (scanned, _) = graft.operators.PrefixScan.runningPerKey(
        li, Seq(col("l_returnflag")),
        Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
        col("wq"), "cum", "k")
      scanned.join(broadcast(tot), "l_returnflag")
        .filter(col("cum") * 2 >= col("total") &&
          (col("cum") - col("wq")) * 2 < col("total"))
        .select(col("l_returnflag"), col("l_extendedprice").as("w_median"),
          col("total").as("total_w100"))
        .orderBy("l_returnflag")
    }),

    // 131. Local clustering coefficient on the near-dup graph:
    //      2·tri(v) / (deg(v)·(deg(v)−1)) — separates true duplicate
    //      CLIQUES (coef → 1) from hub-and-spoke boilerplate stars
    //      (coef → 0), the per-node refinement of q_triangles' count.
    //      Same degree-oriented triangle machinery (wedges at the
    //      lowest-ordered apex, closed by a merge-hinted semi-join,
    //      O(√m) oriented out-degree); the ratio divides exact longs —
    //      bit-identical, unrounded. Edge/oriented lists persisted
    //      (edge-sized) per the family convention.
    "q_clustering_coef" -> ((s, d) => {
      val edges = graft.plans.CacheHandles.track("query.clustering.edges",
        Dedup.sharedShingleEdges(Tables.documents(s, d),
            "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
          .select("id_a", "id_b")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
        .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      val dir = sym
        .join(deg.select(col("u"), col("deg").as("deg_u")).hint("merge"), "u")
        .join(deg.select(col("u").as("v"), col("deg").as("deg_v")).hint("merge"), "v")
        .filter(col("deg_u") < col("deg_v") ||
          (col("deg_u") === col("deg_v") && col("u") < col("v")))
        .select("u", "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      graft.plans.CacheHandles.track("query.clustering.oriented", dir)
      val wedges = dir.select(col("u"), col("v").as("v1"))
        .join(dir.select(col("u"), col("v").as("v2")), "u")
        .filter(col("v1") =!= col("v2"))
      val tris = wedges.join(
        dir.select(col("u").as("v1"), col("v").as("v2")).hint("merge"),
        Seq("v1", "v2"), "left_semi")
      val triPerNode = tris
        .select(explode(array(col("u"), col("v1"), col("v2"))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("n_tri"))
      deg.join(triPerNode.hint("merge"), Seq("u"), "left")
        .select(col("u").as("doc_id"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          when(col("deg") >= 2,
            lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
              (col("deg") * (col("deg") - 1)))
            .otherwise(lit(0.0)).as("coef"))
        .orderBy("doc_id")
    }),

    // 132. Hard-negative mining for contrastive training: per query
    //      vector, the top-3 most similar vectors with a DIFFERENT
    //      label — the negatives that actually move an embedding
    //      model (near-duplicates of the anchor that must be pushed
    //      apart). Same plan scaffold as q_ann_bruteforce: bounded
    //      query set broadcast with its labels, per-partition partial
    //      top-k through the native bounded-heap TopKPerKey (≤k rows
    //      per query per partition shuffle), rank window touches ≤k
    //      rows per key. The label-mismatch predicate rides the
    //      broadcast join condition, so same-label pairs are never
    //      scored.
    "q_hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      def unit(c: org.apache.spark.sql.Column) =
        graft.plans.ArrayUnit.array_unit(c)
      val queries = broadcast(emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), unit(col("embedding")).as("qvec"),
          col("label").as("q_label"))
        .filter(col("qvec").isNotNull))
      val corpus = emb
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("neighbor_id"), unit(col("embedding")).as("cvec"),
          col("label").as("neighbor_label"))
        .filter(col("cvec").isNotNull)
      val scored = corpus.join(queries, col("q_label") =!= col("neighbor_label"))
        .select(col("query_id"), col("neighbor_id"), col("neighbor_label"),
          EngineNeutral.r4(Similarity.dot(col("qvec"), col("cvec"))).as("sim"))
      val top = graft.plans.TopKPerKey.topK(scored, Seq("query_id"),
        Seq("sim" -> true, "neighbor_id" -> false), k = 3)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("neighbor_label"), col("sim"))
        .orderBy("query_id", "rank")
    }),

    // 133. Full k-core decomposition of the near-dup graph (rows-only:
    //      the shrink-until-stable fixpoint has no SQL form — standard
    //      recursive CTEs only append; KCoreSpec pins exact equality
    //      with a sequential min-degree-peel reference, and the
    //      rows-only invariant recomputes THIS query's output against
    //      that reference on the gate corpus). Coreness separates
    //      duplicate COMMUNITIES (high core) from template-glued
    //      stars (1-core) — the density governance number behind
    //      cluster-level dedup decisions. Scale: see
    //      [[graft.operators.KCore]] (lineage-truncated peeling,
    //      shuffle bounded by the shrinking edge set).
    "q_coreness" -> ((s, d) => {
      val edges = Dedup.sharedShingleEdges(Tables.documents(s, d),
          "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
        .select("id_a", "id_b")
      graft.operators.KCore.coreness(edges)
        .select(col("id").as("doc_id"), col("coreness"))
        .orderBy("doc_id")
    }),

    // 134. Mergeable per-source distinct-token sketches. HASH-gated
    //      since round 17: rebuilt on the PORTABLE fixed-seed HLL
    //      (functions.PortableHll — the q_approx_distinct register
    //      construction), whose register TABLE is itself the
    //      mergeable sketch: the ALL row unions per-source registers
    //      by groupBy(bucket).max(mr) — associative/idempotent, so
    //      the mergeability law holds BY CONSTRUCTION and the DuckDB
    //      oracle reproduces every register and estimate exactly.
    //      This is the 100 TB distinct-counting workflow: register
    //      tables per source/day persist at ingest (map-side-
    //      combinable, ≤1024 rows per group), merge on demand — never
    //      re-scan the corpus for a new grouping of an old question.
    "q_hll_union" -> ((s, d) => {
      val toks = Tables.spread(Tables.documents(s, d))
        .select(col("source"), explode(Dedup.tokens(col("text"))).as("t"))
      // round-19: the register table is consumed TWICE (the ALL-row
      // union and the estimate's unionByName) and each reference was
      // replaying the full tokenize+md5 corpus scan, while the table
      // itself is ≤ sources×1024 rows — the favorable persist case
      // (tiny cache, corpus-heavy subtree), unlike the row-heavy r18
      // persists item 4 warned about. Eager per the AQE fan-out rule.
      val per = graft.plans.CacheHandles.track("query.hll_union.regs",
        graft.functions.PortableHll.registers(
          toks, Seq(col("source")), col("t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      per.count()
      val union = per.groupBy("bucket")
        .agg(max("mr").as("mr"), sum("cnt").as("cnt"))
        .withColumn("source", lit("ALL"))
      val est = graft.functions.PortableHll.estimate(
        per.unionByName(union.select("source", "bucket", "mr", "cnt")),
        Seq(col("source")))
      est.select("source", "est_distinct").orderBy("source")
    }),

    // 129. BPE merge learning (rows-only: the iterative data-dependent
    //      rewrite has no portable SQL form — BpeSpec hand-computes
    //      the merges on a known corpus and RowsOnlyInvariantsSpec
    //      recomputes the first merge independently). Corpus-sized
    //      work is the distributed word-frequency groupBy; the merge
    //      loop runs on the capped dictionary — see
    //      [[graft.functions.Bpe]] for the scale argument.
    "q_bpe_merges" -> ((s, d) =>
      Bpe.learnMerges(Tables.documents(s, d), "text", nMerges = 20)
        .orderBy("rank"))
  )

  val oracles: Map[String, String] = Map(
    // the q_approx_distinct portable-HLL oracle, with the ALL row
    // computed by register-max union — the mergeability law the old
    // rows-only spec asserted is now part of what the gate PROVES
    "q_hll_union" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS t
        |  FROM documents
        |), hh AS (
        |  SELECT source, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM toks
        |), r AS (
        |  SELECT source, h % 1024 AS bucket,
        |    CASE WHEN h // 1024 = 0 THEN 51
        |         ELSE 51 - length(bin(h // 1024)) END AS rho
        |  FROM hh
        |), regs AS (
        |  SELECT source, bucket, max(rho) AS mr FROM r GROUP BY 1, 2
        |), u AS (
        |  SELECT * FROM regs
        |  UNION ALL
        |  SELECT 'ALL' AS source, bucket, max(mr) AS mr FROM regs GROUP BY bucket
        |), agg AS (
        |  SELECT source,
        |    sum(CAST(1 AS BIGINT) << CAST(51 - mr AS INT)) AS sp,
        |    count(*) AS nb
        |  FROM u GROUP BY 1
        |), est AS (
        |  SELECT source, 1024 - nb AS v,
        |    (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0::DOUBLE)
        |      * 1048576.0::DOUBLE * 2251799813685248.0::DOUBLE)
        |      / CAST(sp + (1024 - nb) * (CAST(1 AS BIGINT) << 51) AS DOUBLE) AS e
        |  FROM agg
        |)
        |SELECT source,
        |  CAST(CASE WHEN e <= 2560.0::DOUBLE AND v > 0
        |    THEN floor(1024.0::DOUBLE * ln(1024.0::DOUBLE / CAST(v AS DOUBLE)) + 0.5::DOUBLE)
        |    ELSE floor(e + 0.5::DOUBLE) END AS BIGINT) AS est_distinct
        |FROM est ORDER BY source""".stripMargin,
    // unit vectors and centroid means mirror q_dedup_embedding /
    // q_embedding_centroid's proven parity: r4-rounded dim-wise avgs
    // are bit-identical once rounded, and every similarity is an
    // r4-rounded SEQUENTIAL dot product on identical operands
    "q_semdedup" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS e
         |  FROM embeddings
         |), u AS (
         |  SELECT vec_id, [x / nrm FOR x IN e] AS u
         |  FROM (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM e)
         |  WHERE nrm <> 0
         |), cd AS (
         |  SELECT label, dim, floor(avg(v) * 10000 + 0.5) / 10000.0 AS cv
         |  FROM (SELECT label, unnest(e) AS v, generate_subscripts(e, 1) AS dim
         |        FROM e)
         |  GROUP BY 1, 2
         |), c AS (
         |  SELECT label, list(cv ORDER BY dim) AS cvec FROM cd GROUP BY 1
         |), cu AS (
         |  SELECT label, [x / nrm FOR x IN cvec] AS uc
         |  FROM (SELECT label, cvec, sqrt(list_dot_product(cvec, cvec)) AS nrm
         |        FROM c)
         |  WHERE nrm <> 0
         |), scored AS (
         |  SELECT u.vec_id, cu.label,
         |    floor(list_dot_product(u.u, cu.uc) * 10000 + 0.5) / 10000.0 AS sim
         |  FROM u CROSS JOIN cu
         |), assign AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT vec_id, label AS cluster,
         |      row_number() OVER (PARTITION BY vec_id
         |                         ORDER BY sim DESC, label) AS rn
         |    FROM scored) WHERE rn = 1
         |), vv AS (
         |  SELECT a.vec_id, a.cluster, u.u
         |  FROM assign a JOIN u ON u.vec_id = a.vec_id
         |), dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM vv a JOIN vv b ON b.cluster = a.cluster AND a.vec_id < b.vec_id
         |  WHERE floor(list_dot_product(a.u, b.u) * 10000 + 0.5) / 10000.0
         |    >= $SemDedupTau
         |)
         |SELECT v.vec_id, v.cluster, (d.vec_id IS NOT NULL) AS dropped
         |FROM vv v LEFT JOIN dropped d ON d.vec_id = v.vec_id
         |ORDER BY v.vec_id""".stripMargin,
    // q_ann_bruteforce's proven direct-cosine ↔ normalized-dot parity
    // (r4 absorbs the operation-order difference), plus the label
    // filter and the neighbor label in the output
    "q_hard_negatives" ->
      """SELECT query_id, rank, neighbor_id, neighbor_label, sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    c.label AS neighbor_label,
        |    floor(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) * 10000 + 0.5) / 10000.0 AS sim,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      floor(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
        |        (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
        |         sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) * 10000 + 0.5) / 10000.0 DESC,
        |      c.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings c ON q.label <> c.label
        |  WHERE q.vec_id < 50)
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // centi-unit weights make cumulative mass exact; the crossing row
    // is unique under the (price, orderkey, linenumber) total order
    // and the reported median is a raw data value — no float math
    "q_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
        |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS wq
        |  FROM lineitem
        |), tot AS (
        |  SELECT l_returnflag, CAST(sum(wq) AS BIGINT) AS total
        |  FROM li GROUP BY 1
        |), scanned AS (
        |  SELECT l_returnflag, l_extendedprice, wq,
        |    sum(wq) OVER (PARTITION BY l_returnflag
        |                  ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM li
        |)
        |SELECT s.l_returnflag, s.l_extendedprice AS w_median,
        |  t.total AS total_w100
        |FROM scanned s JOIN tot t USING (l_returnflag)
        |WHERE s.cum * 2 >= t.total AND (s.cum - s.wq) * 2 < t.total
        |ORDER BY s.l_returnflag""".stripMargin,
    // same edge rule as q_triangles/q_dedup_clusters; the coefficient
    // divides 2.0·n_tri by deg·(deg−1) — identical exact operands in
    // both engines, bit-identical unrounded
    "q_clustering_coef" ->
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), kept AS (
        |  SELECT id, shingle FROM (
        |    SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh)
        |  WHERE df BETWEEN 2 AND 20
        |), edges AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |), sym AS (
        |  SELECT id_a AS u, id_b AS v FROM edges
        |  UNION ALL SELECT id_b, id_a FROM edges
        |), deg AS (
        |  SELECT u, count(*) AS deg FROM sym GROUP BY 1
        |), tri AS (
        |  SELECT a.id_a AS x, a.id_b AS y, b.id_b AS z
        |  FROM edges a JOIN edges b ON b.id_a = a.id_b
        |  JOIN edges c ON c.id_a = a.id_a AND c.id_b = b.id_b
        |), tpn AS (
        |  SELECT id AS u, count(*) AS n_tri
        |  FROM (SELECT unnest([x, y, z]) AS id FROM tri) GROUP BY 1
        |)
        |SELECT d.u AS doc_id, CAST(d.deg AS BIGINT) AS deg,
        |  CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN d.deg >= 2
        |       THEN 2.0 * coalesce(t.n_tri, 0) / (d.deg * (d.deg - 1))
        |       ELSE 0.0 END AS coef
        |FROM deg d LEFT JOIN tpn t USING (u)
        |ORDER BY doc_id""".stripMargin,
    "q_k_anonymity" ->
      """SELECT lang, source, (n_chars // 100) * 100 AS chars_bucket,
        |  count(*) AS group_size, count(*) < 5 AS at_risk
        |FROM documents GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    // cents quantization makes every sufficient statistic an exact
    // BIGINT; the closed form is the same fixed double expression on
    // identical operands in both engines — bit-identical, unrounded
    "q_acf" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events
        |), stats AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sx,
        |    CAST(sum(c * c) AS BIGINT) AS sxx
        |  FROM e GROUP BY 1
        |), r AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY ts, event_id) AS k
        |  FROM e
        |), lagged AS (
        |  SELECT a.event_type, l.lag,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS sab,
        |    CAST(sum(a.c) AS BIGINT) AS sa, CAST(sum(b.c) AS BIGINT) AS sb,
        |    count(*) AS m
        |  FROM r a
        |  CROSS JOIN (SELECT unnest([1, 2]) AS lag) l
        |  JOIN r b ON b.event_type = a.event_type AND b.k = a.k + l.lag
        |  GROUP BY 1, 2
        |)
        |SELECT g.event_type, g.lag,
        |  (g.sab - (s.sx::DOUBLE / s.n) * (g.sa + g.sb)
        |     + g.m * (s.sx::DOUBLE / s.n) * (s.sx::DOUBLE / s.n)) /
        |  (s.sxx - s.n * (s.sx::DOUBLE / s.n) * (s.sx::DOUBLE / s.n)) AS acf
        |FROM lagged g JOIN stats s USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,
    // the crossing test is exact integer arithmetic; ties in the
    // (count desc, token) order are total in both engines
    "q_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |    x -> length(x) > 0)) AS t
        |  FROM documents
        |), counts AS (
        |  SELECT t, count(*) AS c FROM toks GROUP BY 1
        |), ranked AS (
        |  SELECT c,
        |    row_number() OVER (ORDER BY c DESC, t) AS k,
        |    sum(c) OVER (ORDER BY c DESC, t
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM counts
        |), tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS total FROM counts
        |)
        |SELECT p.pct, CAST(r.k AS BIGINT) AS vocab_size,
        |  CAST(r.cum AS BIGINT) AS covered_tokens,
        |  r.cum::DOUBLE / tot.total AS coverage
        |FROM (SELECT unnest([50, 90, 99]) AS pct) p
        |CROSS JOIN tot
        |JOIN ranked r ON r.cum * 100 >= tot.total * p.pct
        |  AND (r.cum - r.c) * 100 < tot.total * p.pct
        |ORDER BY p.pct""".stripMargin
  )
}
