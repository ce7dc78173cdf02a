package graft.queries

import graft.Tables
import graft.functions.{Dedup, Retrieval, Selection, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenth query wave — data-selection & retrieval-fusion operators
  * (SURVEY.md §2 rows 115-120): the pieces a pretraining-data pipeline
  * uses to DECIDE what to keep, not just to measure what it has.
  * All six carry full DuckDB hash oracles. Algorithm families are
  * public literature: reciprocal rank fusion (Cormack et al., SIGIR
  * 2009), hashed-n-gram importance reweighting (the DSIR family, Xie
  * et al. 2023), prefix-filtered all-pairs similarity join (Bayardo et
  * al. WWW 2007; Xiao et al. PPJoin), degree-oriented triangle
  * counting (Schank & Wagner 2005), and CCNet-style normalization
  * before exact dedup.
  */
object SelectionQueries {
  type Q = (SparkSession, String) => DataFrame

  // one simjoin-index build per sf dir per suite run (the
  // lexIndexCache convention)
  private val simjoinIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // one IVF index build over the fusion corpus per sf dir (row 118c)
  private val fusionIvfCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, Q] = Map(
    // 115. Normalization-then-exact-dedup (the CCNet recipe: lowercase,
    //      strip punctuation, collapse whitespace, THEN hash) — catches
    //      the trivial reformattings raw exact dedup misses.
    //      n_raw_variants counts how many distinct raw texts each
    //      normalized group collapsed — the operator's added value over
    //      q_dedup_exact, visible in the output. Shuffle carries the
    //      16-byte binary md5 of the normalized text, never the text.
    "q_dedup_norm" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          unhex(md5(norm.cast("binary"))).as("nh"),
          unhex(md5(col("text").cast("binary"))).as("rh"))
        .groupBy("nh")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"),
          countDistinct(col("rh")).as("n_raw_variants"))
        .select("keep_id", "n_copies", "n_raw_variants")
        .orderBy("keep_id")
    }),

    // 116. Tokenizer fertility per language: pieces-per-word and
    //      chars-per-piece — the budgeting stats a tokenizer change is
    //      judged by. Every ratio is one division of two exact integer
    //      sums (the avgdl convention), so the doubles are engine-
    //      bit-identical with no rounding needed. Pure map + one
    //      map-side-combined groupBy on a 4-value key.
    "q_tokenizer_stats" -> ((s, d) =>
      Tables.spread(Tables.documents(s, d))
        .select(col("lang"), length(col("text")).as("chars"),
          TextAnalysis.tokenCountWhitespace(col("text")).as("ws"),
          TextAnalysis.tokenCountRegex(col("text")).as("re"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("chars").as("n_chars"),
          sum("ws").as("n_ws_tokens"), sum("re").as("n_re_tokens"))
        .withColumn("fertility",
          col("n_re_tokens").cast("double") / col("n_ws_tokens"))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("n_re_tokens"))
        .orderBy("lang")),

    // 117. Hashed-unigram importance weights (the DSIR shape): score
    //      every raw-pool document by how target-like its token
    //      distribution is — avg over tokens of
    //      ln p̂_target(w) − ln p̂_raw(w), both Laplace-smoothed over
    //      the shared BUCKETED feature space (tokens hash into 2²⁰
    //      fixed buckets — Xie et al.'s hashing trick — so the model
    //      broadcast is bounded at any corpus size). Source 'src0'
    //      stands in for the target distribution (decontam's
    //      convention). The machinery is [[graft.functions.Selection]]
    //      — see its scaladoc for the scale shape and the
    //      persisted-model/streaming faces (writeImportanceModel /
    //      Streams.importanceIngest).
    "q_importance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (lr, defaults) = Selection.tokenLogRatios(docs, "text",
        col("source") === "src0")
      Selection.scoreAgainst(docs.filter(col("source") =!= "src0"),
          "doc_id", "text", lr, defaults)
        .orderBy("doc_id")
    }),

    // 118. Hybrid dense+sparse retrieval with reciprocal rank fusion:
    //      BM25 top-20 and embedding-cosine top-20 per query fuse as
    //      Σ 1/(60 + rank), top-10 fused results per query. Query side
    //      ('src0' docs) is structurally bounded → everything derived
    //      from it broadcasts; the doc↔vector attach is an equi-join
    //      on the id (bucketable at scale); final ranking is the
    //      native bounded TopKPerKey, never a global sort. The RRF
    //      doubles are sums of two exact-int divisions — engine-bit-
    //      identical, no rounding needed.
    "q_rrf_fusion" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val sparse = Retrieval.bm25TopK(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), "doc_id", "text", topK = 20)
        .select(col("query_id"), col("doc_id"), col("rank").as("r_lex"))
      val srcOf = docs.select(col("doc_id").as("vec_id"), col("source"))
      val embSrc = emb.join(srcOf, "vec_id")
      val dense = Similarity.bruteForceTopK(
          embSrc.filter(col("source") =!= "src0").drop("source"),
          embSrc.filter(col("source") === "src0").drop("source"), k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("r_dense"))
      val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(lit(1.0) / (col("r_lex") + lit(60.0)), lit(0.0)) +
            coalesce(lit(1.0) / (col("r_dense") + lit(60.0)), lit(0.0))).as("rrf"))
      val top = graft.plans.TopKPerKey.topK(fused, Seq("query_id"),
        Seq("rrf" -> true, "doc_id" -> false), k = 10)
      val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
        .orderBy("query_id", "rank")
    }),

    // 118b. The same fusion with the SPARSE leg served from the
    //       persisted lexical index (LlmQueries' shared build — ONE
    //       index, many serving faces): the corpus tokenization +
    //       tf/df aggregation never recur per fusion run; only the
    //       dense brute-force leg still scans (kept exact so the
    //       oracle stays the in-job fusion's own SQL — an IVF leg
    //       would trade exactness for recall, a different row).
    //       Gated against q_rrf_fusion's oracle.
    "q_rrf_fusion_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val sparse = Retrieval.bm25TopKIndexed(s, LlmQueries.lexIndexVdir(s, d),
          docs.filter(col("source") === "src0"), "doc_id", "text", topK = 20)
        .select(col("query_id"), col("doc_id"), col("rank").as("r_lex"))
      val srcOf = docs.select(col("doc_id").as("vec_id"), col("source"))
      val embSrc = emb.join(srcOf, "vec_id")
      val dense = Similarity.bruteForceTopK(
          embSrc.filter(col("source") =!= "src0").drop("source"),
          embSrc.filter(col("source") === "src0").drop("source"), k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("r_dense"))
      val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(lit(1.0) / (col("r_lex") + lit(60.0)), lit(0.0)) +
            coalesce(lit(1.0) / (col("r_dense") + lit(60.0)), lit(0.0))).as("rrf"))
      val top = graft.plans.TopKPerKey.topK(fused, Seq("query_id"),
        Seq("rrf" -> true, "doc_id" -> false), k = 10)
      val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
        .orderBy("query_id", "rank")
    }),

    // 118c. The PRODUCTION fusion: BOTH legs from persisted indexes —
    //       sparse from the lexical index (as 118b), dense from a
    //       persisted IVF index over the corpus embeddings
    //       (cell-partitioned writeIndex; a probe reads ~nprobe/k of
    //       the index files and the corpus is never brute-force
    //       scanned per query workload — the last corpus-scale
    //       per-run cost in the retrieval family retired).
    //       Rows-only BY NATURE (cell assignment is
    //       quantizer-defined, the dense leg trades exactness for
    //       recall): SelectionSpec pins a fused-top-10 recall floor
    //       vs the exact q_rrf_fusion on the gate corpus; the exact
    //       rows (118/118b) stay the oracled truth.
    "q_rrf_fusion_ann" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val sparse = Retrieval.bm25TopKIndexed(s, LlmQueries.lexIndexVdir(s, d),
          docs.filter(col("source") === "src0"), "doc_id", "text", topK = 20)
        .select(col("query_id"), col("doc_id"), col("rank").as("r_lex"))
      val srcOf = docs.select(col("doc_id").as("vec_id"), col("source"))
      val embSrc = emb.join(srcOf, "vec_id")
      val root = fusionIvfCache.computeIfAbsent(d, _ => {
        val r = java.nio.file.Files.createTempDirectory("graft_fivf_q").toString
        val corpus = embSrc.filter(col("source") =!= "src0").drop("source")
        val cents = graft.functions.Ivf.trainCentroids(
          corpus, "vec_id", "embedding", k = 16)
        graft.functions.Ivf.writeIndex(corpus, r, cents)
        r
      })
      // nprobe=10 of 16 cells: the sf embeddings are uniform-random —
      // ANN's worst case (no cluster structure to exploit; cf.
      // IvfSpec's clustered corpus hitting 0.95 recall at nprobe=4) —
      // so the gate corpus needs a deep probe to hold the floor. A
      // real embedding corpus is clustered and runs nprobe ≪ cells.
      val dense = graft.functions.Ivf.ivfTopKIndexed(s, root,
          embSrc.filter(col("source") === "src0").drop("source"),
          k = 20, nprobe = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("r_dense"))
      val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(lit(1.0) / (col("r_lex") + lit(60.0)), lit(0.0)) +
            coalesce(lit(1.0) / (col("r_dense") + lit(60.0)), lit(0.0))).as("rrf"))
      val top = graft.plans.TopKPerKey.topK(fused, Seq("query_id"),
        Seq("rrf" -> true, "doc_id" -> false), k = 10)
      val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf"))
        .orderBy("query_id", "rank")
    }),

    // 119. Per-node triangle counts on the near-dup edge graph — the
    //      density signal that separates a true duplicate CLIQUE from
    //      a chain of pairwise matches glued by boilerplate. Scale
    //      shape is the published degree-oriented count: orient every
    //      edge low→high by (degree, id) — the oriented graph is a
    //      DAG with out-degree O(√m) — generate wedges only at each
    //      triangle's lowest-ordered apex, and close them with a
    //      merge-hinted semi-join against the oriented edge list.
    //      Each triangle is counted exactly once, then credited to
    //      its three corners.
    "q_triangles" -> ((s, d) => {
      // persisted: the edge list feeds sym twice, deg once and (via
      // dir) three more consumers — without the persists the whole
      // corpus-scanning sharedShingleEdges subtree replays ~18× (no
      // cross-consumer exchange reuse). Both tables are edge-sized
      // (near-dup graphs are sparse), MEMORY_ONLY per the family
      // convention; Bench/Verify clear cached lineage between queries.
      val edges = graft.plans.CacheHandles.track("query.triangles.edges",
        Dedup.sharedShingleEdges(Tables.documents(s, d),
            "doc_id", "text", shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
          .select("id_a", "id_b")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      edges.count() // eager: consumers are concurrent AQE stages (round 18)
      val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
        .union(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg_u"))
      // merge-hinted: deg is aggregate-derived with explode ancestry —
      // never let size-only stats pick a broadcast build for it
      val dir = sym
        .join(deg.hint("merge"), "u")
        .join(deg.select(col("u").as("v"), col("deg_u").as("deg_v")).hint("merge"), "v")
        .filter(col("deg_u") < col("deg_v") ||
          (col("deg_u") === col("deg_v") && col("u") < col("v")))
        .select("u", "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      graft.plans.CacheHandles.track("query.triangles.oriented", dir)
      dir.count() // eager: wedges + closing semi-join fan out concurrently
      val wedges = dir.select(col("u"), col("v").as("v1"))
        .join(dir.select(col("u"), col("v").as("v2")), "u")
        .filter(col("v1") =!= col("v2"))
      val tris = wedges.join(
        dir.select(col("u").as("v1"), col("v").as("v2")).hint("merge"),
        Seq("v1", "v2"), "left_semi")
      tris.select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
        .orderBy("id")
    }),

    // 120. EXACT all-pairs similarity self-join (Jaccard ≥ 0.5 over
    //      3-shingles) via prefix filtering — unlike the df-banded
    //      blocking (q_ngram_jaccard) this is COMPLETE: every true
    //      pair is found, so the oracle is plain brute force. Shingles
    //      rank globally rare-first by (df, h); a doc of n shingles
    //      exposes only its first n − ⌈t·n⌉ + 1 as join keys (any pair
    //      with J ≥ t must share a prefix shingle under a common
    //      order — Xiao et al.'s prefix lemma; per-side prefixes here
    //      are supersets of the lemma's, so completeness holds), plus
    //      the length filter min ≥ ⌈t·max⌉. Per-key df is the
    //      map-side-combinable joinKeyStats shape; the per-doc ranking
    //      windows partition by DOC id (bounded groups), never by the
    //      shingle hash. Candidate volume is prefix-posting-bounded —
    //      rare-first ordering keeps postings small; output-quadratic
    //      corpora (everything near-identical) are output-bound for
    //      any exact algorithm.
    "q_simjoin" -> ((s, d) => {
      val t = 0.5
      val docs = Tables.documents(s, d)
      // persisted: sh feeds joinKeyStats' rows AND stats sides, and
      // prefix feeds both sides of the candidate self-join — without
      // the persists each consumer replays the tokenize→explode→
      // window lineage (ngramJaccard persists its own collect_set
      // aggregate for the same reason)
      val sh = graft.plans.CacheHandles.track("query.simjoin.shingles",
        Dedup.shingleHashes(docs, "doc_id", "text", shingleK = 3)
          .dropDuplicates("id", "h")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      sh.count() // eager: stats/rows/sets consumers are concurrent AQE stages
      val withDf = Dedup.joinKeyStats(sh, "h", Seq(count(lit(1)).as("kdf")))
      val wRank = Window.partitionBy("id").orderBy(col("kdf"), col("h"))
      val ranked = withDf
        .withColumn("p", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
      // round-19 (VERDICT #4): REMOVING this 2-consumer persist was
      // tried and measured 2.5× WORSE (paired QTime 6 iters: min_warm
      // 2.25 s with persist vs 5.52 s without, every iter worse) — the
      // window-chain replay on both self-join sides costs far more
      // than the materialization exchange, so the persist stays
      // despite the ≥3-consumer gating hypothesis.
      val prefix = ranked
        .filter(col("p") <= col("n") - ceil(lit(t) * col("n")) + lit(1))
        .select(col("h"), col("id"), col("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      graft.plans.CacheHandles.track("query.simjoin.prefix", prefix)
      prefix.count() // eager: both self-join sides are concurrent AQE stages
      val cand = prefix.select(col("h"), col("id").as("id_a"), col("n").as("n_a"))
        .hint("merge")
        .join(prefix.select(col("h"), col("id").as("id_b"), col("n").as("n_b")), "h")
        .filter(col("id_a") < col("id_b"))
        .filter(col("n_b") >= ceil(lit(t) * col("n_a")) &&
          col("n_a") >= ceil(lit(t) * col("n_b")))
        .select("id_a", "id_b").distinct()
      // exact verify from the ALREADY-PERSISTED shingle rows (not
      // Dedup.ngramJaccard, which would re-tokenize the corpus): same
      // hashed-set mechanics, merge-hinted for the same
      // never-broadcast-a-collect_set-of-explode reason
      // round 19: sorted sets + the SortedInterCount merge kernel —
      // array_intersect/array_union each built a per-pair hash set and
      // materialized a result array just for size() (68.5 CPU-s over
      // 310 k pairs at sf0.1, StageProfile stage 159); one
      // zero-allocation merge replaces both (|A∪B| = |A|+|B|−|A∩B| for
      // distinct sets — identical integers, bit-identical doubles)
      val sets = sh.groupBy("id").agg(sort_array(collect_set(col("h"))).as("s"))
      val inter = graft.plans.ArrayPairsCols.sortedInterCount(col("s_a"), col("s_b"))
      cand
        .join(sets.select(col("id").as("id_a"), col("s").as("s_a")).hint("merge"), "id_a")
        .join(sets.select(col("id").as("id_b"), col("s").as("s_b")).hint("merge"), "id_b")
        .select(col("id_a"), col("id_b"),
          (inter.cast("double") /
            (size(col("s_a")) + size(col("s_b")) - inter)).as("jaccard"))
        .filter(col("jaccard") >= t)
        .orderBy("id_a", "id_b")
    }),

    // 120b. The same exact similarity join through the PERSISTED
    //       prefix-filter index (the q_bm25_indexed convention):
    //       writeIndex commits the shingle table, the pinned global
    //       order, the prefix postings AND the verified pair set once
    //       per corpus version; serving is a pairs/ read — none of the
    //       in-job path's corpus-scale candidate self-join (the
    //       inventory's largest shuffle) recurs per run. Gated against
    //       the SAME brute-force oracle as q_simjoin.
    "q_simjoin_indexed" -> ((s, d) => {
      val root = simjoinIndexCache.computeIfAbsent(d, _ => {
        val r = java.nio.file.Files.createTempDirectory("graft_sjidx").toString
        graft.functions.SimJoinIndex.writeIndex(
          Tables.documents(s, d), "doc_id", "text", r, t = 0.5, shingleK = 3)
        r
      })
      val vdir = graft.operators.Versioned.resolve(s, root).get
      graft.functions.SimJoinIndex.readPairs(s, vdir)
        .orderBy("id_a", "id_b")
    }),

    // 121. Source-distribution drift: Jensen–Shannon divergence
    //      between every ordered source pair's unigram distributions —
    //      the governance number behind corpus-mixing decisions (two
    //      ingests drifting apart, a crawl snapshot diverging from its
    //      predecessor). Join-friendly closed form: only SHARED tokens
    //      need the (src_a, src_b, h) join —
    //      JSD = ½ln2·(2 − Σ∩pa − Σ∩pb)
    //            + Σ∩ ½[pa·ln(2pa/(pa+pb)) + pb·ln(2pb/(pa+pb))]
    //      (disjoint-support mass contributes exactly ½p·ln2). Per-
    //      gram fan-out is bounded by (#sources)² like
    //      q_source_leakage; per-source totals broadcast; pairs with
    //      NO shared token still emit (JSD = ln2) via a driver-built
    //      all-pairs frame — sources are a bounded DIMENSION, so the
    //      list collects like centroids/codebooks do, never a cross
    //      join the planner could nested-loop at corpus scale.
    //      r6 floor-rounding absorbs ln/sum drift.
    "q_drift" -> ((s, d) => {
      // round-18: k=1 shingle kernel — token hashes without per-token
      // string rows (TextHashSpec pins xxhash64 equality)
      val toks = Tables.spread(Tables.documents(s, d))
        .select(col("source"), explode(graft.plans.TextHashCols
          .shingleXx64(col("text"), 1, fallback = false)).as("h"))
      // round-19: counts is consumed THREE times (totals + both join
      // legs) and each reference replayed the tokenize+hash corpus
      // scan, while the table is vocabulary×sources-sized — tiny
      // cache, heavy subtree (the q_hll_union rationale). Eager per
      // the AQE fan-out rule.
      val counts = graft.plans.CacheHandles.track("query.drift.counts",
        toks.groupBy("source", "h").agg(count(lit(1)).as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      counts.count()
      val totals = counts.groupBy("source").agg(sum("c").as("n"))
      val a = counts.select(col("source").as("src_a"), col("h"), col("c").as("ca"))
        .join(broadcast(totals.select(col("source").as("src_a"), col("n").as("na"))), "src_a")
      val b = counts.select(col("source").as("src_b"), col("h"), col("c").as("cb"))
        .join(broadcast(totals.select(col("source").as("src_b"), col("n").as("nb"))), "src_b")
      val pa = col("ca").cast("double") / col("na")
      val pb = col("cb").cast("double") / col("nb")
      val shared = a.hint("merge").join(b, "h")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(sum(pa).as("spa"), sum(pb).as("spb"),
          sum(lit(0.5) * (pa * log(lit(2.0) * pa / (pa + pb)) +
            pb * log(lit(2.0) * pb / (pa + pb)))).as("inner"))
      val srcs = totals.select("source").orderBy("source")
        .collect().map(_.getString(0))
      val pairRows = for {
        i <- srcs.indices; j <- (i + 1) until srcs.length
      } yield (srcs(i), srcs(j))
      import s.implicits._
      val pairs = pairRows.toDF("src_a", "src_b")
      pairs.join(broadcast(shared), Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"),
          graft.functions.EngineNeutral.roundHalfUp(
            lit(0.5) * log(lit(2.0)) *
              (lit(2.0) - coalesce(col("spa"), lit(0.0)) - coalesce(col("spb"), lit(0.0))) +
              coalesce(col("inner"), lit(0.0)), 6).as("jsd"))
        .orderBy("src_a", "src_b")
    }),

    // 122. Positional-index phrase search: find every occurrence of an
    //      exact 3-token phrase — the probe is the corpus's TOP
    //      boilerplate shingle (deterministic: max df, shingle-string
    //      tie-break), so the query is self-contained. The match runs
    //      on the same codegen'd window-lead trigram construction as
    //      the span family (Dedup.spanRows): one 8-byte hash per
    //      position, matched against the broadcast probe hash — corpus
    //      text never shuffles, and the per-doc hit aggregation moves
    //      (doc_id, partial) pairs only.
    "q_phrase_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val probe = Dedup.frequentShingles(docs, "text", shingleK = 3, minCount = 2)
        .orderBy(col("n").desc, col("shingle")).limit(1)
        .select(col("shingle"))
      val probeHash = probe.select(
        xxhash64(element_at(split(col("shingle"), " "), 1),
          element_at(split(col("shingle"), " "), 2),
          element_at(split(col("shingle"), " "), 3)).as("h"))
      // positioned trigram rows (Dedup.spanRows drops pos; this is the
      // SpanQueries.spanOccurrences construction at k=3)
      val par = s.sparkContext.defaultParallelism
      val tok = docs.repartition(par, col("doc_id"))
        .select(col("doc_id"), posexplode(Dedup.tokens(col("text"))))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val parts = col("col") +: (1 until 3).map(j => lead(col("col"), j).over(w))
      tok.select(col("doc_id"), col("pos"), xxhash64(parts: _*).as("h"),
          parts.last.isNotNull.as("full"))
        .filter(col("full")).drop("full")
        .join(broadcast(probeHash), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
        .orderBy("doc_id")
    }),

    // 123. CUSUM change-point scan per event type: the classic
    //      level-shift statistic max_k |Σ_{i≤k}(v_i − mean)| with its
    //      timestamp — on the distributed keyed prefix scan
    //      (operators.PrefixScan: range shuffle + driver offsets over
    //      the bounded event-type dimension), NEVER a
    //      whole-sequence-in-one-task window. Exactness: values
    //      quantize to integer cents first, so the running sums are
    //      exact longs in ANY partition grouping and the only floating
    //      point is per-row (p − k·mean) on identical operands in both
    //      engines — bit-identical, unrounded. Argmax via the native
    //      TopKPerKey (k=1), deterministic (ties → earliest ts, id).
    "q_cusum" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
      val tot = e.groupBy("event_type").agg(sum("c").as("t"), count(lit(1)).as("n"))
      val (scanned, _) = graft.operators.PrefixScan.runningPerKey(
        e, Seq(col("event_type")), Seq(col("ts"), col("event_id")),
        col("c"), "p", "k")
      val sRows = scanned.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("ts"), col("event_id"),
          abs(col("p") - col("k") * (col("t").cast("double") / col("n"))).as("abs_s"))
      graft.plans.TopKPerKey.topK(sRows, Seq("event_type"),
          Seq("abs_s" -> true, "ts" -> false, "event_id" -> false), k = 1)
        .select(col("event_type"), col("ts").as("ts_at_max"),
          col("abs_s").as("max_abs_cusum"))
        .orderBy("event_type")
    }),

    // 124. N-gram novelty: per doc, the fraction of its distinct
    //      3-shingles never seen in any EARLIER doc (by id) — the
    //      churn/novelty signal behind dedup-aware curricula and crawl
    //      freshness dashboards. First-seer attaches via joinKeyStats
    //      (map-side-combined min + merge join — a boilerplate shingle
    //      in millions of docs collapses on the mappers); the ratio
    //      divides two exact ints, bit-identical unrounded.
    "q_novelty" -> ((s, d) => {
      val sh = Dedup.shingleHashes(Tables.documents(s, d), "doc_id", "text",
          shingleK = 3)
        .dropDuplicates("id", "h")
      Dedup.joinKeyStats(sh, "h", Seq(min(col("id")).as("first_id")))
        .groupBy("id")
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("first_id") === col("id"), 1)).as("n_novel"))
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_shingles")).as("novelty"))
        .orderBy("doc_id")
    })
  )

  private val bm25Cte =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
      |  FROM documents
      |), corpus AS (
      |  SELECT doc_id, toks FROM t WHERE source <> 'src0'
      |), tf AS (
      |  SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl FROM (
      |    SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM corpus)
      |  GROUP BY 1, 2
      |), stats AS (
      |  SELECT count(*) AS n, sum(len(toks))::DOUBLE / count(*) AS avgdl
      |  FROM corpus
      |), dfreq AS (
      |  SELECT tok, count(*) AS df FROM tf GROUP BY 1
      |), q AS (
      |  SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS tok
      |  FROM t WHERE source = 'src0'
      |), scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    floor(sum(
      |      ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
      |      (tf.tf * (1.2 + 1.0)) /
      |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))
      |    ) * 10000 + 0.5) / 10000.0 AS score
      |  FROM q
      |  JOIN tf ON tf.tok = q.tok
      |  JOIN dfreq ON dfreq.tok = q.tok
      |  CROSS JOIN stats
      |  GROUP BY 1, 2
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_dedup_norm" ->
      """SELECT keep_id, n_copies, n_raw_variants FROM (
        |  SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        |    count(DISTINCT md5(text)) AS n_raw_variants
        |  FROM (SELECT doc_id, text,
        |          trim(regexp_replace(regexp_replace(lower(text),
        |            '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |        FROM documents)
        |  GROUP BY md5(norm))
        |ORDER BY keep_id""".stripMargin,
    // every ratio is one division of the same two exact integers in
    // both engines — bit-identical doubles, no rounding (the avgdl
    // convention)
    "q_tokenizer_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS n_re_tokens,
        |  sum(len(regexp_extract_all(text, '[a-z0-9]+')))::DOUBLE /
        |    sum(len(string_split(text, ' '))) AS fertility,
        |  sum(length(text))::DOUBLE /
        |    sum(len(regexp_extract_all(text, '[a-z0-9]+'))) AS chars_per_token
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // BUCKET parity at the hash level: both engines key the model on
    // the low-60-bit md5 of the token mod 2²⁰ (Selection.tokenBucket
    // ≡ ('0x'||substr(md5(t),1,15))::BIGINT % 1048576 — md5 of UTF-8
    // bytes is engine-identical, so collisions merge IDENTICALLY);
    // every scored token's bucket exists in the raw pool so the raw
    // join is inner; the smoothed per-bucket log-ratio is the same
    // closed form in both engines and r6 floor-rounding on the
    // per-doc mean absorbs ln/sum last-bit drift
    "q_importance" ->
      """WITH toks0 AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(t), 1, 15))::BIGINT % 1048576 AS h
        |  FROM toks0
        |), tgt AS (
        |  SELECT h, count(*) AS ct FROM toks WHERE source = 'src0' GROUP BY 1
        |), raw AS (
        |  SELECT h, count(*) AS cr FROM toks WHERE source <> 'src0' GROUP BY 1
        |), st AS (
        |  SELECT (SELECT count(DISTINCT h) FROM toks) AS v,
        |    (SELECT CAST(sum(ct) AS BIGINT) FROM tgt) AS nt,
        |    (SELECT CAST(sum(cr) AS BIGINT) FROM raw) AS nr
        |)
        |SELECT s.doc_id, count(*) AS n_tokens,
        |  floor(avg(
        |    ln((coalesce(tgt.ct, 0) + 1.0) / (st.nt + st.v)) -
        |    ln((raw.cr + 1.0) / (st.nr + st.v))
        |  ) * 1000000 + 0.5) / 1000000.0 AS avg_logratio
        |FROM toks s
        |JOIN raw ON raw.h = s.h
        |LEFT JOIN tgt ON tgt.h = s.h
        |CROSS JOIN st
        |WHERE s.source <> 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // lexical CTEs are q_bm25's verbatim (top-20 here); the dense leg
    // mirrors q_ann_bruteforce's r4-rounded cosine; RRF values are
    // sums of two exact-int divisions — bit-identical, unrounded
    "q_rrf_fusion" -> rrfOracleSql,
    // the indexed route (sparse leg served from the persisted lexical
    // index) must reproduce the in-job fusion EXACTLY
    "q_rrf_fusion_indexed" -> rrfOracleSql,

    // undirected triangle enumeration on the same edge rule as
    // q_dedup_clusters (edges carry id_a < id_b, so x<y<z counts each
    // triangle once); the Spark side's degree orientation changes the
    // join order, not the result
    "q_triangles" ->
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
        |), tri AS (
        |  SELECT a.id_a AS x, a.id_b AS y, b.id_b AS z
        |  FROM edges a JOIN edges b ON b.id_a = a.id_b
        |  JOIN edges c ON c.id_a = a.id_a AND c.id_b = b.id_b
        |)
        |SELECT id, count(*) AS n_tri
        |FROM (SELECT unnest([x, y, z]) AS id FROM tri)
        |GROUP BY id ORDER BY id""".stripMargin,
    // BRUTE FORCE — the operator is complete (prefix filtering loses
    // no true pair), so the oracle needs no candidate mirroring: all
    // intersecting pairs (J > 0 requires a shared shingle) scored
    // exactly. Shingle parity at the string level; jaccard divides the
    // same two integers in both engines.
    // token parity at the string level (Spark joins xxhash64 keys);
    // every probability is the same exact-integer division in both
    // engines, and the r6 floor on the final sum absorbs ln/sum
    // accumulation-order drift (the q_lm_score convention). The
    // closed form only needs SHARED tokens: disjoint-support mass is
    // ½ln2·(2 − Σ∩pa − Σ∩pb)
    "q_drift" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS t
        |  FROM documents
        |), counts AS (
        |  SELECT source, t, count(*) AS c FROM toks GROUP BY 1, 2
        |), totals AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY 1
        |), shared AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    sum(a.c::DOUBLE / na.n) AS spa,
        |    sum(b.c::DOUBLE / nb.n) AS spb,
        |    sum(0.5 * (
        |      (a.c::DOUBLE / na.n) * ln(2 * (a.c::DOUBLE / na.n) /
        |        ((a.c::DOUBLE / na.n) + (b.c::DOUBLE / nb.n))) +
        |      (b.c::DOUBLE / nb.n) * ln(2 * (b.c::DOUBLE / nb.n) /
        |        ((a.c::DOUBLE / na.n) + (b.c::DOUBLE / nb.n))))) AS inr
        |  FROM counts a
        |  JOIN counts b ON b.t = a.t AND a.source < b.source
        |  JOIN totals na ON na.source = a.source
        |  JOIN totals nb ON nb.source = b.source
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b
        |  FROM totals a JOIN totals b ON a.source < b.source
        |)
        |SELECT src_a, src_b,
        |  floor((0.5 * ln(2) * (2 - coalesce(spa, 0) - coalesce(spb, 0)) +
        |         coalesce(inr, 0)) * 1000000 + 0.5) / 1000000.0 AS jsd
        |FROM pairs LEFT JOIN shared USING (src_a, src_b)
        |ORDER BY src_a, src_b""".stripMargin,
    // probe = the deterministic top boilerplate shingle (max df,
    // shingle-string tie-break — frequentShingles' exact rule); hit
    // positions mirror the 0-based posexplode by i − 1 on DuckDB's
    // 1-based slices
    "q_phrase_search" ->
      """WITH sh AS (
        |  SELECT unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), probe AS (
        |  SELECT shingle FROM (
        |    SELECT shingle, count(*) AS n FROM sh GROUP BY 1 HAVING count(*) >= 2)
        |  ORDER BY n DESC, shingle LIMIT 1
        |), t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents
        |), hits AS (
        |  SELECT doc_id, unnest([i FOR i IN range(1, len(toks) - 1)
        |                         IF array_to_string(toks[i:i+2], ' ') = probe.shingle]) AS i
        |  FROM t, probe WHERE len(toks) >= 3
        |)
        |SELECT doc_id, count(*) AS n_hits, CAST(min(i) - 1 AS INT) AS first_pos
        |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin,
    // shingle parity at the string level (Spark joins xxhash64 keys);
    // the novelty ratio divides the same two integers in both engines
    "q_novelty" ->
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), firsts AS (
        |  SELECT shingle, min(id) AS first_id FROM sh GROUP BY 1
        |)
        |SELECT sh.id AS doc_id, count(*) AS n_shingles,
        |  count(CASE WHEN f.first_id = sh.id THEN 1 END) AS n_novel,
        |  count(CASE WHEN f.first_id = sh.id THEN 1 END)::DOUBLE / count(*) AS novelty
        |FROM sh JOIN firsts f USING (shingle)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // integer-cent quantization makes the prefix sums exact in both
    // engines; the only floats are per-row on identical operands, so
    // max/argmax are bit-deterministic with the (abs_s DESC, ts, id)
    // tie-break
    "q_cusum" ->
      """WITH e AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events
        |), tot AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS t, count(*) AS n
        |  FROM e GROUP BY 1
        |), pre AS (
        |  SELECT event_type, ts, event_id,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS k
        |  FROM e
        |), s AS (
        |  SELECT pre.event_type, ts, event_id,
        |    abs(p - k * (tot.t::DOUBLE / tot.n)) AS abs_s
        |  FROM pre JOIN tot USING (event_type)
        |)
        |SELECT event_type, ts AS ts_at_max, abs_s AS max_abs_cusum
        |FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs_s DESC, ts, event_id) AS rn FROM s)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_simjoin" -> simjoinOracleSql,
    // the indexed route must reproduce the in-job result EXACTLY —
    // one truth, two physical paths
    "q_simjoin_indexed" -> simjoinOracleSql
  )

  private lazy val rrfOracleSql: String =
    bm25Cte +
      """, lex AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, doc_id) AS r_lex
        |  FROM scored
        |), den0 AS (
        |  SELECT eq.vec_id AS query_id, ec.vec_id AS doc_id,
        |    floor(list_dot_product(eq.embedding::DOUBLE[], ec.embedding::DOUBLE[]) /
        |      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(ec.embedding::DOUBLE[], ec.embedding::DOUBLE[]))) * 10000 + 0.5) / 10000.0 AS sim
        |  FROM embeddings eq
        |  JOIN documents dq ON dq.doc_id = eq.vec_id AND dq.source = 'src0'
        |  CROSS JOIN embeddings ec
        |  JOIN documents dc ON dc.doc_id = ec.vec_id AND dc.source <> 'src0'
        |), den AS (
        |  SELECT query_id, doc_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, doc_id) AS r_dense
        |  FROM den0
        |), fused AS (
        |  SELECT query_id, doc_id,
        |    coalesce(1.0 / (l.r_lex + 60.0), 0.0) +
        |    coalesce(1.0 / (d.r_dense + 60.0), 0.0) AS rrf
        |  FROM (SELECT * FROM lex WHERE r_lex <= 20) l
        |  FULL OUTER JOIN (SELECT * FROM den WHERE r_dense <= 20) d
        |  USING (query_id, doc_id)
        |), ranked AS (
        |  SELECT query_id, doc_id, rrf,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY rrf DESC, doc_id) AS rank
        |  FROM fused
        |)
        |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf
        |FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin

  private lazy val simjoinOracleSql: String =
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS shingle
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), sizes AS (
        |  SELECT id, count(*) AS n FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS ni
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2
        |)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT i.id_a, i.id_b, i.ni::DOUBLE / (na.n + nb.n - i.ni) AS jaccard
        |  FROM inter i JOIN sizes na ON na.id = i.id_a
        |  JOIN sizes nb ON nb.id = i.id_b)
        |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin
}
