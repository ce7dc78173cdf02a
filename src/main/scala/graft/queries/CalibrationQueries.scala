package graft.queries

import graft.Tables
import graft.functions.{Dedup, EngineNeutral}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourteenth query wave — model-prep calibration operators
  * (SURVEY.md §2 rows 148-151): the statistics a training-data
  * pipeline computes right before data leaves for the trainer —
  * robust document fingerprints (winnowing), smoothed LM estimates
  * (Kneser-Ney), normalized quality blending, and embedding-space
  * health checks.
  *
  * Scale notes: winnowing and the KN counts are the only shuffles
  * here and both are map-side-combinable aggregations over
  * token-linear rows; per-doc windows partition by doc_id (bounded
  * groups — never a hash-derived corpus-scale key); the quality
  * blend broadcasts a languages-sized stats table; embedding stats
  * aggregate to a dims-sized frame. Nothing in this file keeps
  * state proportional to the corpus on any single task.
  */
object CalibrationQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Winnowing constants (Schleimer, Wilkerson, Aiken, SIGMOD 2003):
    * token k-grams hashed, windows of `W` consecutive gram hashes,
    * one fingerprint selected per window. Guarantee: any shared run
    * of K+W-1 tokens between two documents shares at least one
    * selected fingerprint — detection is position-robust, unlike
    * fixed-stride sampling.
    */
  private val K = 4
  private val W = 4

  val queries: Map[String, Q] = Map(
    // 148. Winnowing fingerprint selection: per window of W gram
    //      hashes pick the minimum, RIGHTMOST on ties (the paper's
    //      rule — encoded order-free as min over the composite key
    //      hash ++ (BIG - position), so both engines agree without a
    //      procedural scan). Output: per-doc fingerprint count and
    //      density ~ 2/(W+1), the paper's expected selection rate.
    //      Shuffle is gram-linear; the window partitions by doc_id
    //      (bounded by document length).
    "q_winnowing" -> ((s, d) => {
      // round-18: gram digests from the ShingleMd5 kernel (fallback
      // variant: docs shorter than K emit ONE digest of the whole
      // joined text, exactly the old sequence(0,0) + clamped-slice
      // gram). The former interpreted per-gram string transform +
      // md5-hex + lpad/concat string-key churn is gone. The selection
      // key becomes struct(md5-binary, 999999999 − p): binary ordering
      // is unsigned lexicographic ≡ the lowercase-hex string order on
      // equal-length digests, and the int second field reproduces the
      // zero-padded positional tie-break — the window minima select
      // the SAME grams, and countDistinct is preserved (old key ↔ new
      // key is a bijection).
      val ts = Dedup.tokens(col("text"))
      val grams = Tables.spread(Tables.documents(s, d))
        .select(col("doc_id"),
          (greatest(size(ts) - K, lit(0)) + 1).as("m"),
          posexplode(graft.plans.TextHashCols.shingleMd5Padded(col("text"), K))
            .as(Seq("p", "hb")))
      val key = struct(col("hb"), (lit(999999999) - col("p")).cast("int"))
      val win = Window.partitionBy("doc_id").orderBy("p").rowsBetween(0, W - 1)
      grams
        .withColumn("wmin", min(key).over(win))
        // full windows only; short docs (m < W) keep their single
        // start-0 window, which the frame truncates to all m grams
        .filter(col("p") <= greatest(col("m") - W, lit(0)))
        .groupBy("doc_id")
        .agg(max("m").cast("long").as("n_grams"),
          countDistinct(col("wmin")).as("n_fp"))
        .withColumn("density",
          EngineNeutral.r4(col("n_fp").cast("double") / col("n_grams")))
        .orderBy("doc_id")
    }),

    // 149. Interpolated Kneser-Ney bigram estimates (Kneser & Ney
    //      1995; Chen & Goodman 1998), fixed discount D=0.75:
    //      p_kn(w2|w1) = max(c12-D,0)/c1 + (D·N1+(w1·)/c1)·(N1+(·w2)/B)
    //      — the continuation-count smoothing every n-gram LM
    //      pipeline uses. All inputs are exact integers; the double
    //      expression is written with IDENTICAL association in the
    //      oracle, so the 6-dp rounding is engine-neutral. Top-100
    //      bigrams by count plan as TakeOrderedAndProject (never a
    //      global sort exchange); the vocabulary-scale count tables
    //      join to the 100 survivors via broadcast of the SMALL side.
    "q_kneser_ney" -> ((s, d) => {
      // round-19: adjacent-pair STRINGS from the TokenBigrams kernel —
      // t1/t2 are OUTPUT columns here, so the hash-keyed bigram
      // kernels (q_bigram_lm/q_cond_entropy) cannot apply, but the
      // posexplode + per-doc window.lead (which shuffled and sorted
      // every token string just to pair neighbors) can still go: the
      // kernel emits the same (t_i, t_{i+1}) multiset per doc by
      // construction (TextHashSpec pin)
      val c12 = graft.plans.CacheHandles.track("query.kn.bigrams",
        Tables.spread(Tables.documents(s, d))
          .select(explode(graft.plans.TextHashCols
            .tokenBigrams(col("text"))).as("bg"))
          .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      val c1 = c12.groupBy("t1")
        .agg(sum("c").as("c1"), count(lit(1)).as("n_after"))
      val nb = c12.groupBy("t2").agg(count(lit(1)).as("n_before"))
      val bt = c12.agg(count(lit(1)).as("b_types"))
      val top = c12.orderBy(col("c").desc, col("t1"), col("t2")).limit(100)
      val pkn =
        greatest(col("c") - lit(0.75), lit(0.0)) / col("c1") +
          lit(0.75) * col("n_after") / col("c1") * (col("n_before") / col("b_types"))
      val j1 = c1.join(broadcast(top), Seq("t1"))
      nb.join(broadcast(j1), Seq("t2"))
        .crossJoin(broadcast(bt))
        .select(col("t1"), col("t2"), col("c").as("c12"), col("c1"),
          col("n_after"), col("n_before"),
          EngineNeutral.roundHalfUp(pkn, 6).as("p_kn"))
        .orderBy(col("c12").desc, col("t1"), col("t2"))
    }),

    // 150. Per-language z-normalized quality blend: three integer
    //      signals (chars, tokens, distinct tokens) standardized
    //      against their LANGUAGE's mean/σ — cross-language
    //      comparability is the point (a short Chinese doc isn't
    //      low-quality because German docs are long) — then blended
    //      0.5/0.3/0.2 into one keep score. Integer sums stay exact
    //      through sf100 (< 2^53), so μ/σ are bit-identical doubles
    //      in both engines; the languages-sized stats table
    //      broadcasts. The per-doc verdict a selection stage
    //      thresholds on, emitted for every doc.
    "q_quality_blend" -> ((s, d) => {
      val ts = Dedup.tokens(col("text"))
      val base = graft.plans.CacheHandles.track("query.qblend.base",
        Tables.spread(Tables.documents(s, d))
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars").cast("double").as("x1"),
            size(ts).cast("double").as("x2"),
            size(array_distinct(ts)).cast("double").as("x3"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      val stats = base.groupBy("lang").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x1").as("s1"), sum(col("x1") * col("x1")).as("q1"),
        sum("x2").as("s2"), sum(col("x2") * col("x2")).as("q2"),
        sum("x3").as("s3"), sum(col("x3") * col("x3")).as("q3"))
      // Degenerate groups: one doc (n-1 = 0) or a zero-variance
      // signal would divide by zero, where Spark (NULL, non-ANSI
      // Divide) and DuckDB (IEEE ±inf/NaN) disagree. The z term is
      // zeroed when n < 2 or the variance term is <= 0, guarding on
      // the COMPUTED denominator itself — `(q − s²/n)/(n−1) > 0`
      // compares the identical IEEE doubles in both engines, and the
      // n > 1 conjunct makes the division well-defined inside the
      // guard (for n = 1 the conjunction is false in both engines
      // regardless of the other operand — even DuckDB's NaN>0=true
      // cannot flip `false AND x`). A proxy guard like q·n > s·s can
      // pass while the real denominator rounds to exactly 0 past
      // 2⁵³-magnitude sums, reopening the divergence.
      def z(x: String, sc: String, q: String) = {
        val varTerm =
          (col(q) - col(sc) * col(sc) / col("n")) / (col("n") - 1)
        when(col("n") > 1 && varTerm > 0,
          (col(x) - col(sc) / col("n")) / sqrt(varTerm))
          .otherwise(lit(0.0))
      }
      val blend =
        lit(0.5) * z("x1", "s1", "q1") +
          lit(0.3) * z("x2", "s2", "q2") +
          lit(0.2) * z("x3", "s3", "q3")
      base.join(broadcast(stats), Seq("lang"))
        .select(col("doc_id"), col("source"),
          EngineNeutral.r4(blend).as("blend"),
          (blend > lit(-0.5)).as("keep"))
        .orderBy("doc_id")
    }),

    // 151. Embedding-space health per dimension: mean, variance, and
    //      near-zero fraction over an e4 fixed-point view of each
    //      coordinate (floor(v·10⁴+0.5) as exact longs — sums are
    //      exact integers in BOTH engines at any partition order,
    //      double-exact through sf100, so the oracle matches without
    //      float-association slack). Flags dead dimensions (σ≈0 —
    //      wasted model capacity, a real embedding-pipeline failure
    //      mode) before anything trains on or indexes the vectors.
    //      Aggregates to a dims-sized frame with map-side combine.
    "q_embed_dim_stats" -> ((s, d) => {
      val vm = floor(col("v") * lit(10000.0) + lit(0.5)).cast("long")
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim0", "v")))
        .select((col("dim0") + 1).cast("long").as("dim"), vm.as("vm"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum("vm").as("s"), sum(col("vm") * col("vm")).as("q"),
          sum(when(abs(col("vm")) < 100, 1L).otherwise(0L)).as("nz"))
        .select(col("dim"), col("n"),
          EngineNeutral.roundHalfUp(
            col("s").cast("double") / col("n") / lit(10000.0), 6).as("mean"),
          EngineNeutral.roundHalfUp(
            (col("q").cast("double") / col("n") -
              (col("s").cast("double") / col("n")) * (col("s").cast("double") / col("n"))) /
              lit(100000000.0), 6).as("variance"),
          EngineNeutral.r4(col("nz").cast("double") / col("n")).as("frac_near_zero"))
        .orderBy("dim")
    }),

    // 151b. Embedding-space PCA spectrum (round 17): top-10 principal
    //       variance shares + effective rank (Roy & Vetterli's exp of
    //       spectral entropy) from ONE distributed pass — the
    //       GramSketch TypedImperativeAggregate reduces the corpus to
    //       n, Σx, Σxxᵀ (d(d+1)/2 doubles, map-side combine, one-row
    //       shuffle); covariance + cyclic-Jacobi eigensolve are d×d
    //       driver arithmetic (d = 64 → a 2 080-double collect, the
    //       q_ridge_regress bounded-collect class). The anisotropy /
    //       collapsed-space diagnosis q_embed_dim_stats' per-axis
    //       variances cannot see: variance hoarded by OBLIQUE
    //       directions only shows in the spectrum. Rows-only BY
    //       NATURE (no SQL eigensolve); EmbedStatsSpec pins the
    //       spectrum against a direct two-pass covariance on the gate
    //       corpus, trace preservation, and share monotonicity.
    "q_embed_pca" -> ((s, d) =>
      graft.functions.EmbedStats.pcaSpectrum(
        Tables.embeddings(s, d), "embedding", dim = 64, topK = 10)),

    // 151c. LSH band/row sweep (round 18): the q_threshold_sweep
    //       shape applied to the LSH S-curve — per band config over
    //       the SAME 64-hash signature table (one text scan), the
    //       candidate volume and its est-jaccard survival. Picks the
    //       banding knob on the actual corpus before a 100 TB dedup
    //       run commits to one. Each config runs the exact
    //       minhashCandidates path; output is 3 rows of counts,
    //       engine-exact (est thresholds compare dyadic k/64).
    "q_lsh_band_sweep" -> ((s, d) =>
      Dedup.lshBandSweep(Tables.documents(s, d), "doc_id", "text")
        .orderBy("n_bands")),

    // 151d. MinHash calibration curve (round 18): est_jaccard (the
    //       64-hash sketch) vs EXACT shingle jaccard on the sketch's
    //       own candidate pairs, bucketed by est decile — the
    //       measured answer to "how much do I trust est ≥ 0.5 at
    //       100 TB?". Every output value is engine-exact without
    //       rounding dodges: mean_est sums dyadic k/64 values (exact
    //       in any order), min/max are order-free, and the error
    //       counter compares per-pair doubles both engines compute
    //       identically. The exact-jaccard side reuses the bounded
    //       ngramJaccard verify (hashed shingle sets, candidates
    //       only — never all pairs).
    "q_minhash_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // round-19 wave 3: persist the candidate pairs — they feed BOTH
      // the exact-jaccard verify input AND the calibration join below,
      // and without the persist the entire banding + in-bucket pairing
      // + est-join chain ran TWICE (StageProfile: every pair stage
      // appeared duplicated, ~1.2 s of repeated wall). The table is
      // tiny (pairs above est 0.25 — 6.4 k rows at sf0.1), the
      // favorable-persist profile of VERDICT r18 #4. Eager count per
      // the sharedShingleEdges concurrent-consumer rationale;
      // Bench/Verify release via CacheHandles.
      val cands = graft.plans.CacheHandles.track("query.minhashcal.cands",
        Dedup.minhashCandidates(docs, "doc_id", "text")
          .filter(col("est_jaccard") >= 0.25)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      cands.count()
      val exact = Dedup.ngramJaccard(docs,
        cands.select("id_a", "id_b"), "doc_id", "text")
      cands.join(exact, Seq("id_a", "id_b"))
        .withColumn("bucket",
          least(floor(col("est_jaccard") * 10), lit(9.0)).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"),
          (sum(col("est_jaccard")) / count(lit(1))).as("mean_est"),
          min(col("jaccard")).as("min_exact"),
          max(col("jaccard")).as("max_exact"),
          sum(when(abs(col("est_jaccard") - col("jaccard")) > 0.15, 1L)
            .otherwise(0L)).as("n_err_gt_015"))
        .orderBy("bucket")
    }))

  val oracles: Map[String, String] = Map(
    "q_winnowing" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, greatest(len(toks) - 4, 0) + 1 AS m,
        |    unnest(range(1, greatest(len(toks) - 4, 0) + 2)) AS i,
        |    unnest([md5(array_to_string(toks[j:j+3], ' '))
        |            FOR j IN range(1, greatest(len(toks) - 4, 0) + 2)]) AS h
        |  FROM t
        |), wm AS (
        |  SELECT doc_id, m, i,
        |    min(h || lpad(CAST(999999999 - (i - 1) AS VARCHAR), 9, '0'))
        |      OVER (PARTITION BY doc_id ORDER BY i
        |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |  FROM g
        |)
        |SELECT doc_id, CAST(max(m) AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT wmin) AS BIGINT) AS n_fp,
        |  floor(CAST(count(DISTINCT wmin) AS DOUBLE) / max(m) * 10000 + 0.5) / 10000.0 AS density
        |FROM wm WHERE i - 1 <= greatest(m - 4, 0)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(range(1, len(ts) + 1)) AS pos, unnest(ts) AS t
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) > 0) AS ts
        |        FROM documents)
        |), bg AS (
        |  SELECT t1, t2 FROM (
        |    SELECT t AS t1, lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        |    FROM toks)
        |  WHERE t2 IS NOT NULL
        |), cb AS (SELECT t1, t2, count(*) AS c FROM bg GROUP BY t1, t2),
        |cl AS (SELECT t1, CAST(sum(c) AS BIGINT) AS c1, count(*) AS n_after FROM cb GROUP BY t1),
        |nb AS (SELECT t2, count(*) AS n_before FROM cb GROUP BY t2),
        |bt AS (SELECT count(*) AS b_types FROM cb),
        |top AS (SELECT * FROM cb ORDER BY c DESC, t1, t2 LIMIT 100)
        |SELECT top.t1, top.t2, CAST(top.c AS BIGINT) AS c12, cl.c1,
        |  CAST(cl.n_after AS BIGINT) AS n_after,
        |  CAST(nb.n_before AS BIGINT) AS n_before,
        |  floor((greatest(top.c - 0.75, 0.0) / cl.c1 +
        |         0.75 * cl.n_after / cl.c1 * (nb.n_before / bt.b_types))
        |        * 1000000 + 0.5) / 1000000.0 AS p_kn
        |FROM top JOIN cl USING (t1) JOIN nb USING (t2) CROSS JOIN bt
        |ORDER BY c12 DESC, t1, t2""".stripMargin,
    "q_quality_blend" ->
      """WITH b AS (
        |  SELECT doc_id, source, lang, CAST(n_chars AS DOUBLE) AS x1,
        |    CAST(len(ts) AS DOUBLE) AS x2,
        |    CAST(len(list_distinct(ts)) AS DOUBLE) AS x3
        |  FROM (SELECT doc_id, source, lang, n_chars,
        |          list_filter(string_split(text, ' '), x -> length(x) > 0) AS ts
        |        FROM documents)
        |), st AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x1) AS s1, sum(x1 * x1) AS q1,
        |    sum(x2) AS s2, sum(x2 * x2) AS q2,
        |    sum(x3) AS s3, sum(x3 * x3) AS q3
        |  FROM b GROUP BY lang
        |), z AS (
        |  SELECT doc_id, source,
        |    0.5 * (CASE WHEN n > 1 AND (q1 - s1 * s1 / n) / (n - 1) > 0
        |           THEN (x1 - s1 / n) / sqrt((q1 - s1 * s1 / n) / (n - 1))
        |           ELSE 0.0 END) +
        |    0.3 * (CASE WHEN n > 1 AND (q2 - s2 * s2 / n) / (n - 1) > 0
        |           THEN (x2 - s2 / n) / sqrt((q2 - s2 * s2 / n) / (n - 1))
        |           ELSE 0.0 END) +
        |    0.2 * (CASE WHEN n > 1 AND (q3 - s3 * s3 / n) / (n - 1) > 0
        |           THEN (x3 - s3 / n) / sqrt((q3 - s3 * s3 / n) / (n - 1))
        |           ELSE 0.0 END) AS blend
        |  FROM b JOIN st USING (lang)
        |)
        |SELECT doc_id, source, floor(blend * 10000 + 0.5) / 10000.0 AS blend,
        |  blend > -0.5 AS keep
        |FROM z ORDER BY doc_id""".stripMargin,
    "q_embed_dim_stats" ->
      """WITH e AS (
        |  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
        |    unnest(embedding::DOUBLE[]) AS v
        |  FROM embeddings
        |), m AS (
        |  SELECT dim, CAST(floor(v * 10000 + 0.5) AS BIGINT) AS vm FROM e
        |)
        |SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
        |  floor(CAST(sum(vm) AS DOUBLE) / count(*) / 10000.0 * 1000000 + 0.5) / 1000000.0 AS mean,
        |  floor((CAST(sum(vm * vm) AS DOUBLE) / count(*) -
        |         (CAST(sum(vm) AS DOUBLE) / count(*)) * (CAST(sum(vm) AS DOUBLE) / count(*)))
        |        / 100000000.0 * 1000000 + 0.5) / 1000000.0 AS variance,
        |  floor(CAST(count(*) FILTER (WHERE abs(vm) < 100) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0 AS frac_near_zero
        |FROM m GROUP BY dim ORDER BY dim""".stripMargin,
    // The q_dedup_minhash signature pipeline, banded once per sweep
    // config (i // r groups the same 64 hashes; the oracle buckets by
    // band VALUE where Spark buckets by xxhash64 of it — identical
    // modulo 2⁻⁶⁴ collisions). LEFT JOIN from cfg keeps configs whose
    // candidate set is empty as zero rows; sums cast back to BIGINT
    // (DuckDB HUGEINT would fail the type gate).
    "q_lsh_band_sweep" ->
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), hh AS (
        |  SELECT id,
        |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
        |    CAST('0x' || substr(md5(s || '#'), 1, 14) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT id, i, min((h1 + i * h2) % 2305843009213693951) AS m
        |  FROM hh CROSS JOIN range(64) r(i)
        |  GROUP BY 1, 2
        |), cfg AS (
        |  SELECT * FROM (VALUES (8, 8), (16, 4), (32, 2)) t(nb, r)
        |), band AS (
        |  SELECT c.nb, s.id, s.i // c.r AS band,
        |    array_to_string(list(s.m ORDER BY s.i), ',') AS bkey
        |  FROM sig s CROSS JOIN cfg c
        |  GROUP BY c.nb, s.id, s.i // c.r
        |), capped AS (
        |  SELECT nb, id, band, bkey FROM (
        |    SELECT *, count(*) OVER (PARTITION BY nb, band, bkey) AS bs FROM band)
        |  WHERE bs BETWEEN 2 AND 1000
        |), cand AS (
        |  SELECT DISTINCT a.nb, a.id AS id_a, b.id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.nb = b.nb AND a.band = b.band AND a.bkey = b.bkey
        |      AND a.id < b.id
        |), est AS (
        |  SELECT c.nb, c.id_a, c.id_b,
        |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)::DOUBLE / 64 AS ej
        |  FROM cand c
        |  JOIN sig sa ON sa.id = c.id_a
        |  JOIN sig sb ON sb.id = c.id_b AND sb.i = sa.i
        |  GROUP BY 1, 2, 3
        |)
        |SELECT c.nb AS n_bands, c.r AS rows_per_band,
        |  count(e.ej) AS n_candidates,
        |  CAST(coalesce(sum(CASE WHEN e.ej >= 0.3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge_03,
        |  CAST(coalesce(sum(CASE WHEN e.ej >= 0.5 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_ge_05
        |FROM cfg c LEFT JOIN est e ON e.nb = c.nb
        |GROUP BY 1, 2 ORDER BY n_bands""".stripMargin,
    // est from the q_dedup_minhash pipeline at its default 16-band
    // config; exact jaccard from the shingle sets (the q_ngram_jaccard
    // inter/union of DISTINCT shingles — string-level where Spark
    // compares xxhash64 sets, identical modulo collisions). Every
    // output avoids order-dependent float sums: mean_est is an exact
    // dyadic sum, min/max are order-free, the error count compares
    // per-pair doubles.
    "q_minhash_calibration" ->
      """WITH sh AS (
        |  SELECT id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END)) AS s
        |  FROM (SELECT doc_id AS id, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |        FROM documents)
        |), hh AS (
        |  SELECT id,
        |    CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
        |    CAST('0x' || substr(md5(s || '#'), 1, 14) AS BIGINT) AS h2
        |  FROM sh
        |), sig AS (
        |  SELECT id, i, min((h1 + i * h2) % 2305843009213693951) AS m
        |  FROM hh CROSS JOIN range(64) r(i)
        |  GROUP BY 1, 2
        |), band AS (
        |  SELECT id, i // 4 AS band,
        |    array_to_string(list(m ORDER BY i), ',') AS bkey
        |  FROM sig GROUP BY id, i // 4
        |), capped AS (
        |  SELECT id, band, bkey FROM (
        |    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bs FROM band)
        |  WHERE bs BETWEEN 2 AND 1000
        |), cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
        |), est AS (
        |  SELECT c.id_a, c.id_b,
        |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)::DOUBLE / 64 AS ej
        |  FROM cand c
        |  JOIN sig sa ON sa.id = c.id_a
        |  JOIN sig sb ON sb.id = c.id_b AND sb.i = sa.i
        |  GROUP BY 1, 2
        |  HAVING sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)::DOUBLE / 64 >= 0.25
        |), sizes AS (
        |  SELECT id, count(*) AS n FROM sh GROUP BY id
        |), inter AS (
        |  SELECT e.id_a, e.id_b, count(*) AS ni
        |  FROM est e JOIN sh a ON a.id = e.id_a
        |  JOIN sh b ON b.id = e.id_b AND b.s = a.s
        |  GROUP BY 1, 2
        |), paired AS (
        |  SELECT e.id_a, e.id_b, e.ej,
        |    coalesce(i.ni, 0)::DOUBLE /
        |      (na.n + nb.n - coalesce(i.ni, 0)) AS jx
        |  FROM est e
        |  LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
        |  JOIN sizes na ON na.id = e.id_a
        |  JOIN sizes nb ON nb.id = e.id_b
        |)
        |SELECT least(floor(ej * 10), 9)::INT AS bucket,
        |  count(*) AS n_pairs,
        |  sum(ej) / count(*) AS mean_est,
        |  min(jx) AS min_exact,
        |  max(jx) AS max_exact,
        |  CAST(sum(CASE WHEN abs(ej - jx) > 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_err_gt_015
        |FROM paired GROUP BY 1 ORDER BY bucket""".stripMargin)
}
