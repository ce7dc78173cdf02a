package graft.queries

import graft.Tables
import graft.functions.{Dedup, EngineNeutral}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifteenth query wave — corpus-health diagnostics (SURVEY.md §2
  * rows 152-155): the distribution-level checks a training-data
  * pipeline runs per ingest round — a KS two-sample test per source
  * against the rest of the corpus, token-frequency concentration
  * (Gini), Zipf-law fit, and conditional bigram entropy. Where the
  * drift family (q_drift: JSD on binned histograms) monitors a known
  * binning, these are the binning-free / rank-based complements.
  *
  * Scale notes: every aggregation here is map-side combinable over a
  * BOUNDED key domain — (source × n_chars) for KS, per-source vocab
  * for Gini/Zipf, bigram types for the entropy — never corpus-row
  * keys. The KS cumulative distributions avoid any global window:
  * the per-source running sums ride a domain-bounded window over the
  * complete source×length grid, and the GLOBAL cumulative is derived
  * as the sum of the per-source cums at each length (the grid is
  * complete, so no second scan and no single-task global sort). Gini
  * ranks ride [[graft.operators.PrefixScan]] (range shuffle + driver
  * offsets), so no task ever sorts a whole source's vocabulary.
  */
object CorpusHealthQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Committed health-profile version dir per sf dir (built once per
    * session — the lexIndexCache convention).
    */
  private val healthProfileCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  val queries: Map[String, Q] = Map(
    // 152. Kolmogorov–Smirnov two-sample test per source: sup-norm
    //      distance between each source's n_chars empirical CDF and
    //      the REST of the corpus's — the classic "did this source's
    //      length distribution drift" gate, binning-free (unlike
    //      q_drift's fixed histogram). The sup over step functions is
    //      attained at a jump point, so evaluating at every distinct
    //      length is exact. All inputs are exact integer counts; the
    //      two CDF divisions associate identically in both engines,
    //      so the max compares bit-identical doubles.
    //      The CDF/grid math lives in HealthProfile.ksFromHist (the
    //      complete source×length grid, per-source domain-bounded
    //      window cums, global CDF as the grid's own per-length sum —
    //      no global window; single-source corpora excluded because
    //      F_rest is 0/0, where Spark NULL and DuckDB NaN diverge),
    //      shared bit-identically with the profile-served variant.
    "q_ks_test" -> ((s, d) =>
      graft.functions.HealthProfile.ksFromHist(
        Tables.documents(s, d)
          .groupBy("source", "n_chars").agg(count(lit(1)).as("c")))),

    // 156. KS drift through the PERSISTED health profile — the
    //      production monitoring path (row 44av): the per-(source,
    //      n_chars) count partials live under a Versioned root with
    //      O(batch) tagged appends, and the drift report folds KBs of
    //      histogram partials instead of re-scanning the corpus. Same
    //      oracle as q_ks_test (HealthProfileSpec pins the fold ≡
    //      scan equality; this gate drives the served path against
    //      DuckDB too). Profile built once per sf dir per session —
    //      the lexIndexCache convention.
    "q_ks_test_indexed" -> ((s, d) => {
      val vdir = healthProfileCache.computeIfAbsent(d, _ => {
        val root = java.nio.file.Files
          .createTempDirectory("graft_healthprof").toString
        graft.functions.HealthProfile.writeIndex(
          Tables.documents(s, d), "source", "n_chars", root)
      })
      graft.functions.HealthProfile.readKs(s, vdir)
    }),

    // 153. Token-frequency Gini concentration per source: sort each
    //      source's vocabulary by (count, token), rank ascending, and
    //      G = (2·Σ rank·count − (V+1)·N) / (V·N) — the inequality
    //      measure behind "is this source one boilerplate string
    //      repeated" dashboards (G→1: a few tokens dominate; G→0:
    //      uniform). Ranks ride PrefixScan (range shuffle + driver
    //      offsets — no whole-vocabulary single-task sort); ties in
    //      count are order-free for the Σ rank·count term but the
    //      (count, token) order is total anyway. Σ rank·count
    //      accumulates in DECIMAL(38,0) (rank ≤ vocab, count ≤ corpus
    //      tokens — the product passes 2⁶³ long before sf-anything),
    //      matching DuckDB's exact HUGEINT; both engines then divide
    //      identical doubles.
    "q_gini_tokens" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val (ranked, _) = graft.operators.PrefixScan.runningPerKey(
        cnt, Seq(col("source")), Seq(col("c"), col("tok")),
        col("c"), "_run", "r")
      val g = ranked.groupBy("source").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("r").cast("decimal(19,0)") * col("c")).as("src"))
      val gini =
        (lit(2.0) * col("src").cast("double") -
          (col("vocab") + 1).cast("double") * col("n_tokens").cast("double")) /
          (col("vocab").cast("double") * col("n_tokens").cast("double"))
      g.select(col("source"), col("n_tokens"), col("vocab"),
          EngineNeutral.roundHalfUp(gini, 6).as("gini"))
        .orderBy("source")
    }),

    // 154. Zipf-law fit per source: OLS slope of ln(count) on
    //      ln(rank) over the top-100 tokens (rank 1 = most frequent,
    //      ties by token) — healthy natural text sits near −1;
    //      template/boilerplate corpora flatten or steepen it. The
    //      top-100 survive the native bounded TopKPerKey (≤100 rows
    //      per source leave each map partition — never a vocabulary
    //      sort); the rank window then orders ≤100 rows per source.
    //      ln sums are doubles (4-dp engine-neutral rounding, the
    //      q_group_regress/q_entropy convention).
    "q_zipf_slope" -> ((s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      val top = graft.plans.TopKPerKey.topK(cnt, Seq("source"),
        Seq("c" -> true, "tok" -> false), k = 100)
      val w = Window.partitionBy("source").orderBy(col("c").desc, col("tok"))
      val xy = top.withColumn("r", row_number().over(w))
        .select(col("source"),
          log(col("r").cast("double")).as("x"),
          log(col("c").cast("double")).as("y"))
      val f = xy.groupBy("source").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      // a single-type vocabulary (n = 1) zeroes the OLS denominator
      // (Spark NULL vs DuckDB NaN) — no line fits one point, so the
      // source is excluded identically in both engines
      f.filter(col("n") >= 2)
        .select(col("source"), col("n").cast("long").as("n_top"),
          EngineNeutral.r4(slope).as("zipf_slope"))
        .orderBy("source")
    }),

    // 157. Seasonal anomaly scan per event type: baseline each
    //      hour-of-day's HOURLY event count across observed days
    //      (μ, σ over the (type, day, hod) buckets), flag buckets with
    //      |c − μ| > 3σ — the ops-monitoring twin of q_anomaly (which
    //      is value-level and season-blind). All inputs are exact
    //      integer counts (DECIMAL(38,0) accumulators — HUGEINT
    //      parity); the per-(type, hod) baseline table is
    //      types×24-bounded and broadcasts. Degenerate baselines
    //      (one observed day, zero variance) z-score to 0 under the
    //      computed-denominator guard, identically in both engines.
    "q_seasonal_anomaly" -> ((s, d) => {
      def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,0)"))
      val hc = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          hour(col("ts")).as("hod"))
        .agg(count(lit(1)).as("c"))
      val st = hc.groupBy("event_type", "hod").agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("c")).as("sc"),
        dsum(col("c") * col("c")).as("qc"))
      val varT =
        (col("qc").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") / col("n")) /
          (col("n") - 1)
      val z = when(col("n") > 1 && varT > 0,
        abs(col("c") - col("sc").cast("double") / col("n")) / sqrt(varT))
        .otherwise(lit(0.0))
      hc.join(broadcast(st), Seq("event_type", "hod"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(z > 3.0, 1L).otherwise(0L)).as("n_anomalous"),
          EngineNeutral.r4(max(z)).as("max_z"))
        .orderBy("event_type")
    }),

    // 158. Event-count Gini concentration per event type across USERS
    //      — "do a few users dominate this event stream" (bot/abuse
    //      and sampling-bias dashboards), the q_gini_tokens design on
    //      the events table: PrefixScan ranks (never a whole-userbase
    //      single-task sort), DECIMAL(38,0) rank·count sums, identical
    //      double association in both engines.
    "q_gini_users" -> ((s, d) => {
      val cnt = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      val (ranked, _) = graft.operators.PrefixScan.runningPerKey(
        cnt, Seq(col("event_type")), Seq(col("c"), col("user_id")),
        col("c"), "_run", "r")
      val g = ranked.groupBy("event_type").agg(
        sum("c").as("n_events"),
        count(lit(1)).as("n_users"),
        sum(col("r").cast("decimal(19,0)") * col("c")).as("src"))
      val gini =
        (lit(2.0) * col("src").cast("double") -
          (col("n_users") + 1).cast("double") * col("n_events").cast("double")) /
          (col("n_users").cast("double") * col("n_events").cast("double"))
      g.select(col("event_type"), col("n_events"), col("n_users"),
          EngineNeutral.roundHalfUp(gini, 6).as("gini"))
        .orderBy("event_type")
    }),

    // 155. Conditional bigram entropy per source:
    //      H(w₂|w₁) = Σ c₁₂·(ln c₁ − ln c₁₂) / N over the source's
    //      bigram types — how predictable the next token is given the
    //      current one; collapses toward 0 on templated/repeated text
    //      and complements q_entropy's unigram H and q_bigram_lm's
    //      per-doc scores with one corpus-level health number. Bigram
    //      and left-context counts are exact integers from map-side-
    //      combined aggregations; the c₁ join is bigram-type-scale
    //      (both sides pre-aggregated, one equi-key shuffle each).
    //      CONVENTION (ADVICE r18): bigram cells are keyed by 64-bit
    //      xxhash64, not exact token strings — a hash collision would
    //      silently merge two (t₁,t₂) cells and shift the entropy.
    //      Accepted under the shingle family's documented 2⁻⁶⁴
    //      collision convention (the output exposes only counts and
    //      entropy, never keys); this query stays in every full
    //      oracle gate as the standing check.
    "q_cond_entropy" -> ((s, d) => {
      // round-18: bigram keys from the k=1/k=2 shingle kernels, zipped
      // positionally (bh_i = xxhash64(t_i, t_{i+1}) = arr2[i], h1_i =
      // arr1[i]) — the former posexplode + per-doc window.lead shuffled
      // every token STRING through a doc_id exchange and sorted it,
      // just to form adjacent pairs. Counts are hash-keyed now (same
      // 2^-64 collision convention as the shingle family; the output
      // exposes only counts/entropy, never the keys).
      val arr1 = graft.plans.TextHashCols.shingleXx64(col("text"), 1, fallback = false)
      val arr2 = graft.plans.TextHashCols.shingleXx64(col("text"), 2, fallback = false)
      val bg = Tables.spread(Tables.documents(s, d))
        .select(col("source"),
          explode(arrays_zip(slice(arr1, lit(1), size(arr2)), arr2)).as("z"))
        .select(col("source"), col("z").getField("0").as("h1"),
          col("z").getField("1").as("h12"))
      val c12 = bg.groupBy("source", "h1", "h12").agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy("source", "h1").agg(sum("c12").as("c1"))
      // merge hint (the q_bigram_lm discipline): c1 is
      // vocabulary×sources-scale — small on the synthetic corpus, so
      // the planner would auto-broadcast it, but on a natural 100 TB
      // vocabulary it is NOT a broadcastable side; both sides arrive
      // pre-aggregated on the join key, so the sort-merge join is the
      // shape that survives scale
      c12.hint("merge").join(c1, Seq("source", "h1"))
        .groupBy("source")
        .agg(sum("c12").as("n_bigrams"),
          sum(col("c12").cast("double") *
            (log(col("c1").cast("double")) - log(col("c12").cast("double"))))
            .as("_h"))
        .select(col("source"), col("n_bigrams"),
          EngineNeutral.r4(col("_h") / col("n_bigrams").cast("double"))
            .as("h_cond"))
        .orderBy("source")
    }))

  /** The KS oracle, shared by q_ks_test (in-job scan) and
    * q_ks_test_indexed (persisted-profile path) — the two must produce
    * the identical result set (the bm25/bm25_indexed convention).
    */
  private val ksOracleSql: String =
      """WITH c AS (
        |  SELECT source, n_chars, count(*) AS c FROM documents
        |  GROUP BY source, n_chars
        |), xs AS (SELECT DISTINCT n_chars FROM c),
        |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM c GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM c),
        |grid AS (
        |  SELECT s.source, s.n_s, x.n_chars, coalesce(c.c, 0) AS c
        |  FROM srcs s CROSS JOIN xs x
        |  LEFT JOIN c ON c.source = s.source AND c.n_chars = x.n_chars
        |), cums AS (
        |  SELECT source, n_s, n_chars,
        |    CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
        |  FROM grid
        |), cumg AS (
        |  SELECT n_chars, CAST(sum(cum_s) AS BIGINT) AS cum_g FROM cums GROUP BY n_chars
        |)
        |SELECT source, max(n_s) AS n_docs,
        |  floor(max(abs(CAST(cum_s AS DOUBLE) / n_s -
        |    CAST(cum_g - cum_s AS DOUBLE) / (n_all - n_s))) * 1000000 + 0.5)
        |    / 1000000.0 AS ks
        |FROM cums JOIN cumg USING (n_chars) CROSS JOIN tot
        |WHERE n_all > n_s
        |GROUP BY source ORDER BY source""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ks_test" -> ksOracleSql,
    "q_ks_test_indexed" -> ksOracleSql,
    "q_gini_tokens" ->
      """WITH cnt AS (
        |  SELECT source, tok, count(*) AS c FROM (
        |    SELECT source,
        |      unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS tok
        |    FROM documents)
        |  GROUP BY source, tok
        |), ranked AS (
        |  SELECT source, c,
        |    row_number() OVER (PARTITION BY source ORDER BY c, tok) AS r
        |  FROM cnt
        |), g AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    count(*) AS vocab, sum(r * c) AS src
        |  FROM ranked GROUP BY source
        |)
        |SELECT source, n_tokens, vocab,
        |  floor((2.0 * CAST(src AS DOUBLE) -
        |         CAST(vocab + 1 AS DOUBLE) * CAST(n_tokens AS DOUBLE)) /
        |        (CAST(vocab AS DOUBLE) * CAST(n_tokens AS DOUBLE))
        |        * 1000000 + 0.5) / 1000000.0 AS gini
        |FROM g ORDER BY source""".stripMargin,
    "q_zipf_slope" ->
      """WITH cnt AS (
        |  SELECT source, tok, count(*) AS c FROM (
        |    SELECT source,
        |      unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS tok
        |    FROM documents)
        |  GROUP BY source, tok
        |), top AS (
        |  SELECT source, c,
        |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS r
        |  FROM cnt QUALIFY r <= 100
        |), xy AS (
        |  SELECT source, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
        |  FROM top
        |), f AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM xy GROUP BY source
        |)
        |SELECT source, CAST(n AS BIGINT) AS n_top,
        |  floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 10000 + 0.5)
        |    / 10000.0 AS zipf_slope
        |FROM f WHERE n >= 2 ORDER BY source""".stripMargin,
    "q_seasonal_anomaly" ->
      """WITH hc AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    hour(ts) AS hod, count(*) AS c
        |  FROM events GROUP BY event_type, day, hod
        |), st AS (
        |  SELECT event_type, hod, CAST(count(*) AS DOUBLE) AS n,
        |    sum(c) AS sc, sum(c * c) AS qc
        |  FROM hc GROUP BY event_type, hod
        |), z AS (
        |  SELECT hc.event_type,
        |    CASE WHEN n > 1 AND
        |      (CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1) > 0
        |    THEN abs(c - CAST(sc AS DOUBLE) / n) /
        |      sqrt((CAST(qc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n) / (n - 1))
        |    ELSE 0.0 END AS z
        |  FROM hc JOIN st ON hc.event_type = st.event_type AND hc.hod = st.hod
        |)
        |SELECT event_type, count(*) AS n_buckets,
        |  CAST(count(*) FILTER (WHERE z > 3.0) AS BIGINT) AS n_anomalous,
        |  floor(max(z) * 10000 + 0.5) / 10000.0 AS max_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_gini_users" ->
      """WITH cnt AS (
        |  SELECT event_type, user_id, count(*) AS c FROM events
        |  GROUP BY event_type, user_id
        |), ranked AS (
        |  SELECT event_type, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY c, user_id) AS r
        |  FROM cnt
        |), g AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_users, sum(r * c) AS src
        |  FROM ranked GROUP BY event_type
        |)
        |SELECT event_type, n_events, n_users,
        |  floor((2.0 * CAST(src AS DOUBLE) -
        |         CAST(n_users + 1 AS DOUBLE) * CAST(n_events AS DOUBLE)) /
        |        (CAST(n_users AS DOUBLE) * CAST(n_events AS DOUBLE))
        |        * 1000000 + 0.5) / 1000000.0 AS gini
        |FROM g ORDER BY event_type""".stripMargin,
    "q_cond_entropy" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    unnest(range(1, len(ts) + 1)) AS pos, unnest(ts) AS t
        |  FROM (SELECT source, doc_id,
        |          list_filter(string_split(text, ' '), x -> length(x) > 0) AS ts
        |        FROM documents)
        |), bg AS (
        |  SELECT source, t1, t2 FROM (
        |    SELECT source, t AS t1,
        |      lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        |    FROM toks)
        |  WHERE t2 IS NOT NULL
        |), c12 AS (
        |  SELECT source, t1, t2, count(*) AS c12 FROM bg GROUP BY source, t1, t2
        |), c1 AS (
        |  SELECT source, t1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY source, t1
        |)
        |SELECT source, CAST(sum(c12) AS BIGINT) AS n_bigrams,
        |  floor(sum(CAST(c12 AS DOUBLE) *
        |            (ln(CAST(c1 AS DOUBLE)) - ln(CAST(c12 AS DOUBLE))))
        |        / CAST(sum(c12) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS h_cond
        |FROM c12 JOIN c1 USING (source, t1)
        |GROUP BY source ORDER BY source""".stripMargin)
}
