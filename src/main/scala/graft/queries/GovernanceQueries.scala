package graft.queries

import graft.Tables
import graft.functions.{Dedup, EngineNeutral}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth query wave: corpus-governance and reporting shapes — the
  * recurring "what changed / how dirty / how skewed is the corpus"
  * jobs a training-data pipeline runs between ingests. Each is a
  * plan shape the earlier waves lack as a compound:
  *
  *  - snapshot diff: full-outer reconciliation of two crawls where
  *    the shuffle carries (id, 16-byte content hash), never text —
  *    the only way a 100 TB-vs-100 TB diff is feasible;
  *  - dup-rate report: per-source two-phase distinct on the content
  *    hash (partial distinct map-side, exact global count);
  *  - degree distribution: the power-law sanity check — two chained
  *    map-side-combinable aggregations, output bounded by distinct
  *    degree values;
  *  - grouped regression: single-pass sufficient statistics
  *    (n, Σx, Σy, Σxy, Σx²) — the textbook distributed OLS form, one
  *    shuffle of five doubles per group;
  *  - MAD outliers: robust dispersion via two exact-median passes
  *    with the tiny per-group stats broadcast back (at >memory group
  *    cardinality swap `percentile` for `approx_percentile` — MAD
  *    tolerates quantile error; exact here so DuckDB reproduces it).
  */
object GovernanceQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 16-byte content fingerprint; hashing before any join/groupBy is
    * what keeps every shuffle in this wave text-free.
    */
  private def contentHash = md5(col("text").cast("binary"))

  /** The 3-feature Gram/moment aggregation behind q_ridge_regress,
    * extracted so RidgeSpec can drive it past 2⁵³ with synthetic rows:
    * input (source, z1, z2, y) as longs; output the ten per-group
    * sums. Per-row products stay in long arithmetic (cheap, exact for
    * feature magnitudes ≲ 2³¹); the ACCUMULATORS are DECIMAL(38,0) —
    * Spark's exact 128-bit-backed integer sum, the engine-parity twin
    * of DuckDB's HUGEINT — because at 100 TB row counts the sums
    * themselves pass 2⁵³, where a long sum would silently wrap and a
    * double sum would silently round.
    */
  private[graft] def gramAggregate(z: DataFrame): DataFrame = {
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,0)"))
    z.groupBy("source").agg(
      count(lit(1)).as("g00"),
      dsum(col("z1")).as("g01"), dsum(col("z2")).as("g02"),
      dsum(col("z1") * col("z1")).as("g11"),
      dsum(col("z1") * col("z2")).as("g12"),
      dsum(col("z2") * col("z2")).as("g22"),
      dsum(col("y")).as("b0"),
      dsum(col("z1") * col("y")).as("b1"),
      dsum(col("z2") * col("y")).as("b2"))
  }

  val queries: Map[String, Q] = Map(
    // 100. Corpus snapshot diff: reconcile two crawl snapshots into
    //     added/removed/changed/unchanged counts. The two snapshots
    //     are deterministic slices of `documents` (disjoint 10% drop
    //     each side; every 7th doc "re-crawled" with edited content)
    //     so DuckDB reproduces them exactly. Text is reduced to md5
    //     in the scan stage — the full-outer join and everything
    //     after it moves 24-byte rows.
    "q_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val a = docs.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), contentHash.as("hash_a"))
      val b = docs.filter(col("doc_id") % 10 =!= 1)
        .select(col("doc_id"),
          md5(concat(col("text"),
            when(col("doc_id") % 7 === 0, lit("~edit")).otherwise(lit("")))
            .cast("binary")).as("hash_b"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(when(col("hash_a").isNull, lit("added"))
          .when(col("hash_b").isNull, lit("removed"))
          .when(col("hash_a") =!= col("hash_b"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),

    // 101. Duplication-rate report per source: the corpus-health
    //     number dedup decisions are made from. count(distinct md5)
    //     is a two-phase aggregate (map-side partial distinct), so
    //     the shuffle is unique-hash-proportional, not row-
    //     proportional.
    "q_dup_rate" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("source"), contentHash.as("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), countDistinct(col("h")).as("n_unique"))
        .withColumn("dup_rate",
          EngineNeutral.r4((col("n_docs") - col("n_unique")) / col("n_docs")))
        .orderBy("source")
    }),

    // 101b. Near-dup cluster-size distribution (round 18): the
    //     governance face of q_dedup_clusters — per cluster size s,
    //     how many clusters, how many docs they hold, and the excess
    //     (docs a keep-one dedup would remove). The number that says
    //     whether duplication is a long tail of pairs or a few huge
    //     boilerplate families — which decides pair-verify vs
    //     cluster-collapse strategy BEFORE a 100 TB dedup run. The
    //     heavy lifting (edges + connected components) is the same
    //     bounded machinery as q_dedup_clusters; this adds one
    //     cluster-count-sized aggregation (output ≤ distinct sizes).
    "q_cluster_size_dist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.sharedShingleEdges(docs, "doc_id", "text",
        shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
      val comps = graft.operators.ConnectedComponents.labelPropagation(
        docs.select(col("doc_id").as("id")), edges)
      comps.groupBy("comp").agg(count(lit(1)).as("n_docs"))
        .groupBy("n_docs").agg(count(lit(1)).as("n_clusters"))
        .select(col("n_docs"), col("n_clusters"),
          (col("n_docs") * col("n_clusters")).as("docs_total"),
          ((col("n_docs") - 1) * col("n_clusters")).as("excess_docs"))
        .orderBy("n_docs")
    }),

    // 102. Degree distribution of the user->event interaction graph:
    //     degree per user, then users per degree. Both aggregations
    //     map-side combine; the second one's input is already one row
    //     per user. The shape that catches power-law skew before a
    //     per-user join explodes on the head vertices.
    "q_degree_dist" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_users"))
        .orderBy("degree")
    }),

    // 103. Grouped linear regression (value vs hour-of-day per event
    //     type) from single-pass sufficient statistics — n, Σx, Σy,
    //     Σxy, Σx² combine associatively, so one map-side-combined
    //     shuffle of five doubles per group covers any data size.
    //     Slope/intercept are derived AFTER aggregation from the same
    //     frame; EngineNeutral rounding because sums of doubles are
    //     order-dependent across engines.
    "q_group_regress" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("event_type"),
        hour(col("ts")).cast("double").as("x"), col("value").as("y"))
      val stats = e.groupBy("event_type").agg(
        count(lit(1)).cast("double").as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      stats.select(col("event_type"),
        EngineNeutral.r4(slope).as("slope"),
        EngineNeutral.r4((col("sy") - slope * col("sx")) / col("n")).as("icept"))
        .orderBy("event_type")
    }),

    // 147. Grouped multi-feature RIDGE regression from one Gram-matrix
    //      aggregation (the normal-equations trick distributed): per
    //      source, fit n_tokens ~ w0 + w1·n_chars + w2·n_spaces by
    //      accumulating the 3×3 Gram matrix Σzᵢzⱼ and moment vector
    //      Σzᵢy in ONE map-side-combined shuffle of ten numbers per
    //      group, then solving (G + λI)w = b in closed form (Cramer,
    //      3×3). EVERY accumulated sum is EXACT at any corpus size:
    //      per-row products are longs (features × label ≲ 2⁴⁰), and
    //      the accumulators are DECIMAL(38,0) — exact integer addition
    //      to 10³⁸, i.e. sf-anything — matching DuckDB's exact HUGEINT
    //      sums. Both engines then cast the identical integer to
    //      double (round-to-nearest of the same value) and enter the
    //      solve with bit-identical doubles: float parity by
    //      construction, not by rounding, past 2⁵³ too (RidgeSpec
    //      pins decimal ≡ long at current SFs and exactness beyond
    //      2⁵³ where long sums would silently wrap). At 100 TB this is
    //      the canonical "fit a model per segment" shape: shuffle ∝
    //      groups, never rows.
    "q_ridge_regress" -> ((s, d) => {
      val z = Tables.documents(s, d).select(
        col("source"),
        col("n_chars").as("z1"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
          .cast("long").as("z2"),
        // round-18: token-count kernel ≡ size(tokens) (TextHashSpec)
        graft.plans.TextHashCols.tokenCount(col("text")).cast("long").as("y"))
      val g = gramAggregate(z)
      // ridge: λ=1 on the diagonal, exact integer adds
      val a00 = (col("g00") + lit(1L)).cast("double")
      val a11 = (col("g11") + lit(1L)).cast("double")
      val a22 = (col("g22") + lit(1L)).cast("double")
      val a01 = col("g01").cast("double"); val a02 = col("g02").cast("double")
      val a12 = col("g12").cast("double")
      val b0 = col("b0").cast("double"); val b1 = col("b1").cast("double")
      val b2 = col("b2").cast("double")
      def det3(m00: org.apache.spark.sql.Column, m01: org.apache.spark.sql.Column,
               m02: org.apache.spark.sql.Column, m10: org.apache.spark.sql.Column,
               m11: org.apache.spark.sql.Column, m12: org.apache.spark.sql.Column,
               m20: org.apache.spark.sql.Column, m21: org.apache.spark.sql.Column,
               m22: org.apache.spark.sql.Column) =
        m00 * (m11 * m22 - m12 * m21) -
          m01 * (m10 * m22 - m12 * m20) +
          m02 * (m10 * m21 - m11 * m20)
      val det = det3(a00, a01, a02, a01, a11, a12, a02, a12, a22)
      val d0 = det3(b0, a01, a02, b1, a11, a12, b2, a12, a22)
      val d1 = det3(a00, b0, a02, a01, b1, a12, a02, b2, a22)
      val d2 = det3(a00, a01, b0, a01, a11, b1, a02, a12, b2)
      g.select(col("source"),
        EngineNeutral.r4(d0 / det).as("w0"),
        EngineNeutral.r4(d1 / det).as("w1"),
        EngineNeutral.r4(d2 / det).as("w2"))
        .orderBy("source")
    }),

    // 104. Robust outlier counts per language: median + MAD (median
    //     absolute deviation), |x - med| > 1.5·MAD (the test corpus'
    //     n_chars is near-uniform, so the usual 3·MAD can never fire
    //     — 1.5 keeps the gate sensitive to both tails). Two exact-median
    //     passes; the per-group (med, mad) table is a handful of rows
    //     and broadcasts back, so the big side never re-shuffles.
    //     Exact `percentile` is used so the oracle can reproduce it;
    //     at larger group cardinality approx_percentile is the
    //     drop-in scale path (MAD tolerates quantile error).
    "q_mad_outlier" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("n_chars").cast("double").as("x"))
      val med = docs.groupBy("lang").agg(expr("percentile(x, 0.5)").as("med"))
      val stats = docs.join(broadcast(med), Seq("lang"))
        .select(col("lang"), col("med"), abs(col("x") - col("med")).as("adev"))
        .groupBy("lang").agg(max("med").as("med"),
          expr("percentile(adev, 0.5)").as("mad"))
      docs.join(broadcast(stats), Seq("lang"))
        .groupBy(col("lang"), col("med"), col("mad"))
        .agg(count(when(abs(col("x") - col("med")) > lit(1.5) * col("mad"),
          lit(1))).as("n_outliers"))
        .orderBy("lang")
    }),

    // 111. Cross-source leakage matrix: for every ordered pair of
    //     sources, how many of a's distinct 5-grams also appear in b
    //     (and the fraction of a that is). Per-doc decontamination
    //     (q_decontam_overlap) gates ONE benchmark; this is the
    //     corpus-governance view — which ingest feeds duplicate which
    //     (a mirror crawl, an eval suite that leaked into a crawl, a
    //     source that republishes another). Scale shape: grams reduce
    //     to 8-byte xxhash64 in the scan stage; source re-attaches by
    //     a partition-aligned merge join on the doc id; the per-gram
    //     self-join fans out at most (#sources)² — BOUNDED by the
    //     source count, independent of corpus size, so a boilerplate
    //     gram in every document costs #sources rows, not #docs. The
    //     per-source totals are #sources rows and broadcast back.
    "q_source_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val grams = Dedup.spanRows(docs, "doc_id", "text", 5)
        .dropDuplicates("id", "h")
        .join(docs.select(col("doc_id").as("id"), col("source")).hint("merge"),
          Seq("id"))
        .select("source", "h").distinct()
      val tot = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
      grams.select(col("h"), col("source").as("src_a"))
        .hint("merge")
        .join(grams.select(col("h"), col("source").as("src_b")), "h")
        .filter(col("src_a") =!= col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared_grams"))
        .join(broadcast(tot.select(col("source").as("src_a"), col("n_grams"))),
          Seq("src_a"))
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          (col("shared_grams") / col("n_grams")).as("frac_of_a"))
        .orderBy("src_a", "src_b")
    }))

  val oracles: Map[String, String] = Map(
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(text) AS hash_a FROM documents WHERE doc_id % 10 <> 0),
        |b AS (
        |  SELECT doc_id,
        |    md5(text || CASE WHEN doc_id % 7 = 0 THEN '~edit' ELSE '' END) AS hash_b
        |  FROM documents WHERE doc_id % 10 <> 1)
        |SELECT CASE WHEN hash_a IS NULL THEN 'added'
        |            WHEN hash_b IS NULL THEN 'removed'
        |            WHEN hash_a <> hash_b THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |  count(*) AS n
        |FROM a FULL OUTER JOIN b USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dup_rate" ->
      s"""SELECT source, count(*) AS n_docs,
         |  count(DISTINCT md5(text)) AS n_unique,
         |  ${EngineNeutral.sql(
            "(count(*) - count(DISTINCT md5(text))) / count(*)", 4)} AS dup_rate
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_degree_dist" ->
      """SELECT degree, count(*) AS n_users FROM (
        |  SELECT user_id, count(*) AS degree FROM events GROUP BY user_id)
        |GROUP BY degree ORDER BY degree""".stripMargin,
    // same recursive min-label closure as the q_dedup_clusters oracle,
    // rolled up once more to the size distribution
    "q_cluster_size_dist" ->
      """WITH RECURSIVE sh AS (
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
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION ALL SELECT id_b, id_a FROM edges
        |), walk(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT w.id, s.dst FROM walk w JOIN sym s ON s.src = w.r
        |), comps AS (
        |  SELECT id, min(r) AS comp FROM walk GROUP BY id
        |), clusters AS (
        |  SELECT comp, count(*) AS n_docs FROM comps GROUP BY comp
        |)
        |SELECT n_docs, count(*) AS n_clusters,
        |  n_docs * count(*) AS docs_total,
        |  (n_docs - 1) * count(*) AS excess_docs
        |FROM clusters GROUP BY n_docs ORDER BY n_docs""".stripMargin,
    // parity with the Spark side is EXACT: every Gram/moment sum is
    // an integer, both engines cast the identical values to double,
    // and the determinant expressions use the identical
    // parenthesization — IEEE arithmetic then matches bit for bit
    "q_ridge_regress" -> {
      def det3(m: Seq[String]) =
        s"${m(0)} * (${m(4)} * ${m(8)} - ${m(5)} * ${m(7)}) - " +
          s"${m(1)} * (${m(3)} * ${m(8)} - ${m(5)} * ${m(6)}) + " +
          s"${m(2)} * (${m(3)} * ${m(7)} - ${m(4)} * ${m(6)})"
      val det = det3(Seq("a00", "a01", "a02", "a01", "a11", "a12", "a02", "a12", "a22"))
      val d0 = det3(Seq("b0", "a01", "a02", "b1", "a11", "a12", "b2", "a12", "a22"))
      val d1 = det3(Seq("a00", "b0", "a02", "a01", "b1", "a12", "a02", "b2", "a22"))
      val d2 = det3(Seq("a00", "a01", "b0", "a01", "a11", "b1", "a02", "a12", "b2"))
      s"""WITH z AS (
         |  SELECT source, n_chars AS z1,
         |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS z2,
         |    CAST(len(list_filter(string_split(text, ' '), t -> length(t) > 0)) AS BIGINT) AS y
         |  FROM documents
         |), g AS (
         |  SELECT source,
         |    CAST(count(*) + 1 AS DOUBLE) AS a00,
         |    CAST(sum(z1) AS DOUBLE) AS a01,
         |    CAST(sum(z2) AS DOUBLE) AS a02,
         |    CAST(sum(z1 * z1) + 1 AS DOUBLE) AS a11,
         |    CAST(sum(z1 * z2) AS DOUBLE) AS a12,
         |    CAST(sum(z2 * z2) + 1 AS DOUBLE) AS a22,
         |    CAST(sum(y) AS DOUBLE) AS b0,
         |    CAST(sum(z1 * y) AS DOUBLE) AS b1,
         |    CAST(sum(z2 * y) AS DOUBLE) AS b2
         |  FROM z GROUP BY source
         |)
         |SELECT source,
         |  ${EngineNeutral.sql(s"($d0) / ($det)", 4)} AS w0,
         |  ${EngineNeutral.sql(s"($d1) / ($det)", 4)} AS w1,
         |  ${EngineNeutral.sql(s"($d2) / ($det)", 4)} AS w2
         |FROM g ORDER BY source""".stripMargin
    },
    "q_group_regress" -> {
      val slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
      s"""WITH stats AS (
         |  SELECT event_type, count(*) * 1.0 AS n,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
         |  FROM (SELECT event_type, hour(ts) * 1.0 AS x, value AS y FROM events)
         |  GROUP BY event_type)
         |SELECT event_type,
         |  ${EngineNeutral.sql(slope, 4)} AS slope,
         |  ${EngineNeutral.sql(s"(sy - ($slope) * sx) / n", 4)} AS icept
         |FROM stats ORDER BY event_type""".stripMargin
    },
    "q_mad_outlier" ->
      """WITH docs AS (SELECT lang, n_chars * 1.0 AS x FROM documents),
        |med AS (SELECT lang, quantile_cont(x, 0.5) AS med FROM docs GROUP BY lang),
        |stats AS (
        |  SELECT d.lang, max(m.med) AS med,
        |    quantile_cont(abs(d.x - m.med), 0.5) AS mad
        |  FROM docs d JOIN med m ON d.lang = m.lang GROUP BY d.lang)
        |SELECT s.lang, s.med, s.mad,
        |  count(CASE WHEN abs(d.x - s.med) > 1.5 * s.mad THEN 1 END) AS n_outliers
        |FROM docs d JOIN stats s ON d.lang = s.lang
        |GROUP BY s.lang, s.med, s.mad
        |ORDER BY s.lang""".stripMargin,
    // gram parity with the Spark side is at the STRING level (the
    // Spark side counts distinct xxhash64 gram keys) — identical
    // counts modulo 2⁻⁶⁴ collisions, the span-family convention
    "q_source_leakage" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
        |  FROM documents
        |), s AS (
        |  SELECT DISTINCT source, g FROM (
        |    SELECT source, unnest(
        |      [array_to_string(toks[i+1:i+5], ' ')
        |       FOR i IN range(0, len(toks) - 4)]) AS g
        |    FROM t WHERE len(toks) >= 5)
        |), tot AS (
        |  SELECT source, count(*) AS n FROM s GROUP BY 1
        |), pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared_grams
        |  FROM s a JOIN s b ON a.g = b.g AND a.source <> b.source
        |  GROUP BY 1, 2
        |)
        |SELECT p.src_a, p.src_b, p.shared_grams,
        |  p.shared_grams::DOUBLE / t.n AS frac_of_a
        |FROM pairs p JOIN tot t ON t.source = p.src_a
        |ORDER BY 1, 2""".stripMargin)
}
