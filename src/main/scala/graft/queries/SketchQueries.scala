package graft.queries

import graft.Tables
import graft.functions.{Dedup, EngineNeutral}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirteenth query wave — mergeable-sketch governance operators
  * (SURVEY.md §2 rows 143-145): corpus-level statistics whose state
  * is KILOBYTES regardless of corpus size, so they can be computed
  * once per shard/day, persisted, and rolled up by merging — the
  * q_hll_union lifecycle extended to similarity and quantiles.
  *
  * Scale notes: every operator here aggregates to a bounded
  * dimension (sources × 16 signature slots, sources × ≤70 decimal
  * buckets, sources × ~3 KB sketches) with map-side combine; raw
  * text/values never shuffle. The only join is over the aggregated
  * signature table — broadcast-sized at any corpus size.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** One-permutation MinHash signature slots per source (Li, Owen,
    * Zhang, "One Permutation Hashing", NIPS 2012): ONE md5 per
    * (source, shingle) occurrence, the hash's first hex digit picks
    * the signature bin (16 bins) and the per-bin minimum is the
    * slot — k=16 MinHash without k hash passes over the corpus.
    * Deliberately NO shingle distinct: min over the occurrence
    * multiset equals min over the set, so the signature aggregate is
    * map-side combinable and the shuffle is partitions × sources × 16
    * rows — shingle volume never crosses the wire.
    */
  private def sourceSignatures(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .withColumn("h", md5(col("shingle")))
      .withColumn("bin", conv(substring(col("h"), 1, 1), 16, 10).cast("int"))
      .groupBy("source", "bin").agg(min("h").as("sig"))

  val queries: Map[String, Q] = Map(
    // 143. Pairwise source-overlap estimation from mergeable MinHash
    //      signatures: est J(A,B) = (matching slots)/16. The signature
    //      table is sources×16 rows — the pairwise comparison costs
    //      nothing at ANY corpus size, vs the exact shingle-join
    //      (q_source_leakage) whose cost is shared-shingle-volume.
    //      Signatures are mergeable (slot-wise min), so per-shard
    //      signatures roll up without re-reading text.
    "q_source_minhash_overlap" -> ((s, d) => {
      // persist the AGGREGATED signature table (sources × 16 rows):
      // it feeds BOTH self-join sides, and without the persist each
      // side re-executes the corpus-scale shingle explode + md5 — the
      // query's entire cost — on EVERY evaluation (measured: warm
      // runs drop 24.5 s → 0.7 s at sf1; the first evaluation still
      // pays the build once — the async broadcast build can race
      // cache population, so it may pay twice there). The cached
      // footprint is bounded at any corpus size; CacheHandles
      // releases it between bench queries.
      val sig = graft.plans.CacheHandles.track("query.minhash.sigs",
        sourceSignatures(Tables.documents(s, d))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))
      val a = sig.select(col("source").as("source_a"), col("bin"),
        col("sig").as("sig_a"))
      val b = sig.select(col("source").as("source_b"), col("bin"),
        col("sig").as("sig_b"))
      // explicit broadcast: the signature table is sources × 16 rows
      // AFTER aggregation — a bounded dimension at any corpus size —
      // but its lineage contains the shingle explode, so the hint
      // marks the bound deliberate (ScaleGuard refuses UNHINTED
      // broadcast-of-explode build sides)
      a.join(broadcast(b), Seq("bin"))
        .filter(col("source_a") < col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(sum(when(col("sig_a") === col("sig_b"), 1L).otherwise(0L))
          .as("n_match"))
        .withColumn("est_jaccard",
          EngineNeutral.r4(col("n_match").cast("double") / lit(16.0)))
        .orderBy("source_a", "source_b")
    }),

    // 144. Decimal-HDR quantile estimation (HdrHistogram's
    //      exponent+mantissa bucketing in base 10): n_chars buckets to
    //      (leading digit, decade) — a ≤ 9·#decades-entry histogram
    //      per source — and quantile estimates read off the cumulative
    //      counts as the smallest bucket LOWER BOUND covering the
    //      target rank. Deterministic, mergeable (counts), pure
    //      integer arithmetic end to end (bucket bounds via string
    //      padding, rank tests cross-multiplied) — bit-exact across
    //      engines, unlike any log()-based bucketing.
    "q_quantile_sketch" -> ((s, d) => {
      val b = Tables.documents(s, d)
        .withColumn("v", col("n_chars").cast("string"))
        .withColumn("lb",
          concat(substring(col("v"), 1, 1),
            repeat(lit("0"), length(col("v")) - 1)).cast("long"))
      val hist = b.groupBy("source", "lb").agg(count(lit(1)).as("c"))
      val cum = hist
        .withColumn("cum",
          sum("c").over(Window.partitionBy("source").orderBy("lb")))
        .withColumn("n", sum("c").over(Window.partitionBy("source")))
      cum.groupBy("source").agg(
        min(when(col("cum") * 2 >= col("n"), col("lb"))).as("est_p50"),
        min(when(col("cum") * 10 >= col("n") * 9, col("lb"))).as("est_p90"),
        min(when(col("cum") * 100 >= col("n") * 99, col("lb"))).as("est_p99"))
        .orderBy("source")
    }),

    // 145. KLL quantile sketches (rows-only #13): per-source KLL
    //      sketches of n_chars plus the ALL row produced by MERGING
    //      the per-source sketch bytes — the distributive-rollup law
    //      the persisted lifecycle relies on. Randomized compaction →
    //      no portable SQL; SketchQueriesSpec pins the ≤2% normalized
    //      rank error bound and merge-vs-direct agreement.
    "q_kll_quantiles" -> ((s, d) => {
      import graft.plans.KllQuantiles._
      val per = Tables.documents(s, d)
        .groupBy("source")
        .agg(kll_sketch_agg(col("n_chars").cast("double")).as("sk"))
      val all = per.agg(kll_merge_agg(col("sk")).as("sk"))
        .withColumn("source", lit("ALL"))
      per.unionByName(all)
        .select(col("source"),
          kll_quantiles(col("sk"), Seq(0.5, 0.9, 0.99)).as("qs"))
        .select(col("source"),
          col("qs").getItem(0).as("est_p50"),
          col("qs").getItem(1).as("est_p90"),
          col("qs").getItem(2).as("est_p99"))
        .orderBy("source")
    }))

  val oracles: Map[String, String] = Map(
    "q_source_minhash_overlap" ->
      """WITH sh AS (
        |  SELECT DISTINCT source, shingle FROM (
        |    SELECT source, unnest(CASE WHEN len(toks) >= 3
        |      THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      ELSE [array_to_string(toks, ' ')] END) AS shingle
        |    FROM (SELECT source, list_filter(string_split(text, ' '), t -> length(t) > 0) AS toks
        |          FROM documents))
        |), sig AS (
        |  SELECT source, ('0x' || substr(md5(shingle), 1, 1))::BIGINT AS bin,
        |         min(md5(shingle)) AS sig
        |  FROM sh GROUP BY source, bin
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) FILTER (WHERE a.sig = b.sig) AS BIGINT) AS n_match,
        |  floor((count(*) FILTER (WHERE a.sig = b.sig)) / 16.0 * 10000 + 0.5) / 10000.0 AS est_jaccard
        |FROM sig a JOIN sig b ON a.bin = b.bin AND a.source < b.source
        |GROUP BY a.source, b.source ORDER BY source_a, source_b""".stripMargin,
    "q_quantile_sketch" ->
      """WITH h AS (
        |  SELECT source,
        |    CAST(substr(CAST(n_chars AS VARCHAR), 1, 1) ||
        |         repeat('0', length(CAST(n_chars AS VARCHAR)) - 1) AS BIGINT) AS lb,
        |    count(*) AS c
        |  FROM documents GROUP BY source, lb
        |), cum AS (
        |  SELECT source, lb,
        |    sum(c) OVER (PARTITION BY source ORDER BY lb) AS cum,
        |    sum(c) OVER (PARTITION BY source) AS n
        |  FROM h
        |)
        |SELECT source,
        |  CAST(min(CASE WHEN cum * 2 >= n THEN lb END) AS BIGINT) AS est_p50,
        |  CAST(min(CASE WHEN cum * 10 >= n * 9 THEN lb END) AS BIGINT) AS est_p90,
        |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN lb END) AS BIGINT) AS est_p99
        |FROM cum GROUP BY source ORDER BY source""".stripMargin)
}
