package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: segment-level
  * dedup, repetition quality stats (Gopher-style), tf-idf keywording,
  * benchmark-contamination checks, and deterministic hash
  * sampling/splitting.
  *
  * Scale design: every operator shuffles fixed-width keys (64-bit
  * hashes, doc ids) rather than text; per-doc stats are computed with
  * explode + codegen'd aggregates (Spark's array higher-order functions
  * are interpreted); sampling/splitting are pure column expressions
  * (zero shuffle, deterministic given the content hash — re-running the
  * pipeline on a grown corpus keeps prior assignments stable).
  */
object Curation {

  /** The curation funnel's LM-gate cutoff: keep documents whose
    * r6-rounded mean unigram NLL is ≤ this (high mean NLL = the LM
    * finds the text surprising = the CCNet tail bucket). 3.41 sits in
    * a measured gap of the corpus's NLL distribution — it drops the
    * ~5% tail at every tested scale (sf0.001/0.01/1) while the bulk
    * (median ≈ 3.40) passes; a production pipeline tunes this per
    * corpus exactly like CCNet tunes its perplexity cutoffs. The
    * comparison is engine-safe because both engines round the per-doc
    * mean to 6 decimals first (the q_lm_score precedent).
    */
  val CurateNllMax: Double = 3.41

  /** Persist a unigram LM (token → NLL under the training corpus's
    * empirical distribution) as a [[graft.operators.Versioned]]
    * `vocab/` table — the frozen REFERENCE model the streaming
    * curation funnel scores against (CCNet scores web text against an
    * LM trained on a fixed clean corpus; freezing is also what makes
    * streaming verdicts replay-stable). The vocabulary aggregate is
    * one map-side-combined shuffle on the token; the model table is
    * vocabulary-bounded and broadcasts at serve time.
    */
  def writeLmModel(docs: DataFrame, textCol: String, path: String): String = {
    val spark = docs.sparkSession
    graft.operators.Versioned.commitNew(spark, path) { dir =>
      val toks = graft.Tables.spread(docs)
        .select(explode(Dedup.tokens(col(textCol))).as("t"))
      val vocab = toks.groupBy("t").agg(count(lit(1)).as("c"))
      val total = vocab.agg(sum("c").as("n_total"))
      vocab.crossJoin(broadcast(total))
        .select(col("t"),
          (-log(col("c").cast("double") / col("n_total"))).as("nll"))
        .write.parquet(s"$dir/vocab")
    }
  }

  /** The (t, nll) model table of a committed LM version dir. */
  def readLmModel(spark: org.apache.spark.sql.SparkSession,
                  versionDir: String): DataFrame =
    spark.read.parquet(s"$versionDir/vocab")

  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Fixed-length token segments (last one may be shorter). The
    * corpus-dedup unit used by CCNet-style line/paragraph dedup; this
    * corpus has no newlines, so segmentation is positional.
    */
  def segments(textCol: Column, segLen: Int): Column = {
    val ts = Dedup.tokens(textCol)
    // sequence(0, -1) would yield [0, -1] (negative step), so guard empties
    when(size(ts) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), ceil(size(ts) / lit(segLen.toDouble)).cast("int") - 1),
        i => concat_ws(" ", slice(ts, i * segLen + 1, lit(segLen)))))
  }

  /** Corpus-wide segment dedup, keep-first: a segment occurrence
    * survives iff it is the first occurrence of that segment text in
    * (doc id, position) order. Returns per-doc totals
    * (doc_id, n_segs, n_kept).
    *
    * The winner per segment hash is its min (doc id, position) — a
    * map-side-combinable `min(struct)` groupBy merge-joined back
    * ([[graft.functions.Dedup.joinKeyStats]]; shuffle bytes ∝ segment
    * count × 24 B, never corpus bytes), NOT a row_number window: a
    * boilerplate segment present in millions of docs would buffer its
    * whole window group in one task. Then one groupBy(doc) for totals.
    */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
                   segLen: Int = 8): DataFrame = {
    val spread = df.repartition(par(df), col(idCol))
    val segs = spread
      .select(col(idCol).as("id"),
        posexplode(segments(col(textCol), segLen)).as(Seq("seg_idx", "seg")))
      .select(col("id"), col("seg_idx"), xxhash64(col("seg")).as("h"))
    // (id, seg_idx) is unique per row, so exactly one occurrence
    // equals the min struct — identical keep-first semantics to the
    // old row_number === 1
    Dedup.joinKeyStats(segs, "h",
        Seq(min(struct(col("id"), col("seg_idx"))).as("_first")))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("id") === col("_first").getField("id") &&
          col("seg_idx") === col("_first").getField("seg_idx"), 1)).as("n_kept"))
  }

  /** Gopher-style repetition stats per document: duplicate-token
    * fraction and the share of tokens covered by the most frequent
    * bigram. High values flag low-quality repetitive text.
    *
    * Bigrams are hashed from adjacent exploded tokens (window lead) —
    * no bigram string is materialized; the (doc, bigram-hash) counts
    * aggregate map-side before the per-doc max.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.repartition(par(df), col(idCol))
    val ts = Dedup.tokens(col(textCol))
    val base = keyed.select(col(idCol).as("doc_id"),
      size(ts).as("n_tokens"), size(array_distinct(ts)).as("n_distinct"),
      ts.as("ts"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = base
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("pos", "t")))
      .select(col("doc_id"), lead(col("t"), 1).over(w).as("t2"), col("t"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), xxhash64(col("t"), col("t2")).as("bh"))
    val top = bigrams
      .groupBy("doc_id", "bh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_n"))
    // both sides are doc-keyed explode descendants already
    // hash-partitioned by doc_id — merge reuses that partitioning and
    // keeps tiny-SF stats from broadcasting an exploded subtree
    base.select(col("doc_id"), col("n_tokens"), col("n_distinct"))
      .join(top.hint("merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        EngineNeutral.r4(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
          .as("dup_token_frac"),
        coalesce(col("top_n"), lit(0L)).as("top_bigram_n"),
        EngineNeutral.r4(coalesce(col("top_n"), lit(0L)) * lit(2.0) / col("n_tokens"))
          .as("top_bigram_frac"))
  }

  /** Top-k tokens per document by tf-idf (idf = ln(N/df), df over the
    * whole corpus). `docFilter` restricts which documents are scored
    * (pushed to the scan) without changing the corpus statistics.
    *
    * The document-frequency table is vocabulary-sized and the tf side
    * corpus-sized — both explode descendants that can be large at
    * corpus scale, so their join is merge-hinted (they share
    * hashpartitioning(tok) from their own aggregations; a tiny-SF
    * size estimate must not ride either into a broadcast build).
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
                docFilter: Column): DataFrame = {
    val tok = df.repartition(par(df), col(idCol))
      .select(col(idCol).as("doc_id"), explode(Dedup.tokens(col(textCol))).as("tok"))
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val ndocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.filter(docFilter)
      .join(dfreq.hint("merge"), "tok")
      .crossJoin(broadcast(ndocs))
      .select(col("doc_id"), col("tok"),
        EngineNeutral.r4(col("tf") * log(col("n_docs").cast("double") / col("df")))
          .as("tfidf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok"), col("tfidf"))
  }

  /** Benchmark-contamination check: for each corpus document, how many
    * distinct k-gram shingles it shares with the benchmark set, and
    * with how many benchmark documents. Standard eval-leakage scan.
    *
    * The benchmark side is broadcast — benchmark suites are tiny
    * relative to a training corpus, so the corpus side streams through
    * map-side hash probes with no shuffle of corpus shingles. Both
    * sides shingle via [[Dedup.shingleHashes]]: the join key and both
    * countDistincts operate on 64-bit hashes, so no shingle STRING is
    * ever materialized, joined, or aggregated — counts are identical
    * to the string-set semantics modulo 2⁻⁶⁴ hash collisions.
    */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, shingleK: Int = 3): DataFrame = {
    val c = Dedup.shingleHashes(corpus, idCol, textCol, shingleK)
      .select(col("id").as("doc_id"), col("h"))
    // shingleHashes keeps duplicate shingles; dedupe the broadcast side
    // so the probe's join fan-out is per distinct benchmark shingle
    val b = Dedup.shingleHashes(bench, idCol, textCol, shingleK)
      .select(col("id").as("bench_id"), col("h"))
      .dropDuplicates("bench_id", "h")
    c.join(broadcast(b), "h")
      .groupBy("doc_id")
      .agg(countDistinct("h").as("n_shared"),
        countDistinct("bench_id").as("n_bench_docs"))
  }

  /** Benchmark-set decontamination: for each corpus document, the
    * fraction of its distinct k-word grams that appear anywhere in the
    * benchmark/eval set — the train-test leakage scan run before any
    * data release (cf. the n-gram overlap decontamination used for
    * GPT-3/Gopher-style corpora; 13-gram at web scale). Reports EVERY
    * corpus doc, including 0-overlap ones, so release gates can
    * threshold on `overlap_frac` downstream.
    *
    * `bench` is an explicit separate table — eval suites are megabytes
    * against a 100 TB corpus, so its distinct gram set is
    * hint-broadcast BY CONSTRUCTION (the bound is structural, not a
    * planner estimate) and the corpus side streams through a map-side
    * hash probe: one pass over the corpus tokens, grams reduced to
    * 64-bit xxhash64 in the scan stage (counts identical to string
    * semantics modulo 2⁻⁶⁴ collisions), corpus text never shuffles,
    * and the only exchange is the per-doc aggregation — which reuses
    * [[Dedup.spanRows]]' doc-id partitioning, so nothing re-shuffles.
    *
    * Returns (idCol, n_grams, n_hit, overlap_frac); docs shorter than
    * k words have no grams and are absent (nothing to leak).
    */
  def decontamOverlap(corpus: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String, k: Int): DataFrame =
    decontamOverlapGrams(corpus,
      Dedup.spanRows(bench, idCol, textCol, k).select(col("h")).distinct(),
      idCol, textCol, k)

  /** [[decontamOverlap]]'s probe half against a gram hash table
    * `benchGrams` (column `h`) — the persisted-index face: build the
    * gram set once with [[writeDecontamIndex]], then score any corpus
    * (or any micro-batch: [[graft.streaming.Streams.decontamIngest]])
    * against it without re-shingling the benchmark.
    */
  def decontamOverlapGrams(corpus: DataFrame, benchGrams: DataFrame,
                           idCol: String, textCol: String, k: Int): DataFrame = {
    // defensive distinct: a hand-built gram table with duplicate h
    // values would inflate BOTH n_grams and n_hit through left-join
    // multiplicity; the bench side is broadcast-sized (eval suites are
    // MBs), so the extra dedup is negligible
    val bg = benchGrams.select(col("h")).distinct().withColumn("hit", lit(1))
    Dedup.spanRows(corpus, idCol, textCol, k)
      .dropDuplicates("id", "h")
      .join(broadcast(bg), Seq("h"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .select(col("id").as(idCol), col("n_grams"), col("n_hit"),
        (col("n_hit") / col("n_grams")).as("overlap_frac"))
  }

  /** Build (or atomically refresh) the persisted benchmark gram index
    * [[decontamOverlapGrams]] probes: the distinct 64-bit gram hashes
    * of the benchmark set, under a [[graft.operators.Versioned]] root
    * so a refresh (new eval suite version) lands atomically while
    * scoring continues against the previous version. Grams live in a
    * `grams/` subdir of the version dir so O(new-suite)
    * `delta_N/grams` appends ([[appendDecontamIndex]]) union cleanly
    * on the read side — same layout discipline as the IVF cells and
    * the span-hash index. Returns the committed version dir.
    */
  def writeDecontamIndex(bench: DataFrame, idCol: String, textCol: String,
                         k: Int, indexPath: String): String =
    Dedup.writeHashIndex(Dedup.spanRows(bench, idCol, textCol, k), indexPath)

  /** The gram set of a committed decontam-index version dir: base +
    * every appended delta ([[Dedup.readHashIndex]] — rows may repeat
    * across crash branches; [[decontamOverlapGrams]] re-distincts
    * defensively, so duplicates are harmless).
    */
  def readDecontamIndex(spark: SparkSession, versionDir: String): DataFrame =
    Dedup.readHashIndex(spark, versionDir)

  /** O(new-suite) benchmark refresh: eval suites grow by ADDITION (a
    * new benchmark version adds tasks, it doesn't retract published
    * ones), so registering one should pay for the new suite's grams
    * only — not the full-rebuild [[writeDecontamIndex]] costs. The
    * new suite's distinct gram hashes are anti-joined against the
    * current index (both sides suite-scale — megabytes against a
    * 100 TB corpus — so the index side broadcasts exactly as it does
    * in every probe) and only the genuinely NEW hashes land as an
    * atomic `delta_N/grams` under the current version
    * ([[graft.operators.Versioned.commitDelta]] — an append racing a
    * rebuild fails fast rather than silently vanishing). Appending an
    * already-indexed suite therefore produces an empty delta and
    * commits nothing — the append is idempotent/self-healing on
    * retry, like the streaming span-index growth.
    *
    * Returns the committed delta dir, or None when the suite brought
    * no new grams. Readers ([[readDecontamIndex]], and every scorer
    * built on it) see base + deltas as one set, so append ≡ rebuild
    * on the union of the suites.
    */
  def appendDecontamIndex(newBench: DataFrame, idCol: String, textCol: String,
                          k: Int, indexPath: String): Option[String] = {
    val spark = newBench.sparkSession
    val vdir = graft.operators.Versioned.resolve(spark, indexPath)
      .getOrElse(throw new IllegalStateException(
        s"no committed benchmark gram index at $indexPath — " +
          "build one with writeDecontamIndex first"))
    val existing = readDecontamIndex(spark, vdir).select(col("h")).distinct()
    val fresh = Dedup.spanRows(newBench, idCol, textCol, k)
      .select(col("h")).distinct()
      .join(broadcast(existing), Seq("h"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      if (fresh.isEmpty) None
      else Some(graft.operators.Versioned.commitDelta(spark, indexPath, vdir) {
        d => fresh.write.parquet(s"$d/grams")
      })
    } finally { fresh.unpersist(); () }
  }

  /** First hex digit of the content md5 — the deterministic bucketing
    * primitive behind [[sampleFlag]] and [[splitAssign]]. Content-keyed
    * (not id-keyed) so exact duplicates always land in one bucket and
    * assignments survive re-ingestion with different ids.
    */
  def hashBucket16(textCol: Column): Column =
    substring(md5(textCol.cast("binary")), 1, 1)

  /** Deterministic ~rate/16 sample membership (rate ∈ 1..16). */
  def sampleFlag(textCol: Column, rate16: Int): Column = {
    val hex = "0123456789abcdef".take(rate16).map(_.toString)
    hashBucket16(textCol).isin(hex: _*)
  }

  /** Deterministic train/val/test assignment: 12/2/2 sixteenths. */
  def splitAssign(textCol: Column): Column = {
    val h = hashBucket16(textCol)
    when(h.isin("c", "d"), "val")
      .when(h.isin("e", "f"), "test")
      .otherwise("train")
  }

  /** Overlapping token-window chunks — the embedding/RAG prep step:
    * each document becomes ⌈n/step⌉ chunks of up to `chunkTokens`
    * tokens, consecutive chunks sharing `overlap` tokens (step =
    * chunkTokens − overlap; the final chunk may be shorter). Empty
    * documents produce no chunks. Pure explode over a per-row token
    * array — partition-local, zero shuffle, and chunk text is built
    * only for emitted windows.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      "need chunkTokens > overlap >= 0")
    val step = chunkTokens - overlap
    df.repartition(par(df))
      .select(col(idCol).as("doc_id"),
        graft.functions.Dedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), expr(s"(size(toks) - 1) div $step")),
          i => concat_ws(" ", slice(col("toks"), i * step + 1, lit(chunkTokens))))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk_text"))
  }

  /** Continuous sequence packing (GPT-style pretraining layout):
    * documents are laid end-to-end per shard and cut into fixed
    * `ctxLen`-token training sequences; documents may straddle a
    * sequence boundary. Emits (doc, shard, seq in shard, token offset
    * in seq) — everything a loader needs to materialize the packed
    * batches.
    *
    * Scale shape: the only shuffle is the per-shard window, and a
    * shard's rows are a 1/`shards` slice of the corpus — size shards
    * so a shard's (id, n_tokens) pairs fit an executor (the window
    * carries two longs per doc, not the text). Shard here is
    * `doc_id % shards` for oracle portability; production would use
    * [[hashBucket16]]-style content hashing — the plan is identical.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    ctxLen: Long, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("_end", sum(col(tokensCol)).over(w))
      .select(col(idCol), col("shard"),
        expr(s"(_end - $tokensCol) div $ctxLen").as("seq_id"),
        expr(s"(_end - $tokensCol) % $ctxLen").as("seq_offset"))
  }

  /** The q_export_shards plan's WRITER face (round 18): materialize a
    * deterministic training-shard export — the manifest row 51g
    * reports AND the shards themselves — under one
    * [[graft.operators.Versioned]] commit at `path`:
    *
    *   `_v=N/shards/shard=K/…parquet`  all of `df`'s columns, rows of
    *                                   shard K in shard order (the
    *                                   position key `_h`, kept as a
    *                                   column so a trainer can verify
    *                                   or resume mid-shard);
    *   `_v=N/manifest/…parquet`        one row per shard: n_docs,
    *                                   n_chars, first/last doc.
    *
    * Determinism: position key = portable md5(id) (60-bit — content-
    * independent, so re-exporting an APPENDED corpus moves no existing
    * doc to a new position within its shard), shard = key mod
    * `nShards` (hash-partitioned — NO global sort anywhere). The only
    * wide operation is one repartition on the shard number plus a
    * within-partition sort; at 100 TB each shard streams through one
    * writer task independent of every other shard. The manifest is
    * the same one map-side-combined groupBy as q_export_shards, so
    * ExportShardsSpec pins writer ≡ query row-for-row.
    *
    * Returns the committed version dir.
    */
  def exportShards(df: DataFrame, idCol: String, charsCol: String,
                   path: String, nShards: Int = 16): String = {
    require(nShards >= 1, s"exportShards: nShards=$nShards")
    val spark = df.sparkSession
    graft.operators.Versioned.commitNew(spark, path) { dir =>
      val keyed = df
        .withColumn("_h", EngineNeutral.md5Long60(col(idCol).cast("string")))
        .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      // one writer task per shard value: repartition ON the shard
      // number (not hash-of-shard collisions into fewer tasks than
      // shards — range/hash both fine here since the column IS the
      // target partition), then an in-task sort gives shard order in
      // file order with no global sort
      keyed
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("_h"))
        .write.mode("overwrite").partitionBy("shard")
        .parquet(s"$dir/shards")
      keyed
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(charsCol).as("n_chars"),
          min(struct(col("_h"), col(idCol))).getField(idCol).as("first_doc"),
          max(struct(col("_h"), col(idCol))).getField(idCol).as("last_doc"))
        .write.mode("overwrite").parquet(s"$dir/manifest")
    }
  }

  /** Manifest of the latest committed [[exportShards]] export. */
  def readShardManifest(spark: SparkSession, path: String): DataFrame = {
    val dir = graft.operators.Versioned.resolve(spark, path)
      .getOrElse(sys.error(s"no committed shard export under $path"))
    spark.read.parquet(s"$dir/manifest")
  }

  /** Shard table of the latest committed [[exportShards]] export
    * (all shards; filter on `shard` for one — partition pruning makes
    * that a single-directory read).
    */
  def readShards(spark: SparkSession, path: String): DataFrame = {
    val dir = graft.operators.Versioned.resolve(spark, path)
      .getOrElse(sys.error(s"no committed shard export under $path"))
    // partition-directory inference narrows shard to int; restore the
    // written long so round-trips are schema-identical to the writer
    spark.read.parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
  }
}
