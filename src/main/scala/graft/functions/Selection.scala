package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-selection scoring (the DSIR family, Xie et al. 2023): rank
  * raw-pool documents by how target-like their token distribution is,
  * avg over tokens of ln p̂_target − ln p̂_raw with Laplace smoothing
  * over the shared vocabulary.
  *
  * Two faces, the decontamination discipline: [[tokenLogRatios]] +
  * [[scoreAgainst]] compute model and scores in one job (the gated
  * `q_importance` shape), while [[writeImportanceModel]] persists the
  * per-token log-ratio table under a
  * [[graft.operators.Versioned]] root so ingest rounds score against
  * a FIXED, versioned selection model ([[scoreImportanceIndexed]],
  * `Streams.importanceIngest`) — train the model once on the curated
  * target + raw pools, then score every incoming crawl batch without
  * re-aggregating the training corpora.
  *
  * Scale shape: one corpus tokenization feeds a single (token-hash →
  * target-count, raw-count) aggregate whose exchange the scalar stats
  * row reuses; the log-ratio table is vocabulary-sized and broadcasts
  * at score time; the per-doc aggregation shuffles (id, partial)
  * pairs only. Batch documents may contain tokens in NEITHER training
  * pool — those take the model's `lr_unseen` scalar (both Laplace
  * branches at count 0), carried in the model's one-row defaults
  * table.
  */
object Selection {

  /** (lr, defaults): the per-token log-ratio table
    * (h = xxhash64(token), lr) over the training corpus's vocabulary,
    * and a one-row defaults table (lr_unseen, v, nt, nr) for tokens
    * outside it. `isTarget` splits the corpus into the target
    * distribution (true) and the raw pool (false).
    */
  def tokenLogRatios(corpus: DataFrame, textCol: String,
                     isTarget: Column): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val toks = corpus
      .repartition(spark.sparkContext.defaultParallelism)
      .select(isTarget.as("is_tgt"), explode(Dedup.tokens(col(textCol))).as("t"))
      .select(col("is_tgt"), xxhash64(col("t")).as("h"))
    // persisted: counts feeds the lr table, the scalar stats row AND
    // the defaults row — within one job the exchange is reused, but
    // writeImportanceModel consumes lr and defaults in SEPARATE write
    // actions, where cross-action exchange reuse does not apply and an
    // unpersisted counts would re-tokenize the corpus per write.
    // MEMORY_ONLY, vocabulary-sized; lazy return → the family's
    // can't-unpersist-here convention (ngramJaccard's sh)
    val counts = toks.groupBy("h").agg(
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("is_tgt"), 1L).otherwise(0L)).as("cr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val stats = counts.agg(count(lit(1)).as("v"),
      sum("ct").as("nt"), sum("cr").as("nr"))
    val lr = counts.crossJoin(broadcast(stats))
      .select(col("h"),
        (log((col("ct") + lit(1.0)) / (col("nt") + col("v"))) -
          log((col("cr") + lit(1.0)) / (col("nr") + col("v")))).as("lr"))
    val defaults = stats.select(
      (log(lit(1.0) / (col("nt") + col("v"))) -
        log(lit(1.0) / (col("nr") + col("v")))).as("lr_unseen"),
      col("v"), col("nt"), col("nr"))
    (lr, defaults)
  }

  /** Score documents against a log-ratio model: per doc, token count
    * and the r6-rounded mean log-ratio (out-of-vocabulary tokens take
    * `lr_unseen`). The model tables broadcast; only the per-doc
    * aggregation shuffles.
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   lr: DataFrame, defaults: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("t"))
      .select(col(idCol), xxhash64(col("t")).as("h"))
      .join(broadcast(lr), Seq("h"), "left")
      .crossJoin(broadcast(defaults.select("lr_unseen")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        EngineNeutral.roundHalfUp(
          avg(coalesce(col("lr"), col("lr_unseen"))), 6).as("avg_logratio"))

  /** Persist (or atomically refresh) the selection model: `lr/` and
    * `defaults/` under a [[graft.operators.Versioned]] root. Returns
    * the committed version dir. The lr aggregate lands on disk first
    * and defaults derive from the written table's statistics footprint
    * — one corpus tokenization total.
    */
  def writeImportanceModel(corpus: DataFrame, textCol: String,
                           isTarget: Column, modelPath: String): String =
    graft.operators.Versioned.commitNew(corpus.sparkSession, modelPath) { dir =>
      val (lr, defaults) = tokenLogRatios(corpus, textCol, isTarget)
      // tokenLogRatios persists its counts aggregate, so the corpus is
      // tokenized once across these two write actions
      lr.write.parquet(s"$dir/lr")
      defaults.write.parquet(s"$dir/defaults")
    }

  /** Score a batch against a committed model version dir — identical
    * per-token arithmetic to the in-job path (spec-pinned), at the
    * cost of two parquet reads instead of re-aggregating the training
    * corpus.
    */
  def scoreImportanceIndexed(spark: SparkSession, versionDir: String,
                             batch: DataFrame, idCol: String,
                             textCol: String): DataFrame =
    scoreAgainst(batch, idCol, textCol,
      spark.read.parquet(s"$versionDir/lr"),
      spark.read.parquet(s"$versionDir/defaults"))
}
