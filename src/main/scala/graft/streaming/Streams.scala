package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming re-expression of the reference's unbounded
  * `pipeline.FromChannel` source (/root/reference/pipeline/
  * pipeline.go:131): the channel becomes a streaming Dataset, the
  * consumer goroutines become a streaming query, and back-pressure /
  * rate limiting is the engine's micro-batch planner instead of a
  * semaphore.
  *
  * At cluster scale the same transforms run over Kafka/files by
  * swapping the source (`spark.readStream.format(...)`): state is
  * bounded by watermark × keys and partitioned by key, so windowed
  * aggregation scales horizontally.
  */
object Streams {

  /** An in-process channel: `send` enqueues elements, `toDS` is the
    * unbounded streaming Dataset fed by them. The JVM analogue of
    * handing pippin a `chan T`. (Backed by MemoryStream — Spark's
    * in-memory streaming source; driver-side, test/dev scoped, like
    * the reference's in-process channel.)
    */
  final class Channel[T: Encoder](spark: SparkSession) {
    private val stream = MemoryStream[T](spark)
    private var closedFlag = false // guarded by `this`

    /** Enqueue elements; like a send on a closed Go channel, sending
      * after [[close]] is a programming error and throws. The flag
      * check and the enqueue happen under one lock shared with
      * [[close]] — a send racing close() either lands wholly before
      * it (elements visible to any later drain) or deterministically
      * throws; it can never slip elements in after close succeeded
      * (Go makes the same race a deterministic panic).
      */
    def send(ts: T*): Unit = synchronized {
      if (closedFlag) throw new IllegalStateException("send on closed channel")
      stream.addData(ts)
    }

    /** Marks end-of-stream (Go `close(ch)`): blocking aggregations on
      * a [[graft.pipeline.ChannelPipeline]] fed by this channel
      * complete once the already-sent elements are drained.
      */
    def close(): Unit = synchronized { closedFlag = true }
    def isClosed: Boolean = synchronized { closedFlag }

    def toDS: Dataset[T] = stream.toDS()
  }

  object Channel {
    def apply[T: Encoder](spark: SparkSession): Channel[T] = new Channel[T](spark)
  }

  /** Watermarked tumbling-window aggregation — the streaming form of
    * RelationalQueries.q_stream_window (same `window()` operator, so
    * stream and batch results agree; StreamingSpec asserts it).
    */
  def windowedAgg(events: DataFrame, tsCol: String, keyCol: String,
                  windowLen: String, watermark: String,
                  valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), round(sum(valueCol), 2).as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col(keyCol), col("n"), col("total_value"))

  /** A typed event for stateful sessionization. */
  final case class SEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** An emitted session. */
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           total_value: Double)

  /** Internal open-session accumulator (public: Spark's state encoder
    * codegen must be able to construct it).
    */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** All of a user's open sessions — multiple can coexist while the
    * watermark still admits late events between them.
    */
  final case class SessionsState(open: List[SessionState])

  /** Streaming sessionization with CUSTOM state —
    * `flatMapGroupsWithState` + event-time timeout: each user carries
    * one open-session state; when the watermark passes last-event +
    * gap, the session is emitted and the state cleared. State size is
    * O(active users), partitioned by user key — the horizontally
    * scalable shape for 100 TB streams. (Batch/SQL-expressible
    * sessionization should use `session_window` —
    * [[graft.operators.Sessionize]]; this path exists for semantics a
    * built-in window can't express: per-session custom accumulators,
    * early emission, side outputs.)
    */
  def sessionizeStream(events: Dataset[SEvent], gapSeconds: Long,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    // Merge an event into the open-session list: join every session
    // within `gap` of it (an event can bridge two sessions), else open
    // a new one. Sessions are emitted ONLY when the watermark passes
    // their end + gap — never eagerly — so any event the watermark
    // still admits can extend or bridge them (Append-mode output is
    // final, so eager emission would make late merges impossible).
    def merge(open: List[SessionState], t: Long, v: Double): List[SessionState] = {
      val (touching, rest) = open.partition(s => t >= s.start - gapMs && t <= s.last + gapMs)
      val joined = touching.foldLeft(SessionState(t, t, 1L, v)) { (acc, s) =>
        SessionState(math.min(acc.start, s.start), math.max(acc.last, s.last),
          acc.n + s.n, acc.total + s.total)
      }
      joined :: rest
    }

    def fn(userId: Long, evts: Iterator[SEvent],
           state: GroupState[SessionsState]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      var open = state.getOption.map(_.open).getOrElse(Nil)
      evts.toSeq.sortBy(_.ts.getTime).foreach { e =>
        open = merge(open, e.ts.getTime, e.value)
      }
      // expired = no admissible event can still touch the session
      val (expired, stillOpen) = open.partition(_.last + gapMs <= wm)
      val out = expired.sortBy(_.start).map(s =>
        Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n, s.total))
      if (stillOpen.isEmpty) state.remove()
      else {
        state.update(SessionsState(stillOpen))
        // wake when the earliest open session can expire (must be
        // strictly beyond the current watermark)
        val wake = stillOpen.map(_.last + gapMs).min
        state.setTimeoutTimestamp(math.max(wake, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** A typed event for streaming SCD-2 change tracking. */
  final case class TEvent(user_id: Long, event_id: Long,
                          ts: java.sql.Timestamp, event_type: String)

  /** A CLOSED SCD-2 validity interval (the open current run stays in
    * state — append-mode output is final, so it can only emit once a
    * successor closes it).
    */
  final case class Scd2Row(user_id: Long, event_type: String,
                           valid_from_us: Long, valid_to_us: Long,
                           n_events: Long)

  /** Per-user SCD-2 state: events the watermark has not yet sealed
    * (processing must be event-time ordered, and an admissible
    * out-of-order arrival could land between them) plus the open run.
    * Public: Spark's state encoder codegen must construct it.
    */
  final case class Scd2State(pending: List[(Long, Long, String)],
                             curType: String, curFromUs: Long, curN: Long,
                             hasCur: Boolean)

  /** Streaming SCD Type-2 change tracking — the online face of
    * q_scd2 (SURVEY §2 row 135): per user, consecutive same-type
    * events collapse into validity intervals; an interval is emitted
    * the moment a different-type successor CLOSES it. Out-of-order
    * arrivals are handled the only way correct SCD-2 can be: events
    * buffer in state until the watermark seals them (nothing earlier
    * can still arrive), then fold in (ts, event_id) order — so the
    * emitted intervals equal the batch fold over the same events
    * (spec-pinned). State is O(open run + unsealed events) per user,
    * partitioned by the user key; arrivals with ts <= the current
    * watermark are dropped by Spark's late filter (the standard
    * streaming contract — 4.1's predicate is LessThanOrEqual).
    */
  def scd2Stream(events: Dataset[TEvent],
                 watermark: String = "10 minutes"): Dataset[Scd2Row] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._

    def fn(userId: Long, evts: Iterator[TEvent],
           state: GroupState[Scd2State]): Iterator[Scd2Row] = {
      val wm = state.getCurrentWatermarkMs()
      val st = state.getOption.getOrElse(Scd2State(Nil, "", 0L, 0L, hasCur = false))
      // FULL micros (getTime truncates to ms — sub-ms events would
      // fold in event_id order instead of true event-time order and
      // diverge from the batch unix_micros fold)
      def us(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      val buf = st.pending ++ evts.map(e => (us(e.ts), e.event_id, e.event_type))
      // seal everything at-or-before the watermark: Spark 4.1's
      // late-row filter is LessThanOrEqual(eventTime, watermark)
      // (WatermarkSupport.watermarkExpression), so any NEW arrival
      // with ts <= wm is dropped before reaching this function — no
      // admissible sibling of a sealed tie can ever appear, and
      // holding ties in `pending` would only delay their emission by
      // one extra watermark advance. The comparison must be at FULL
      // microsecond precision (the filter compares the µs-precision
      // event time against wm ms * 1000): an event at wm·1000+1..999 µs
      // is still admissible-sibling territory — a later arrival in
      // that same millisecond with a smaller (ts, event_id) would fold
      // AFTER an already-sealed ms-truncated tie and diverge from the
      // batch order. Sealing at `tsUs <= wm * 1000` makes the sealed
      // set exactly Spark's inadmissible set.
      val (ready, pending) = buf.partition(_._1 <= wm * 1000L)
      var curType = st.curType
      var curFrom = st.curFromUs
      var curN = st.curN
      var hasCur = st.hasCur
      val out = scala.collection.mutable.ListBuffer.empty[Scd2Row]
      ready.sortBy(t => (t._1, t._2)).foreach { case (tsUs, _, tpe) =>
        if (!hasCur) { curType = tpe; curFrom = tsUs; curN = 1L; hasCur = true }
        else if (tpe == curType) curN += 1L
        else {
          out += Scd2Row(userId, curType, curFrom, tsUs, curN)
          curType = tpe; curFrom = tsUs; curN = 1L
        }
      }
      if (pending.isEmpty && !hasCur) state.remove()
      else {
        state.update(Scd2State(pending, curType, curFrom, curN, hasCur))
        // unsealed events must be folded once the watermark passes
        // them even if the user goes quiet: the sealing watermark for
        // tsUs is the smallest wm' with tsUs <= wm'·1000, i.e.
        // ceil(tsUs / 1000) — a floor here would leave a sub-ms event
        // unsealed at its own timeout and cost one extra advance
        if (pending.nonEmpty)
          state.setTimeoutTimestamp(
            math.max(pending.map(t => math.floorDiv(t._1 + 999L, 1000L)).min, wm + 1))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup: drop rows whose key columns were already
    * seen, with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark` — duplicates are only tracked
    * while a duplicate could still legally arrive). The streaming
    * face of Dedup.exact for continuously ingested corpora.
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
                  keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join: each left row pairs with right rows
    * of the same key whose event time falls in
    * `[leftTs − lookbackSeconds, leftTs)` — the streaming face of the
    * batch q_range_join (purchase ← preceding clicks).
    *
    * Both sides carry watermarks and the join condition bounds right's
    * event time relative to left's, so Spark can expire join state:
    * right rows are dropped once the left watermark passes
    * `rightTs + lookbackSeconds`, left rows once right's watermark
    * passes leftTs. Without the time bound the state store would grow
    * forever — the condition is what makes this run indefinitely at
    * scale (reference: Structured Streaming's inner joins with
    * event-time range conditions). Append-mode only, like all
    * stream-stream inner joins.
    */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
                   rightTs: String, key: (String, String),
                   lookbackSeconds: Long, watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark).join(
      right.withWatermark(rightTs, watermark),
      col(key._1) === col(key._2) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col(rightTs) < col(leftTs))

  /** Streaming incremental corpus ingest: every micro-batch keeps only
    * first occurrences (min `idCol` per `key`) that are NOT already in
    * the parquet-backed key index, appends the survivors to `outPath`
    * and their keys to `indexPath` — [[graft.functions.Dedup.incremental]]
    * as a continuously-running pipeline. The index is the only state
    * and it lives in files, not the state store: at 100 TB the
    * anti-join is a hash join against a bucketed key table, and a
    * replayed micro-batch is self-healing (its keys are already
    * indexed, so re-delivery appends nothing to the output).
    */
  /** Native BOUNDED-STATE streaming dedup: first occurrence per key
    * wins, duplicates arriving within the watermark delay are
    * dropped, and the state store evicts each key once the watermark
    * passes it — state is O(keys per watermark window), NOT O(corpus).
    *
    * This is the complement of [[dedupIngest]]: the file-index path
    * is corpus-GLOBAL (a duplicate of something indexed last month
    * still drops) at the cost of a per-batch index probe; this path
    * is index-free and state-bounded, the right tool when duplicates
    * cluster in time — at-least-once upstream redelivery, double-fired
    * webhooks — and a re-arrival AFTER the window is legitimately new
    * (the semantics StreamingSpec pins). Built entirely on Spark's
    * dropDuplicatesWithinWatermark so the state lifecycle is the
    * engine's own, not custom code.
    */
  def dedupWithinWatermark(stream: DataFrame, keyCols: Seq[String],
                           tsCol: String, delay: String): DataFrame =
    stream.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  def dedupIngest(stream: DataFrame, key: Column, idCol: String,
                  indexPath: String, outPath: String,
                  checkpoint: String): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val keyed = batch.withColumn("_key", key)
        val idx =
          try spark.read.parquet(indexPath)
          catch { case _: Throwable => keyed.select(col("_key")).limit(0) }
        val keepIds = keyed
          .groupBy(col("_key"))
          .agg(org.apache.spark.sql.functions.min(col(idCol)).as("_keep"))
          .join(idx, Seq("_key"), "left_anti")
          .select(col("_keep"))
        val survivors = keyed
          .join(keepIds, keyed(idCol) === col("_keep"))
          .drop("_keep")
          .persist() // two writes below — evaluate the joins once
        try {
          survivors.drop("_key").write.mode("append").parquet(outPath)
          survivors.select(col("_key")).write.mode("append").parquet(indexPath)
        } finally { survivors.unpersist(); () }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Continuous ANN scoring: each micro-batch of embeddings is scored
    * against a PREBUILT IVF index ([[graft.functions.Ivf.writeIndex]])
    * and the top-k neighbors appended to `outPath` — the
    * ingest-vs-index split every production similarity pipeline has:
    * the index builds offline at corpus scale, the stream pays only
    * nprobe/cells of it per batch (partition pruning on the
    * cell-partitioned index), and [[graft.operators.Versioned]] lets
    * an index rebuild land mid-stream without breaking in-flight
    * batches.
    *
    * Exactly-once to the sink: a blind `append` would duplicate a
    * batch replayed after a crash between write and checkpoint commit
    * (foreachBatch is at-least-once). Each batch instead OVERWRITES
    * its own `batch_id=N` partition (dynamic partition overwrite), so
    * a replay rewrites the same rows in place. The batch id rides
    * along as a provenance column; readers who don't want it drop it.
    */
  def annScoreIngest(stream: DataFrame, indexPath: String, outPath: String,
                     checkpoint: String, k: Int = 10,
                     nprobe: Int = 4): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.Ivf
            .ivfTopKIndexed(batch.sparkSession, indexPath, batch,
              k = k, nprobe = nprobe)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** The full streaming corpus-curation loop over a persisted ANN
    * index: every micro-batch is (1) DEDUPED against the index —
    * id-level, deterministic first-delivery-wins, the anti-join inside
    * [[graft.functions.Ivf.appendToIndex]]; (2) APPENDED — survivors
    * land as an O(batch) delta inside the current index version; and
    * (3) SCORED — the batch's top-k neighbors against the just-grown
    * index go to `outPath`, overwriting their own `batch_id=N`
    * partition (same exactly-once shape as [[annScoreIngest]]).
    *
    * Crash/replay semantics: a replayed batch appends nothing (its ids
    * are already indexed — self-healing at-least-once) and rescores
    * against whatever the index holds by then, which may include later
    * batches — scores are at-least-as-current as the original attempt,
    * never lost. The index stays single-writer ([[graft.operators
    * .Versioned]] `_LOCK`): one ingest stream per index, and pause it
    * around [[graft.functions.Ivf.compactIndex]] maintenance.
    */
  def indexGrowIngest(stream: DataFrame, indexPath: String, outPath: String,
                      checkpoint: String, k: Int = 10, nprobe: Int = 4,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.functions.Ivf.appendToIndex(batch, indexPath, idCol, vecCol)
          graft.functions.Ivf
            .ivfTopKIndexed(batch.sparkSession, indexPath, batch,
              k = k, nprobe = nprobe, idCol = idCol, vecCol = vecCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming decontamination: each micro-batch of documents is
    * scored for k-gram overlap against a PERSISTED benchmark gram
    * index ([[graft.functions.Curation.writeDecontamIndex]] — the
    * distinct 64-bit gram hashes of the eval suites, under a
    * [[graft.operators.Versioned]] root so a benchmark refresh lands
    * atomically mid-stream) and the per-doc overlap rows go to
    * `outPath` — the release-gate scan run continuously at ingest
    * time instead of once before a release. The index is resolved
    * per batch, so a new benchmark version applies from the next
    * micro-batch on.
    *
    * Scale shape: identical to the batch operator — the gram index is
    * eval-suite-sized (MBs) and broadcast, the batch side reduces to
    * 8-byte hashes in its scan stage, nothing about the corpus is
    * kept in the state store. Exactly-once to the sink via the same
    * `batch_id=N` dynamic-partition overwrite as [[annScoreIngest]]:
    * a replayed batch rewrites its own partition against the
    * then-current index (at-least-as-current as the lost attempt).
    *
    * Exactly-once covers CHECKPOINT replays — a crash between the
    * sink write and the commit re-runs the batch under the SAME
    * batch_id and the overwrite rewrites that partition in place.
    * Source-level REdelivery is weaker: the same documents arriving
    * again form a NEW batch_id, so `outPath` can hold duplicate
    * per-doc rows across batch_id partitions. Rows are idempotent BY
    * VALUE (scoring is deterministic for a given index version), so
    * consumers reading an at-least-once-fed `outPath` must dedup on
    * the doc id at read (`dropDuplicates(idCol)`).
    */
  def decontamIngest(stream: DataFrame, gramIndexPath: String, outPath: String,
                     checkpoint: String, idCol: String = "doc_id",
                     textCol: String = "text", k: Int = 5): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val vdir = graft.operators.Versioned.resolve(spark, gramIndexPath)
            .getOrElse(throw new IllegalStateException(
              s"no committed benchmark gram index at $gramIndexPath — " +
                "build one with Curation.writeDecontamIndex first"))
          graft.functions.Curation
            .decontamOverlapGrams(batch,
              graft.functions.Curation.readDecontamIndex(spark, vdir),
              idCol, textCol, k)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming span-level dedup: each micro-batch of documents is
    * scored against a PERSISTED span-hash index
    * ([[graft.functions.Dedup.writeSpanIndex]]) — per-doc
    * (id, n_spans, n_dup, dup_frac) where a span is duplicated iff it
    * is already in the index or held by ≥2 docs within the batch —
    * and the index then grows by the batch's NEW span hashes as an
    * O(batch) `Versioned.commitDelta` append (never a rebuild). The
    * span-granularity sibling of the exact-dedup ingest loop: ingest
    * scores against history, history grows by the batch.
    *
    * Exactly-once: output goes through the same `batch_id=N`
    * dynamic-partition overwrite as [[decontamIngest]], and the index
    * append is SELF-HEALING on checkpoint replay — the replayed
    * batch's spans are already in the index, so the anti-join delta
    * is empty and nothing is appended twice. Source-level REdelivery
    * of a document (new batch_id) scores it against an index that
    * already holds its spans → dup_frac 1.0, which is exactly the
    * keep-first verdict incremental dedup gives re-ingested content.
    */
  def spanDedupIngest(stream: DataFrame, spanIndexPath: String, outPath: String,
                      checkpoint: String, idCol: String = "doc_id",
                      textCol: String = "text", k: Int = 8): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val vdir = graft.operators.Versioned.resolve(spark, spanIndexPath)
            .getOrElse(throw new IllegalStateException(
              s"no committed span index at $spanIndexPath — " +
                "build one with Dedup.writeSpanIndex first"))
          // scoring reads the PRE-APPEND view: the batch's own delta
          // (tagged below) is excluded, so a checkpoint replay that
          // crashed between the append and the checkpoint commit
          // re-scores identically instead of matching its own spans
          // (which would overwrite the partition with dup_frac = 1.0)
          val tag = batchTag(spark, checkpoint, batchId)
          val idx = graft.functions.Dedup
            .readSpanIndex(spark, vdir, excludeTag = Some(tag))
          // spans computed ONCE per batch (persisted): the scorer and
          // the index append both consume them — unpersisted, the
          // tokenize → explode → window chain would run twice
          val spans = graft.functions.Dedup
            .spanRows(batch, idCol, textCol, k)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          try {
            graft.functions.Dedup
              .spanDedupIncrementSpans(spans, idx, idCol)
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
            // O(batch) index growth; the append's anti join sees the
            // FULL index, so a replayed append commits nothing
            graft.functions.Dedup.appendHashIndex(spark, spanIndexPath, vdir,
              spans, tag = Some(tag))
          } finally { spans.unpersist(); () }
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Delta tag for one (stream, micro-batch). The stream identity is
    * the CHECKPOINT'S OWN QUERY ID (the uuid Spark writes to
    * `<checkpoint>/metadata` at query start): stable across restarts
    * of the same checkpoint — a crash replay must match the tag its
    * previous incarnation wrote — but regenerated when a checkpoint
    * is deleted and recreated, so a reprocessing run's batch 0 never
    * aliases the old incarnation's batch-0 delta (path-derived tags
    * had exactly that bug: stale `_TAG_` files live in the index
    * forever while recreated checkpoints restart batch ids at 0).
    *
    * An unreadable/unparsable metadata file THROWS rather than
    * degrading to a path-derived tag: the fallback would silently
    * reintroduce exactly the cross-incarnation aliasing hazard the
    * query-id scheme exists to prevent, and inside foreachBatch the
    * running query's checkpoint metadata always exists (Spark writes
    * it at query start) — its absence means the checkpoint was
    * tampered with mid-run, which must fail the batch, not corrupt
    * the index.
    */
  private def batchTag(spark: SparkSession, checkpoint: String,
                       batchId: Long): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"streaming checkpoint metadata missing at $p — cannot derive a " +
          "replay-stable batch tag (a path-derived fallback would alias " +
          "deltas across checkpoint incarnations); the checkpoint dir " +
          "was deleted or corrupted while the query ran")
    val in = fs.open(p)
    val id =
      try {
        val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
        """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
          .map(_.group(1).replaceAll("[^A-Za-z0-9-]", ""))
          .filter(_.nonEmpty)
          .getOrElse(throw new IllegalStateException(
            s"streaming checkpoint metadata at $p has no query id " +
              s"(content: ${txt.take(200)}) — refusing a path-derived tag"))
      } finally in.close()
    s"${id}_b$batchId"
  }

  /** Streaming curation funnel — the online face of q_curate_e2e:
    * each micro-batch of documents runs quality scoring → language
    * gate → exact dedup against a persisted seen-hash index → span
    * dup-frac trim against the persisted span index → optional LM
    * perplexity gate, then grows both indexes by O(batch). Kept docs
    * land under `outPath/batch_id=N`; per-batch funnel-stage counts
    * (the streaming form of the batch query's Observe tripwires) land
    * as one row under `statsPath/batch_id=N`.
    *
    * LM gate (`lmModelPath`): documents are scored against a FROZEN
    * reference unigram LM ([[graft.functions.Curation.writeLmModel]])
    * — the CCNet discipline, and the only replay-stable choice: the
    * model VERSION is pinned once at stream start, so a checkpoint
    * replay re-scores every batch against exactly the model it
    * originally saw even if an operator committed a newer model
    * meanwhile (restart the stream to adopt one). Unlike the batch
    * funnel (whose LM trains on the same kept corpus it scores, so
    * every token is in-vocabulary), a frozen reference model can meet
    * out-of-vocabulary tokens: they are excluded from the mean (the
    * model has no estimate for them), and a document with NO in-vocab
    * tokens fails the gate — zero evidence of natural text is the
    * tail bucket, and silently passing it would let adversarial
    * all-novel junk through the one stage built to catch it. Kept
    * rows carry `avg_nll`; stats gain `lm_kept` (= `trimmed` when no
    * model is configured, and `avg_nll` is then null).
    *
    * SCHEMA UPGRADE NOTE (round 15 added `avg_nll` to outPath and
    * `lm_kept` to statsPath): a stream upgraded IN PLACE leaves
    * pre-upgrade `batch_id=N` partitions without the new columns.
    * Parquet readers that sample one footer for the schema can then
    * silently miss them (or fail) depending on which partition they
    * sample — read such mixed directories with
    * `spark.read.option("mergeSchema", true)` (pre-upgrade rows
    * surface the new columns as null), or start the upgraded stream
    * on fresh out/stats paths. New streams are unaffected.
    *
    * Index discipline ([[graft.functions.Dedup.writeHashIndex]] ×2 —
    * bootstrap both with an empty frame or a corpus build):
    * the exact index grows with QUALITY-PASSING hashes (what the
    * batch funnel's dedup stage sees), the span index with KEPT
    * (post-dedup, pre-trim) docs' spans (what the batch funnel's span
    * df counts). Value-level exactly-once: a re-delivered document's
    * hash is already indexed, so it re-emits NOTHING under the new
    * batch_id — consumers union kept rows across partitions without
    * dedup. Crash replays self-heal at ANY point: both index reads
    * exclude this batch's own tagged deltas
    * ([[graft.functions.Dedup.readHashIndex]]), so a replay after
    * zero, one, or both appends recomputes the identical kept set and
    * stats, overwrites its partitions value-identically, and lands
    * whichever append is still missing (the appends' anti joins see
    * the full index, so an already-landed delta commits nothing).
    */
  def curateIngest(stream: DataFrame, exactIndexPath: String,
                   spanIndexPath: String, outPath: String, statsPath: String,
                   checkpoint: String, idCol: String = "doc_id",
                   textCol: String = "text", minWords: Int = 10,
                   maxDupFrac: Double = 0.5, spanK: Int = 8,
                   lmModelPath: Option[String] = None,
                   maxAvgNll: Double = graft.functions.Curation.CurateNllMax)
      : StreamingQuery = {
    require(minWords >= spanK,
      s"minWords ($minWords) must be ≥ spanK ($spanK): every doc past the " +
        "quality gate must produce at least one full span")
    // pin the LM VERSION once, at stream start (see the scaladoc)
    val lmVersionDir = lmModelPath.map { p =>
      graft.operators.Versioned.resolve(stream.sparkSession, p)
        .getOrElse(throw new IllegalStateException(
          s"no committed LM model at $p — build one with Curation.writeLmModel"))
    }
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          def vdir(p: String) = graft.operators.Versioned.resolve(spark, p)
            .getOrElse(throw new IllegalStateException(
              s"no committed index at $p — bootstrap with Dedup.writeHashIndex"))
          val (exactV, spanV) = (vdir(exactIndexPath), vdir(spanIndexPath))
          // both reads exclude this batch's own (tagged) deltas, so a
          // checkpoint replay AFTER either append recomputes the same
          // kept set and stats as the original run — the output
          // overwrite is then value-identical and the missing second
          // append (if the crash fell between the two) finally lands
          val tag = batchTag(spark, checkpoint, batchId)
          val ta = graft.functions.TextAnalysis
          // 128-bit md5 text keys — the batch funnel's (and
          // Dedup.exact's) width: a PERMANENT drop decision at corpus
          // scale cannot ride a 64-bit key's birthday bound
          val scored = batch
            .select(col(idCol), col(textCol),
              ta.nWords(col(textCol)).as("n_words"),
              ta.langIdScored(col(textCol)).as("lang_guess"),
              unhex(md5(col(textCol).cast("binary"))).as("h"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
          try {
            val nScored = scored.count()
            val filtered = scored
              .filter(col("n_words") >= minWords && col("lang_guess") =!= "unk")
            val nFiltered = filtered.count()
            // exact dedup: first-id-wins within the batch, then drop
            // anything some earlier batch already holds (index side is
            // unbounded → merge, never a planner broadcast)
            val firsts = filtered.groupBy("h").agg(min(col(idCol)).as("_keep"))
            val seen = graft.functions.Dedup.readHashIndex(spark, exactV,
              excludeTag = Some(tag))
            val kept = filtered
              .join(firsts, Seq("h")).filter(col(idCol) === col("_keep"))
              .join(seen.hint("merge"), Seq("h"), "left_anti")
              .drop("_keep")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
            try {
              val nKept = kept.count()
              // spans computed ONCE (persisted): scorer + index append
              val spans = graft.functions.Dedup
                .spanRows(kept, idCol, textCol, spanK)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
              val spanScores = graft.functions.Dedup.spanDedupIncrementSpans(
                spans,
                graft.functions.Dedup.readSpanIndex(spark, spanV,
                  excludeTag = Some(tag)),
                idCol)
              val trimmed0 = kept
                .join(spanScores.select(col(idCol), col("dup_frac")).hint("merge"),
                  Seq(idCol))
                .filter(col("dup_frac") <= maxDupFrac)
              // optional LM gate against the PINNED frozen model (see
              // scaladoc): per-doc mean NLL over in-vocab tokens,
              // r6-rounded like the batch funnel; OOV-only docs score
              // null and fail the gate
              val gated = lmVersionDir match {
                case None =>
                  trimmed0.withColumn("avg_nll", lit(null).cast("double"))
                case Some(vd) =>
                  val model = graft.functions.Curation.readLmModel(spark, vd)
                  val nll = kept
                    .select(col(idCol),
                      explode(graft.functions.Dedup.tokens(col(textCol))).as("t"))
                    .join(broadcast(model), "t")
                    .groupBy(idCol)
                    .agg(graft.functions.EngineNeutral.roundHalfUp(avg("nll"), 6)
                      .as("avg_nll"))
                  trimmed0.join(nll.hint("merge"), Seq(idCol), "left")
                    .filter(col("avg_nll").isNotNull &&
                      col("avg_nll") <= maxAvgNll)
              }
              val out = gated
                .select(col(idCol), col("lang_guess"), col("n_words"),
                  col("dup_frac"), col("avg_nll"))
                .withColumn("batch_id", lit(batchId))
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
              try {
                val nLmKept = out.count()
                // one extra count only when the gate is on (kept and
                // spans are persisted, so this re-runs the cheap
                // join+filter, not the funnel)
                val nTrimmed =
                  if (lmVersionDir.isEmpty) nLmKept else trimmed0.count()
                out.write.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy("batch_id").parquet(outPath)
                import spark.implicits._
                Seq((batchId, nScored, nFiltered, nKept, nTrimmed, nLmKept))
                  .toDF("batch_id", "scored", "filtered", "kept", "trimmed",
                    "lm_kept")
                  .write.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy("batch_id").parquet(statsPath)
                // O(batch) index growth, funnel-stage-matched (see doc)
                graft.functions.Dedup.appendHashIndex(spark, exactIndexPath,
                  exactV, filtered.select("h"), tag = Some(tag))
                graft.functions.Dedup.appendHashIndex(spark, spanIndexPath,
                  spanV, spans, tag = Some(tag))
              } finally { out.unpersist(); spans.unpersist(); () }
            } finally kept.unpersist()
          } finally scored.unpersist()
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming semantic dedup: each micro-batch of vectors is judged
    * against the PERSISTED SemDeDup index
    * ([[graft.functions.Semdedup.writeIndex]] — trained centroids +
    * the full member set under a [[graft.operators.Versioned]] root),
    * then the batch's vectors grow the member set by O(batch) — the
    * online form of q_semdedup, structurally [[spanDedupIngest]] on
    * the embedding side. Per-batch verdicts (id, cluster, dropped) go
    * to `outPath` under the `batch_id=N` dynamic-partition overwrite;
    * index growth is the first-delivery-wins anti-join append, so a
    * checkpoint replay re-scores against the same members it saw
    * (already-appended ids never match themselves) and commits an
    * empty delta — verdicts are replay-stable and the index holds one
    * row per vector id.
    */
  def semdedupIngest(stream: DataFrame, indexPath: String, outPath: String,
                     checkpoint: String, tau: Double,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val vdir = graft.operators.Versioned.resolve(spark, indexPath)
            .getOrElse(throw new IllegalStateException(
              s"no committed semdedup index at $indexPath — " +
                "build one with Semdedup.writeIndex first"))
          val centroids = graft.functions.Semdedup.readCentroidsFrom(spark, vdir)
          val members = graft.functions.Semdedup.readMembersFrom(spark, vdir)
          graft.functions.Semdedup
            .dedupIncrement(batch, members, tau, centroids, idCol, vecCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
          graft.functions.Semdedup.appendIndex(batch, indexPath, idCol, vecCol)
          ()
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming BM25 retrieval: each micro-batch of QUERY documents
    * retrieves its top-k corpus hits from a PERSISTED lexical index
    * ([[graft.functions.Retrieval.writeLexicalIndex]] — tf/df/stats
    * under a [[graft.operators.Versioned]] root, so a corpus rebuild
    * lands atomically mid-stream and applies from the next
    * micro-batch) — the online face of q_bm25, same shape as
    * [[annScoreIngest]] on the embedding side. Per-batch results go
    * to `outPath` under the `batch_id=N` dynamic-partition overwrite
    * (checkpoint replays rewrite their own partition; source-level
    * redelivery produces value-identical rows — scoring is
    * deterministic for a given index version — so consumers dedup on
    * the query id at read, as with [[decontamIngest]]).
    */
  def bm25QueryIngest(stream: DataFrame, indexPath: String, outPath: String,
                      checkpoint: String, idCol: String = "doc_id",
                      textCol: String = "text", topK: Int = 5): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val vdir = graft.operators.Versioned.resolve(spark, indexPath)
            .getOrElse(throw new IllegalStateException(
              s"no committed lexical index at $indexPath — " +
                "build one with Retrieval.writeLexicalIndex first"))
          graft.functions.Retrieval
            .bm25TopKIndexed(spark, vdir, batch, idCol, textCol, topK)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming importance scoring: each micro-batch of CANDIDATE
    * documents is scored against a PERSISTED selection model
    * ([[graft.functions.Selection.writeImportanceModel]] — per-token
    * log-ratio table + unseen-token defaults under a
    * [[graft.operators.Versioned]] root) — the online face of
    * q_importance, and the deployment shape of DSIR-style data
    * selection: train the model once on curated target + raw pools,
    * score every incoming crawl batch as it arrives. Out-of-
    * vocabulary tokens (in NEITHER training pool) take the model's
    * `lr_unseen` scalar. A model retrain lands atomically mid-stream
    * and applies from the next micro-batch (per-batch resolve).
    * Per-batch results go to `outPath` under the `batch_id=N`
    * dynamic-partition overwrite — checkpoint replays rewrite their
    * own partition; source-level redelivery produces value-identical
    * rows (scoring is deterministic for a given model version), so
    * consumers dedup on the doc id at read, as with
    * [[decontamIngest]].
    */
  def importanceIngest(stream: DataFrame, modelPath: String, outPath: String,
                       checkpoint: String, idCol: String = "doc_id",
                       textCol: String = "text"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val vdir = graft.operators.Versioned.resolve(spark, modelPath)
            .getOrElse(throw new IllegalStateException(
              s"no committed importance model at $modelPath — " +
                "build one with Selection.writeImportanceModel first"))
          graft.functions.Selection
            .scoreImportanceIndexed(spark, vdir, batch, idCol, textCol)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming growth of the persisted near-dup GRAPH index
    * ([[graft.functions.GraphIndex]]): each document micro-batch
    * appends O(batch + touched) postings/df/edge deltas — exact under
    * corpus-global df-band transitions, see the GraphIndex doc — and
    * the batch's RE-JUDGED edge set (every pair the batch could have
    * changed: created, updated, or now-absent support between OLD
    * docs included) lands at `outPath` under the `batch_id=N`
    * dynamic-partition overwrite sink.
    *
    * Replay-safe by construction: appendIndex drops already-indexed
    * doc ids (first delivery wins), so a checkpoint replay or source
    * redelivery commits NO delta and overwrites nothing — the folded
    * edge set equals a batch rebuild over everything delivered, which
    * GraphIndexSpec pins through a channel-driven run.
    */
  def graphIngest(stream: DataFrame, indexPath: String, outPath: String,
                  checkpoint: String, idCol: String = "doc_id",
                  textCol: String = "text"): StreamingQuery =
    graphDerivedIngest(stream, indexPath, outPath, checkpoint, idCol, textCol) {
      (spark, deltaDir) => spark.read.parquet(s"$deltaDir/edges")
    }

  /** The shared skeleton of the three graph-backed ingest faces
    * (graphIngest / clusterIngest / corenessIngest): append the
    * batch's graph delta first-delivery-wins, derive the rows to emit
    * from that delta via `derive`, and land them under the
    * `batch_id=N` dynamic-partition overwrite sink. The crash window
    * between the graph commit and the sink write heals by the batch
    * tag: the replayed batch re-locates ITS graph delta and re-runs
    * `derive` — whose output must be content-identical from the same
    * inputs (true for a plain delta read and for the
    * Cluster/CorenessIndex updateFromDelta recomputation) — so the
    * partition rewrite is idempotent. A plain source redelivery
    * carries a new tag, finds nothing, and emits nothing.
    */
  private def graphDerivedIngest(stream: DataFrame, graphPath: String,
                                 outPath: String, checkpoint: String,
                                 idCol: String, textCol: String)
                                (derive: (SparkSession, String) => DataFrame)
                                : StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          def emit(graphDelta: String): Unit =
            derive(spark, graphDelta)
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
          graft.functions.GraphIndex
            .appendIndex(batch, idCol, textCol, graphPath, Some(tag)) match {
            case Some(deltaDir) => emit(deltaDir)
            case None =>
              graft.operators.Versioned.resolve(spark, graphPath).foreach { vdir =>
                graft.functions.GraphIndex.deltaByTag(spark, vdir, tag).foreach(emit)
              }
          }
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming growth of graph index AND the derived cluster
    * labeling ([[graft.functions.ClusterIndex]]): each document
    * micro-batch appends its graph delta, then re-labels exactly the
    * touched components, and the batch's revised (id, label) rows
    * land at `outPath` under the `batch_id=N` dynamic-partition
    * overwrite sink — so near-dup cluster membership stays a lookup
    * while the corpus streams in.
    *
    * Replay discipline: the graph append is first-delivery-wins, so a
    * plain redelivery commits nothing and emits nothing. The crash
    * window between the graph commit and the cluster update heals by
    * the batch tag: the replayed batch re-locates ITS graph delta and
    * re-runs the cluster update — updateFromDelta recomputes the same
    * labels from the same inputs, so the duplicate cluster delta is
    * content-identical and last-writer-wins folding is unchanged.
    */
  def clusterIngest(stream: DataFrame, graphPath: String, clusterPath: String,
                    outPath: String, checkpoint: String,
                    idCol: String = "doc_id",
                    textCol: String = "text"): StreamingQuery =
    graphDerivedIngest(stream, graphPath, outPath, checkpoint, idCol, textCol) {
      (spark, graphDelta) =>
        val cd = graft.functions.ClusterIndex
          .updateFromDelta(spark, graphPath, clusterPath, graphDelta)
        spark.read.parquet(s"$cd/labels")
    }

  /** Streaming growth of the graph index AND the derived CORENESS
    * labeling ([[graft.functions.CorenessIndex]]): each document
    * micro-batch appends its graph delta, then re-peels exactly the
    * touched components (coreness is component-local — the
    * [[graft.functions.ClusterIndex]] closure argument carries over),
    * and the batch's revised (id, label, coreness) rows land at
    * `outPath` under the `batch_id=N` dynamic-partition overwrite
    * sink — the density-governance number stays a label lookup while
    * the corpus streams in, never a per-run corpus-scale fixpoint.
    *
    * Replay discipline (the clusterIngest convention exactly): the
    * graph append is first-delivery-wins, so a plain redelivery
    * commits nothing and emits nothing; the crash window between the
    * graph commit and the coreness update heals by the batch tag —
    * the replayed batch re-locates ITS graph delta and re-runs the
    * update, whose output is content-identical from the same inputs,
    * so last-writer-wins folding is unchanged.
    */
  def corenessIngest(stream: DataFrame, graphPath: String,
                     corenessPath: String, outPath: String,
                     checkpoint: String, idCol: String = "doc_id",
                     textCol: String = "text"): StreamingQuery =
    graphDerivedIngest(stream, graphPath, outPath, checkpoint, idCol, textCol) {
      (spark, graphDelta) =>
        val cd = graft.functions.CorenessIndex
          .updateFromDelta(spark, graphPath, corenessPath, graphDelta)
        spark.read.parquet(s"$cd/labels")
    }

  /** Streaming growth of the persisted record-linkage index
    * ([[graft.functions.LinkageIndex]]): each micro-batch of records
    * appends in O(batch + touched buckets) — the batch's
    * deletion-neighborhood keys probe only the buckets they touch,
    * only pairs with a fresh side verify — and the batch's NEW
    * verified (id_a, id_b, dist) pairs land at `outPath` under the
    * `batch_id=N` dynamic-partition overwrite sink. A production
    * linkage pipeline is incremental by nature: matches surface as
    * records arrive, and [[graft.functions.LinkageIndex.readPairs]]
    * stays the always-current serve.
    *
    * Replay discipline (the graphIngest convention): the append is
    * first-delivery-wins (already-indexed ids drop), so a plain
    * redelivery commits nothing and emits nothing; the crash window
    * between the delta commit and the sink write heals by the batch
    * tag — the replayed batch re-locates ITS OWN delta
    * ([[graft.functions.LinkageIndex.deltaByTag]], compaction-proof
    * via [[graft.operators.TagHeal]]) and rewrites its partition
    * idempotently.
    */
  /** Streaming near-dup screening through the persisted MinHash
    * signature index ([[graft.functions.MinhashIndex]], round 18):
    * each document micro-batch is signed once, probed against the
    * CURRENT band table (O(batch + matched buckets) — corpus text
    * never re-scanned), its (id_a = indexed doc, id_b = batch doc,
    * est_jaccard ≥ minEst) matches land at `outPath` under the
    * `batch_id=N` dynamic-partition sink, and the batch's signatures
    * then append as one tagged delta so FUTURE batches dedup against
    * it.
    *
    * Replay safety: scoring excludes the batch's own tagged delta
    * (the [[dedupIngest]]/readHashIndex convention), so a crash
    * between append and checkpoint commit re-scores the replay
    * identically — never against the batch's own signatures — and
    * the idempotent append (known ids anti-joined) refuses the
    * double delta while the partition overwrite rewrites the same
    * sink rows in place: exactly-once EFFECT on index and sink.
    */
  def minhashIngest(stream: DataFrame, indexPath: String, outPath: String,
                    checkpoint: String, idCol: String = "doc_id",
                    textCol: String = "text",
                    minEstJaccard: Double = 0.5): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          val vdir = graft.operators.Versioned.resolve(spark, indexPath)
            .getOrElse(sys.error(
              s"minhashIngest needs a committed MinhashIndex at $indexPath " +
                "(MinhashIndex.writeIndex builds it from the base corpus)"))
          graft.functions.MinhashIndex
            .candidates(spark, vdir, batch, idCol, textCol, minEstJaccard,
              excludeTag = Some(tag))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
          graft.functions.MinhashIndex
            .appendIndex(spark, indexPath, vdir, batch, idCol, textCol,
              Some(tag))
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming near-dup screening through the persisted SimHash index
    * ([[graft.functions.SimhashIndex]], round 18) — the
    * [[minhashIngest]] loop with the pigeonhole-band sketch: each
    * document micro-batch is hashed once, probed against the CURRENT
    * band table (hamming ≤ MaxHamming matches, corpus text never
    * re-scanned), matches land under the `batch_id=N` sink, and the
    * batch's simhashes append as one tagged delta so FUTURE batches
    * dedup against it. Same replay discipline: scoring excludes the
    * batch's own tagged delta; a redelivered doc self-matches at
    * hamming 0 — the "already indexed" signal.
    */
  def simhashIngest(stream: DataFrame, indexPath: String, outPath: String,
                    checkpoint: String, idCol: String = "doc_id",
                    textCol: String = "text"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          val vdir = graft.operators.Versioned.resolve(spark, indexPath)
            .getOrElse(sys.error(
              s"simhashIngest needs a committed SimhashIndex at $indexPath " +
                "(SimhashIndex.writeIndex builds it from the base corpus)"))
          graft.functions.SimhashIndex
            .candidates(spark, vdir, batch, idCol, textCol,
              excludeTag = Some(tag))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
          graft.functions.SimhashIndex
            .appendIndex(spark, indexPath, vdir, batch, idCol, textCol,
              Some(tag))
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  def linkageIngest(stream: DataFrame, indexPath: String, outPath: String,
                    checkpoint: String, idCol: String = "id",
                    nameCol: String = "name",
                    blockCols: Seq[String] = Seq("block")): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          def emit(deltaDir: String): Unit =
            spark.read.parquet(s"$deltaDir/pairs")
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
          graft.functions.LinkageIndex
            .appendIndex(batch, idCol, nameCol, blockCols, indexPath,
              Some(tag)) match {
            case Some(deltaDir) => emit(deltaDir)
            case None =>
              graft.operators.Versioned.resolve(spark, indexPath).foreach { vdir =>
                graft.functions.LinkageIndex.deltaByTag(spark, vdir, tag)
                  .foreach(emit)
              }
          }
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming growth of the persisted similarity-join index
    * ([[graft.functions.SimJoinIndex]]): each document micro-batch
    * appends in O(batch + touched postings) — the batch's prefixes
    * (ranked under the STORED Ω) probe only the postings they touch —
    * and the batch's NEW verified (id_a, id_b, jaccard) pairs land at
    * `outPath` under the `batch_id=N` sink. Same replay discipline as
    * [[linkageIngest]]: first-delivery-wins append, tag-healed crash
    * window, plain redeliveries emit nothing.
    */
  def simjoinIngest(stream: DataFrame, indexPath: String, outPath: String,
                    checkpoint: String, idCol: String = "doc_id",
                    textCol: String = "text"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          def emit(deltaDir: String): Unit =
            spark.read.parquet(s"$deltaDir/pairs")
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
          graft.functions.SimJoinIndex
            .appendIndex(batch, idCol, textCol, indexPath, Some(tag)) match {
            case Some(deltaDir) => emit(deltaDir)
            case None =>
              graft.operators.Versioned.resolve(spark, indexPath).foreach { vdir =>
                graft.functions.SimJoinIndex.deltaByTag(spark, vdir, tag)
                  .foreach(emit)
              }
          }
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming growth of the persisted sketch PROFILE
    * ([[graft.functions.SketchProfile]]): each document micro-batch
    * appends its per-source sketch partial (KBs), and the CURRENT
    * folded estimates land at `outPath` under the `batch_id=N`
    * dynamic-partition overwrite sink — a continuously-updated corpus
    * monitor that never re-reads old data.
    *
    * Sketch merges are NOT idempotent, so replay safety rides the
    * batch tag (query-id + batch-id): a redelivered batch's append is
    * refused, and the estimates are re-emitted idempotently from the
    * already-committed state — exactly-once EFFECT on both the index
    * and the sink.
    */
  def profileIngest(stream: DataFrame, indexPath: String, outPath: String,
                    checkpoint: String, idCol: String = "doc_id",
                    textCol: String = "text",
                    srcCol: String = "source"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          graft.functions.SketchProfile.appendBatch(
            batch, idCol, textCol, srcCol, indexPath, Some(tag))
          val vdir = graft.operators.Versioned.resolve(spark, indexPath).get
          graft.functions.SketchProfile.readEstimates(spark, vdir)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Streaming growth of the persisted HEALTH profile
    * ([[graft.functions.HealthProfile]]): each document micro-batch
    * appends its (source × distinct-lengths)-bounded count partial,
    * and the CURRENT exact KS drift report lands at `outPath` under
    * the `batch_id=N` dynamic-partition overwrite sink — continuous
    * distribution-drift monitoring that never re-reads old data.
    *
    * Count merges are NOT idempotent, so replay safety rides the
    * batch tag (query-id + batch-id), exactly the [[profileIngest]]
    * discipline: a redelivered batch's append is refused and the
    * report re-emits idempotently from the committed state.
    */
  def healthIngest(stream: DataFrame, indexPath: String, outPath: String,
                   checkpoint: String, srcCol: String = "source",
                   lenCol: String = "n_chars"): StreamingQuery = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val tag = batchTag(spark, checkpoint, batchId)
          graft.functions.HealthProfile.appendBatch(
            batch, srcCol, lenCol, indexPath, Some(tag))
          val vdir = graft.operators.Versioned.resolve(spark, indexPath).get
          graft.functions.HealthProfile.readKs(spark, vdir)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()
    q.processAllAvailable()
    q
  }

  /** Durable sink: append the stream to a parquet directory with a
    * checkpoint (exactly-once file sink). The production counterpart
    * of [[runToMemory]] — same query, swap the sink.
    */
  def runToParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery = {
    val q = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q
  }

  /** Runs a streaming DataFrame into an in-memory table and blocks
    * until all currently-available input is processed — the
    * synchronous-aggregation face of a streaming pipeline.
    */
  def runToMemory(df: DataFrame, name: String,
                  outputMode: String = "complete"): StreamingQuery = {
    // default micro-batch trigger (not AvailableNow, which would stop
    // the query and ignore elements sent afterwards)
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q
  }
}
