package graft.pipeline

import graft.streaming.Streams
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.StreamingQuery

import java.util.concurrent.CopyOnWriteArrayList
import scala.reflect.ClassTag
import scala.util.Try

/** A channel-sourced pipeline with the FULL pipeline lifecycle —
  * the reference's `pipeline.FromChannel`
  * (/root/reference/pipeline/pipeline.go:131-170), where the channel
  * source is wired into the same pipeline object as slice/map sources:
  * Status, Start (manual), Interrupt, pipeline/stage timeouts and the
  * configured logger all apply.
  *
  * `S` is the channel's element type (so `send`/`closeChannel` stay
  * typed through the transform chain), `T` the current stage's type.
  *
  * Execution model: transforms chain LAZILY on the unbounded streaming
  * Dataset (same [[Stage]] machinery as batch pipelines — Catalyst
  * plans them incrementally per micro-batch). A terminal aggregation,
  * exactly as in the reference, blocks until the channel is closed:
  * it waits for `channel.close()` (responsive to Interrupt and
  * timeouts), drains the transformed stream once through a
  * foreachBatch micro-batch query into parquet (executor-side — never
  * buffered on the driver), and runs the aggregation on the drained
  * result — so all 17
  * sync + async aggregations work on channel pipelines with identical
  * semantics to slice-sourced ones. At cluster scale the same
  * transform chain runs unbounded via [[graft.streaming.Streams]]
  * (watermarked windows, custom state) — a blocking aggregation over
  * an infinite source is a finite-stream conclusion by definition,
  * which is also true of the reference (its channel aggregations
  * return only after `close(ch)`).
  */
final class ChannelPipeline[S, T] private[pipeline] (
    val ctx: PipelineCtx,
    val channel: Streams.Channel[S],
    private val stage: Stage[T],
    private val enc: Encoder[T],
    private val active: CopyOnWriteArrayList[StreamingQuery],
    private val drainDirs: CopyOnWriteArrayList[java.nio.file.Path]) extends AutoCloseable {

  def status: Status = ctx.status
  def start(): Boolean = ctx.start()

  /** Reference Pipeline.Interrupt: cancels the pipeline's Spark jobs
    * AND stops any in-flight drain query (streaming queries run on
    * engine threads a job-group cancel does not reach).
    */
  def interrupt(): Unit = {
    ctx.interrupt()
    active.forEach(q => Try(q.stop()))
  }

  /** Typed send to the source channel (Go: `ch <- e`). */
  def send(es: S*): Unit = channel.send(es: _*)

  /** End-of-stream (Go: `close(ch)`): unblocks terminal aggregations
    * once the sent elements are drained.
    */
  def closeChannel(): Unit = channel.close()

  /** Reference Pipeline.Close: interrupt outstanding work, delete the
    * pipeline's drain dirs, close the logger. (The channel itself is
    * closed via [[closeChannel]].)
    */
  override def close(): Unit = {
    if (status == Status.Running || status == Status.Pending) interrupt()
    drainDirs.forEach { p =>
      Try(ChannelPipeline.deleteRecursively(p.toFile))
    }
    drainDirs.clear()
    ctx.config.logger.close()
  }

  /** The transformed unbounded stream — compose with
    * [[graft.streaming.Streams]] (windowed aggs, sessionize, dedup,
    * sinks) for the genuinely-streaming consumption patterns the
    * reference cannot express.
    */
  def toDS: Dataset[T] = stage.ds

  private def chain[U](s2: Stage[U])(implicit e: Encoder[U]): ChannelPipeline[S, U] =
    new ChannelPipeline[S, U](ctx, channel, s2, e, active, drainDirs)

  // ---- transforms (same semantics as Stage; lazily streamed) ----

  def map[U: Encoder](f: T => U, c: StageConfig = StageConfig()): ChannelPipeline[S, U] =
    chain(stage.map(f, c))

  def mapWithError[U: Encoder](f: T => U, onError: Throwable => Unit,
                               c: StageConfig = StageConfig()): ChannelPipeline[S, U] =
    chain(stage.mapWithError(f, onError, c))

  def mapWithErrorMapper[U: Encoder](f: T => U, onErrorMap: Throwable => U,
                                     c: StageConfig = StageConfig()): ChannelPipeline[S, U] =
    chain(stage.mapWithErrorMapper(f, onErrorMap, c))

  def flatMap[E, U: Encoder](f: E => U, c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): ChannelPipeline[S, U] =
    chain(stage.flatMap(f, c))

  def flatMapWithError[E, U: Encoder](f: E => U, onError: Throwable => Unit,
                                      c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): ChannelPipeline[S, U] =
    chain(stage.flatMapWithError(f, onError, c))

  def flatMapWithErrorMapper[E, U: Encoder](f: E => U, onErrorMap: Throwable => U,
                                            c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): ChannelPipeline[S, U] =
    chain(stage.flatMapWithErrorMapper(f, onErrorMap, c))

  def flatMapAll[U: Encoder](f: T => IterableOnce[U],
                             c: StageConfig = StageConfig()): ChannelPipeline[S, U] =
    chain(stage.flatMapAll(f, c))

  def filter(p: T => Boolean, c: StageConfig = StageConfig()): ChannelPipeline[S, T] =
    new ChannelPipeline[S, T](ctx, channel, stage.filter(p, c), enc, active, drainDirs)

  // ---- terminal aggregations ----

  /** Blocks until the channel is closed (responsive to interrupt /
    * timeout via the pipeline status the awaiter flips), then drains
    * the transformed stream ONCE via foreachBatch into a temp parquet
    * dir and returns a batch Stage over those files. Runs INSIDE
    * runSync/runAsync so the whole wait+drain is covered by the
    * pipeline's deadline.
    *
    * Parquet, not an in-memory table, deliberately: a memory sink
    * buffers the entire drained stream in DRIVER memory, which only
    * works while the source itself is driver-fed — swap in a
    * distributed source and it becomes the scale-killer. foreachBatch
    * writes flow executor→files, so aggregations over the drained
    * Stage stay distributed at any volume. The drain result is cached
    * per pipeline object — every subsequent aggregation on this
    * object reuses the same files instead of re-draining the stream
    * (re-drains relied on fragile MemoryStream commit timing). Dirs
    * are deleted in [[close]].
    */
  private def drained(): Stage[T] = {
    while (!channel.isClosed &&
        ctx.status != Status.Interrupted && ctx.status != Status.TimedOut) {
      Thread.sleep(20)
    }
    if (ctx.status == Status.Interrupted || ctx.status == Status.TimedOut)
      throw new InterruptedException(s"pipeline ${ctx.jobGroup} ${ctx.status} while draining channel")
    drainLock.synchronized {
      if (drainedStage != null) return drainedStage
      val spark = stage.ds.sparkSession
      val dir = java.nio.file.Files.createTempDirectory(
        s"graft_drain_${ctx.jobGroup.replace('-', '_')}_")
      drainDirs.add(dir)
      val writeBatch: (Dataset[T], Long) => Unit =
        (batch, _) => batch.write.mode("append").parquet(dir.toString)
      val q = stage.ds.writeStream.foreachBatch(writeBatch).outputMode("append").start()
      active.add(q)
      try q.processAllAvailable()
      finally {
        Try(q.stop())
        active.remove(q)
      }
      // an interrupt that landed mid-drain stopped the query early;
      // caching the partial files would serve wrong answers forever
      if (ctx.status == Status.Interrupted || ctx.status == Status.TimedOut)
        throw new InterruptedException(s"pipeline ${ctx.jobGroup} ${ctx.status} while draining channel")
      // explicit schema: a zero-element drain leaves no files to infer from
      val batch = spark.read.schema(stage.ds.schema).parquet(dir.toString).as[T](enc)
      drainedStage = new Stage[T](ctx, batch, stage.id, stage.conf)
      drainedStage
    }
  }

  private val drainLock = new Object
  @volatile private var drainedStage: Stage[T] = _

  /** Generic sync aggregation over the drained channel contents. */
  def aggregate[R](act: Stage[T] => R, c: StageConfig = StageConfig()): Try[R] =
    ctx.runSync(c)(act(drained()))

  /** Generic async aggregation (reference asyncaggregate semantics:
    * honors manual start, interrupt, timeouts; returns immediately).
    */
  def aggregateAsync[R](act: Stage[T] => R, c: StageConfig = StageConfig()): GraftFuture[R] =
    ctx.runAsync(c)(act(drained()))

  // the 17 reference aggregations, sync + async
  def sum(implicit num: Numeric[T]): Try[T] = aggregate(AggOps.sum(_))
  def sumComplexType(implicit ev: T =:= Complex): Try[Complex] =
    aggregate(s => AggOps.sumComplex(s.asInstanceOf[Stage[Complex]]))
  def avgComplexType(implicit ev: T =:= Complex): Try[Complex] =
    aggregate(s => AggOps.avgComplex(s.asInstanceOf[Stage[Complex]]))
  def avg(implicit num: Numeric[T]): Try[Double] = aggregate(AggOps.avg(_))
  def max(implicit num: Numeric[T]): Try[T] = aggregate(AggOps.max(_))
  def min(implicit num: Numeric[T]): Try[T] = aggregate(AggOps.min(_))
  def count: Try[Long] = aggregate(AggOps.count(_))
  def sort(implicit o: Ordering[T], t: ClassTag[T]): Try[Seq[T]] = aggregate(AggOps.sort(_))
  def sortDesc(implicit o: Ordering[T], t: ClassTag[T]): Try[Seq[T]] =
    aggregate(AggOps.sortDesc(_))
  def groupBy[K: ClassTag](f: T => K): Try[Map[K, Seq[T]]] = aggregate(AggOps.groupBy(_, f))
  def reduce(f: (T, T) => T): Try[T] = aggregate(AggOps.reduce(_, f))
  def asSlice: Try[Seq[T]] = aggregate(AggOps.asSlice(_))
  def asMap[K: ClassTag, V: ClassTag](f: T => (K, V)): Try[Map[K, V]] =
    aggregate(AggOps.asMap(_, f))
  def asMultiMap[K: ClassTag, V: ClassTag](f: T => (K, V)): Try[Map[K, Seq[V]]] =
    aggregate(AggOps.asMultiMap(_, f))
  def forEach(f: T => Unit): Try[Unit] = aggregate(AggOps.forEach(_, f))
  def distinct: Try[Seq[T]] = aggregate(AggOps.distinct(_))
  def distinctCount: Try[Long] = aggregate(AggOps.distinctCount(_))

  def sumAsync(implicit num: Numeric[T]): GraftFuture[T] = aggregateAsync(AggOps.sum(_))
  def sumComplexTypeAsync(implicit ev: T =:= Complex): GraftFuture[Complex] =
    aggregateAsync(s => AggOps.sumComplex(s.asInstanceOf[Stage[Complex]]))
  def avgComplexTypeAsync(implicit ev: T =:= Complex): GraftFuture[Complex] =
    aggregateAsync(s => AggOps.avgComplex(s.asInstanceOf[Stage[Complex]]))
  def avgAsync(implicit num: Numeric[T]): GraftFuture[Double] = aggregateAsync(AggOps.avg(_))
  def maxAsync(implicit num: Numeric[T]): GraftFuture[T] = aggregateAsync(AggOps.max(_))
  def minAsync(implicit num: Numeric[T]): GraftFuture[T] = aggregateAsync(AggOps.min(_))
  def countAsync: GraftFuture[Long] = aggregateAsync(AggOps.count(_))
  def sortAsync(implicit o: Ordering[T], t: ClassTag[T]): GraftFuture[Seq[T]] =
    aggregateAsync(AggOps.sort(_))
  def sortDescAsync(implicit o: Ordering[T], t: ClassTag[T]): GraftFuture[Seq[T]] =
    aggregateAsync(AggOps.sortDesc(_))
  def groupByAsync[K: ClassTag](f: T => K): GraftFuture[Map[K, Seq[T]]] =
    aggregateAsync(AggOps.groupBy(_, f))
  def reduceAsync(f: (T, T) => T): GraftFuture[T] = aggregateAsync(AggOps.reduce(_, f))
  def asSliceAsync: GraftFuture[Seq[T]] = aggregateAsync(AggOps.asSlice(_))
  def asMapAsync[K: ClassTag, V: ClassTag](f: T => (K, V)): GraftFuture[Map[K, V]] =
    aggregateAsync(AggOps.asMap(_, f))
  def asMultiMapAsync[K: ClassTag, V: ClassTag](f: T => (K, V)): GraftFuture[Map[K, Seq[V]]] =
    aggregateAsync(AggOps.asMultiMap(_, f))
  def forEachAsync(f: T => Unit): GraftFuture[Unit] = aggregateAsync(AggOps.forEach(_, f))
  def distinctAsync: GraftFuture[Seq[T]] = aggregateAsync(AggOps.distinct(_))
  def distinctCountAsync: GraftFuture[Long] = aggregateAsync(AggOps.distinctCount(_))
}

object ChannelPipeline {
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
