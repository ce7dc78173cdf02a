package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

import scala.util.{Failure, Success, Try}

/** One transformation step (reference stages/stage.go + stages/
  * transform/transform.go). A Stage wraps a `Dataset[T]` — it holds
  * no data, only the logical plan up to this point, so chaining
  * stages is free and Catalyst optimizes across all of them.
  *
  * Error-handling variants mirror the reference exactly:
  *  - `mapWithError` (transform.go:53): failing elements are dropped
  *    after the error handler side-effect runs (on the executor).
  *  - `mapWithErrorMapper` (transform.go:82): failing elements are
  *    replaced by the fallback produced from the error.
  *
  * Stage ids follow the reference rule: auto = 1 + previous stage's
  * id, unless a `customId` is configured.
  */
final class Stage[T] private[pipeline] (
    val ctx: PipelineCtx,
    val ds: Dataset[T],
    val id: Long,
    val conf: StageConfig) {

  private def next[U](ds2: Dataset[U], c: StageConfig): Stage[U] = {
    val nid = if (c.customId != 0L) c.customId else id + 1
    new Stage[U](ctx, Stage.bound(ds2, c, ctx.config), nid, c)
  }

  /** Reference transform.Map: 1→1. */
  def map[U: Encoder](f: T => U, c: StageConfig = StageConfig()): Stage[U] =
    next(ds.map(f), c)

  /** Reference transform.MapWithError: apply `f`; on failure run the
    * (serializable) `onError` side-effect and drop the element.
    */
  def mapWithError[U: Encoder](f: T => U, onError: Throwable => Unit,
                               c: StageConfig = StageConfig()): Stage[U] =
    next(ds.flatMap { t =>
      Try(f(t)) match {
        case Success(u) => Iterator.single(u)
        case Failure(e) => onError(e); Iterator.empty
      }
    }, c)

  /** Reference transform.MapWithErrorMapper: apply `f`; on failure
    * substitute `onErrorMap(error)`.
    */
  def mapWithErrorMapper[U: Encoder](f: T => U, onErrorMap: Throwable => U,
                                     c: StageConfig = StageConfig()): Stage[U] =
    next(ds.map { t =>
      Try(f(t)) match {
        case Success(u) => u
        case Failure(e) => onErrorMap(e)
      }
    }, c)

  /** Reference transform.FlatMap: defined on stages of collections —
    * maps each inner element and flattens.
    */
  def flatMap[E, U: Encoder](f: E => U, c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): Stage[U] =
    next(ds.flatMap(t => ev(t).iterator.map(f)), c)

  /** Reference transform.FlatMapWithError: failing inner elements are
    * dropped after the error side-effect.
    */
  def flatMapWithError[E, U: Encoder](f: E => U, onError: Throwable => Unit,
                                      c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): Stage[U] =
    next(ds.flatMap(t => ev(t).iterator.flatMap { e =>
      Try(f(e)) match {
        case Success(u) => Iterator.single(u)
        case Failure(err) => onError(err); Iterator.empty
      }
    }), c)

  /** Reference transform.FlatMapWithErrorMapper: failing inner
    * elements are substituted via `onErrorMap`.
    */
  def flatMapWithErrorMapper[E, U: Encoder](f: E => U, onErrorMap: Throwable => U,
                                            c: StageConfig = StageConfig())(
      implicit ev: T => IterableOnce[E]): Stage[U] =
    next(ds.flatMap(t => ev(t).iterator.map { e =>
      Try(f(e)) match {
        case Success(u) => u
        case Failure(err) => onErrorMap(err)
      }
    }), c)

  /** Idiomatic-Scala flatMap (T → many U) — a superset of the
    * reference surface, kept because Spark users expect it.
    */
  def flatMapAll[U: Encoder](f: T => IterableOnce[U], c: StageConfig = StageConfig()): Stage[U] =
    next(ds.flatMap(f), c)

  /** Reference transform.Filter. */
  def filter(p: T => Boolean, c: StageConfig = StageConfig()): Stage[T] =
    next(ds.filter(p), c)

  /** Column-level escape hatch: hand the stage to the DataFrame API
    * (codegen'd expressions instead of lambdas) and back.
    */
  def toDF: DataFrame = ds.toDF()
}

object Stage {
  /** Applies the effective parallelism bound: stage override, else
    * pipeline per-stage, else pipeline total (reference rate-limiter
    * precedence). `coalesce` narrows without a shuffle but fuses with
    * upstream narrow stages (bounding them too — see StageConfig doc);
    * `isolateBound` switches to `repartition`, whose shuffle barrier
    * keeps upstream parallelism intact. Widening via `coalesce` is a
    * no-op, so an over-generous bound costs nothing.
    */
  private[pipeline] def bound[U](ds: Dataset[U], c: StageConfig,
                                 pc: PipelineConfig): Dataset[U] = {
    val n =
      if (c.maxParallelism > 0) c.maxParallelism
      else if (pc.maxParallelismPerStage > 0) pc.maxParallelismPerStage
      else pc.maxParallelismTotal
    if (n <= 0) ds
    else if (c.isolateBound) ds.repartition(n)
    else ds.coalesce(n)
  }
}
