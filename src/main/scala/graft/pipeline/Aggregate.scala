package graft.pipeline

import scala.reflect.ClassTag
import scala.util.Try

/** Synchronous (blocking) terminal aggregations — reference
  * `stages/aggregate` package. Each returns `Try[R]`, the Scala
  * analogue of the reference's `(*R, error)`: `Failure` when the
  * pipeline was interrupted or timed out before completing.
  */
object Aggregate {
  private def run[R](s: Stage[_], c: StageConfig)(body: => R): Try[R] =
    s.ctx.runSync(c)(body)

  def sum[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): Try[T] =
    run(s, c)(AggOps.sum(s))

  def sumComplexType(s: Stage[Complex], c: StageConfig = StageConfig()): Try[Complex] =
    run(s, c)(AggOps.sumComplex(s))

  def avg[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): Try[Double] =
    run(s, c)(AggOps.avg(s))

  def avgComplexType(s: Stage[Complex], c: StageConfig = StageConfig()): Try[Complex] =
    run(s, c)(AggOps.avgComplex(s))

  def max[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): Try[T] =
    run(s, c)(AggOps.max(s))

  def min[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): Try[T] =
    run(s, c)(AggOps.min(s))

  def count[T](s: Stage[T], c: StageConfig = StageConfig()): Try[Long] =
    run(s, c)(AggOps.count(s))

  def sort[T: Ordering: ClassTag](s: Stage[T], c: StageConfig = StageConfig()): Try[Seq[T]] =
    run(s, c)(AggOps.sort(s))

  def sortDesc[T: Ordering: ClassTag](s: Stage[T], c: StageConfig = StageConfig()): Try[Seq[T]] =
    run(s, c)(AggOps.sortDesc(s))

  def groupBy[T, K: ClassTag](s: Stage[T], f: T => K,
                              c: StageConfig = StageConfig()): Try[Map[K, Seq[T]]] =
    run(s, c)(AggOps.groupBy(s, f))

  def reduce[T](s: Stage[T], f: (T, T) => T, c: StageConfig = StageConfig()): Try[T] =
    run(s, c)(AggOps.reduce(s, f))

  def asSlice[T](s: Stage[T], c: StageConfig = StageConfig()): Try[Seq[T]] =
    run(s, c)(AggOps.asSlice(s))

  def asMap[T, K: ClassTag, V: ClassTag](s: Stage[T], f: T => (K, V),
                                         c: StageConfig = StageConfig()): Try[Map[K, V]] =
    run(s, c)(AggOps.asMap(s, f))

  def asMultiMap[T, K: ClassTag, V: ClassTag](s: Stage[T], f: T => (K, V),
                                              c: StageConfig = StageConfig()): Try[Map[K, Seq[V]]] =
    run(s, c)(AggOps.asMultiMap(s, f))

  def forEach[T](s: Stage[T], f: T => Unit, c: StageConfig = StageConfig()): Try[Unit] =
    run(s, c)(AggOps.forEach(s, f))

  def distinct[T](s: Stage[T], c: StageConfig = StageConfig()): Try[Seq[T]] =
    run(s, c)(AggOps.distinct(s))

  def distinctCount[T](s: Stage[T], c: StageConfig = StageConfig()): Try[Long] =
    run(s, c)(AggOps.distinctCount(s))
}

/** Asynchronous terminal aggregations — reference
  * `stages/asyncaggregate` package. Same bodies, but each returns a
  * [[GraftFuture]] immediately; the Spark action runs on the pipeline
  * pool and honors manual start (waits for `start()`), interruption
  * and timeouts.
  */
object AsyncAggregate {
  private def run[R](s: Stage[_], c: StageConfig)(body: => R): GraftFuture[R] =
    s.ctx.runAsync(c)(body)

  def sum[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[T] =
    run(s, c)(AggOps.sum(s))

  def sumComplexType(s: Stage[Complex], c: StageConfig = StageConfig()): GraftFuture[Complex] =
    run(s, c)(AggOps.sumComplex(s))

  def avg[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Double] =
    run(s, c)(AggOps.avg(s))

  def avgComplexType(s: Stage[Complex], c: StageConfig = StageConfig()): GraftFuture[Complex] =
    run(s, c)(AggOps.avgComplex(s))

  def max[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[T] =
    run(s, c)(AggOps.max(s))

  def min[T: Numeric](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[T] =
    run(s, c)(AggOps.min(s))

  def count[T](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Long] =
    run(s, c)(AggOps.count(s))

  def sort[T: Ordering: ClassTag](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Seq[T]] =
    run(s, c)(AggOps.sort(s))

  def sortDesc[T: Ordering: ClassTag](s: Stage[T],
                                      c: StageConfig = StageConfig()): GraftFuture[Seq[T]] =
    run(s, c)(AggOps.sortDesc(s))

  def groupBy[T, K: ClassTag](s: Stage[T], f: T => K,
                              c: StageConfig = StageConfig()): GraftFuture[Map[K, Seq[T]]] =
    run(s, c)(AggOps.groupBy(s, f))

  def reduce[T](s: Stage[T], f: (T, T) => T, c: StageConfig = StageConfig()): GraftFuture[T] =
    run(s, c)(AggOps.reduce(s, f))

  def asSlice[T](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Seq[T]] =
    run(s, c)(AggOps.asSlice(s))

  def asMap[T, K: ClassTag, V: ClassTag](s: Stage[T], f: T => (K, V),
                                         c: StageConfig = StageConfig()): GraftFuture[Map[K, V]] =
    run(s, c)(AggOps.asMap(s, f))

  def asMultiMap[T, K: ClassTag, V: ClassTag](
      s: Stage[T], f: T => (K, V),
      c: StageConfig = StageConfig()): GraftFuture[Map[K, Seq[V]]] =
    run(s, c)(AggOps.asMultiMap(s, f))

  def forEach[T](s: Stage[T], f: T => Unit, c: StageConfig = StageConfig()): GraftFuture[Unit] =
    run(s, c)(AggOps.forEach(s, f))

  def distinct[T](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Seq[T]] =
    run(s, c)(AggOps.distinct(s))

  def distinctCount[T](s: Stage[T], c: StageConfig = StageConfig()): GraftFuture[Long] =
    run(s, c)(AggOps.distinctCount(s))
}
