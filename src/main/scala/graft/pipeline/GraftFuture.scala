package graft.pipeline

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, Future}
import scala.util.Try

/** Async-aggregation result handle, mirroring the reference's
  * `types.Future` (/root/reference/types/future.go: Get /
  * GetWithTimeout / IsDone), backed by a Scala [[Future]] running a
  * Spark action in its own job group so [[Pipeline.interrupt]] can
  * cancel it.
  */
final class GraftFuture[T](private val underlying: Future[T]) {

  /** Blocks until the value is available. Failure means the pipeline
    * was interrupted / timed out before completing.
    */
  def get(): Try[T] = Try(Await.result(underlying, Duration.Inf))

  /** Blocks until the value is available or the timeout elapses. */
  def getWithTimeout(timeout: Duration): Try[T] =
    Try(Await.result(underlying, timeout))

  /** Non-blocking completion check. */
  def isDone: Boolean = underlying.isCompleted

  /** Escape hatch to compose with the wider Scala ecosystem. */
  def toFuture: Future[T] = underlying
}
