package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

/** Future semantics (reference types/future.go) + lifecycle:
  * manual start, interruption, timeouts.
  */
class AsyncAggregateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("async sum completes and reports isDone") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3))
    val fut = AsyncAggregate.sum(p.initStage)
    assert(fut.get() == scala.util.Success(6))
    assert(fut.isDone)
  }

  test("getWithTimeout returns within the deadline") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3))
    val fut = AsyncAggregate.count(p.initStage)
    assert(fut.getWithTimeout(30.seconds) == scala.util.Success(3L))
  }

  test("getWithTimeout fails when the result is not ready in time") {
    val p = Pipeline.fromSeq(spark, 1 to 40)
    val slow = p.initStage.map { i => Thread.sleep(200); i }
    val fut = AsyncAggregate.sum(slow)
    assert(fut.getWithTimeout(20.millis).isFailure)
  }

  test("manual start: async aggregation waits for start()") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3), PipelineConfig(manualStart = true))
    assert(p.status == Status.Pending)
    val fut = AsyncAggregate.sum(p.initStage)
    Thread.sleep(100)
    assert(!fut.isDone) // blocked on the start latch
    assert(p.start())
    assert(fut.get() == scala.util.Success(6))
    assert(!p.start()) // second start is a no-op, as in the reference
  }

  test("interrupt cancels a running aggregation") {
    val p = Pipeline.fromSeq(spark, 1 to 100)
    val slow = p.initStage.map { i => Thread.sleep(100); i }
    val fut = AsyncAggregate.sum(slow)
    Thread.sleep(150) // let the job start
    p.interrupt()
    assert(fut.getWithTimeout(30.seconds).isFailure)
    assert(p.status == Status.Interrupted)
  }

  test("pipeline timeout fails the aggregation and sets TimedOut") {
    val p = Pipeline.fromSeq(spark, 1 to 100, PipelineConfig(timeout = 300.millis))
    val slow = p.initStage.map { i => Thread.sleep(100); i }
    val res = Aggregate.sum(slow)
    assert(res.isFailure)
    assert(p.status == Status.TimedOut)
  }

  test("stage-level timeout applies to a single aggregation") {
    val p = Pipeline.fromSeq(spark, 1 to 100)
    val slow = p.initStage.map { i => Thread.sleep(100); i }
    val res = Aggregate.sum(slow, StageConfig(timeout = 200.millis))
    assert(res.isFailure)
  }

  test("ChannelLogger receives pipeline lifecycle messages") {
    val logger = new ChannelLogger(LogLevel.Info)
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3),
      PipelineConfig(manualStart = true, logger = logger))
    p.start()
    p.interrupt()
    val msgs = Iterator.continually(logger.queue.poll()).takeWhile(_ != null).toSeq
    assert(msgs.exists(_.contains("started")))
    assert(msgs.exists(_.contains("interrupted")))
  }

  test("interrupt before start fails pending async aggregations") {
    val p = Pipeline.fromSeq(spark, Seq(1), PipelineConfig(manualStart = true))
    val fut = AsyncAggregate.count(p.initStage)
    p.interrupt()
    assert(fut.getWithTimeout(10.seconds).isFailure)
  }
}
