package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._
import scala.util.{Failure, Success}

/** Channel-sourced pipelines carry the FULL pipeline lifecycle —
  * reference pipeline.FromChannel (pipeline/pipeline.go:131-170):
  * status transitions, manual start, interrupt-while-streaming,
  * timeouts, and all terminal aggregations (blocking until channel
  * close, as the reference's channel aggregations do).
  */
class ChannelPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("transforms + blocking aggregation drain a closed channel") {
    val p = Pipeline.fromChannel[Int](spark)
    val doubled = p.filter(_ % 2 == 0).map(_ * 2)
    p.send(1, 2, 3, 4, 5)
    p.closeChannel()
    assert(doubled.asSlice.map(_.sorted) == Success(Seq(4, 8)))
    assert(p.status == Status.Done)
  }

  test("all aggregation families work on a channel source") {
    val p = Pipeline.fromChannel[Int](spark)
    p.send(3, 1, 2, 2)
    p.closeChannel()
    assert(p.sum == Success(8))
    assert(p.count == Success(4L))
    assert(p.min == Success(1) && p.max == Success(3))
    assert(p.sort == Success(Seq(1, 2, 2, 3)))
    assert(p.distinctCount == Success(3L))
    assert(p.asMultiMap(i => (i % 2, i)).get.view.mapValues(_.sorted).toMap ==
      Map(0 -> Seq(2, 2), 1 -> Seq(1, 3)))
    assert(p.avgAsync.get() == Success(2.0))
  }

  test("async aggregation completes when the channel closes later") {
    val p = Pipeline.fromChannel[Int](spark)
    p.send(10, 20)
    val fut = p.map(_ + 1).sumAsync
    assert(!fut.isDone)
    p.send(30)
    p.closeChannel()
    assert(fut.get() == Success(63))
    assert(p.status == Status.Done)
  }

  test("interrupt while streaming fails pending aggregations") {
    val p = Pipeline.fromChannel[Int](spark)
    p.send(1, 2, 3)
    val fut = p.countAsync // channel never closed — would block forever
    Thread.sleep(100)
    p.interrupt()
    assert(p.status == Status.Interrupted)
    assert(fut.get().isFailure)
  }

  test("pipeline timeout fires while the channel stays open") {
    val p = Pipeline.fromChannel[Int](spark,
      PipelineConfig(timeout = 300.millis))
    p.send(1)
    assert(p.count.isFailure)
    assert(p.status == Status.TimedOut)
  }

  test("manual start: Pending until start(), channel send after close throws") {
    val p = Pipeline.fromChannel[Int](spark, PipelineConfig(manualStart = true))
    assert(p.status == Status.Pending)
    p.send(5, 7)
    val fut = p.sumAsync // waits for start()
    Thread.sleep(100)
    assert(!fut.isDone)
    assert(p.start())
    p.closeChannel()
    assert(fut.get() == Success(12))
    assert(p.status == Status.Done)
    assertThrows[IllegalStateException] { p.send(9) }
  }

  test("error-handling transforms stream through the channel") {
    val p = Pipeline.fromChannel[String](spark)
    val parsed = p.mapWithErrorMapper(_.toInt, _ => -1)
    p.send("1", "x", "3")
    p.closeChannel()
    assert(parsed.asSlice.map(_.sorted) == Success(Seq(-1, 1, 3)))
  }

  test("drain is file-backed and reused across aggregations on one object") {
    // larger than anything a driver-side memory table should hold: the
    // drain lands in parquet (executor-side writes), and the three
    // aggregations below reuse ONE drain rather than re-streaming
    val n = 200000
    val p = Pipeline.fromChannel[Int](spark)
    val doubled = p.map(_ * 2)
    (0 until n).grouped(20000).foreach(chunk => p.send(chunk.toSeq: _*))
    p.closeChannel()
    assert(doubled.count == Success(n.toLong))
    assert(doubled.sum == Success((0 until n).map(_ * 2).sum))
    assert(doubled.min == Success(0))
    // no in-memory sink tables registered by the drain
    assert(!spark.catalog.listTables().collect().exists(_.name.contains("drain")))
    doubled.close()
  }

  test("1M-element drain: results exact, driver retention bounded after close") {
    // the volume form of the file-backed-drain claim: ~115 MB of
    // string payload flows channel → foreachBatch → parquet →
    // aggregation. The old memory-sink drain held every drained row in
    // a driver-side table (several-fold expanded as Row objects); the
    // parquet drain must leave no trace once the pipeline is closed.
    def usedHeap(): Long = {
      val rt = Runtime.getRuntime
      System.gc(); Thread.sleep(100); System.gc()
      rt.totalMemory() - rt.freeMemory()
    }
    val before = usedHeap()
    val n = 1000000
    val payload = "x" * 100
    val p = Pipeline.fromChannel[String](spark)
    val lens = p.map(_.length)
    (0 until n).grouped(100000).foreach { chunk =>
      p.send(chunk.map(i => s"$payload$i").toSeq: _*)
    }
    p.closeChannel()
    assert(lens.count == Success(n.toLong))
    // second aggregation reuses the SAME drain files (no re-stream)
    assert(lens.min == Success(101))
    assert(lens.max == Success(106))
    p.close()
    val growth = usedHeap() - before
    assert(growth < 256L * 1024 * 1024,
      s"driver retained ${growth / 1048576} MB after draining+closing a " +
        "1M-element channel — the drain is buffering on the driver again")
  }

  test("interrupt mid-drain at volume: clean failure or full result, never partial") {
    val n = 500000
    val p = Pipeline.fromChannel[Int](spark)
    (0 until n).grouped(100000).foreach(c => p.send(c.toSeq: _*))
    val fut = p.countAsync
    p.closeChannel() // the drain starts now
    Thread.sleep(150) // land inside the drain with high probability
    p.interrupt()
    assert(p.status == Status.Interrupted)
    fut.get() match {
      // the drain won the race — the cached result must be COMPLETE
      // (a partial drain being cached would serve wrong answers to
      // every later aggregation; drained() guards exactly this)
      case Success(c) => assert(c == n.toLong, s"partial drain cached: $c")
      case Failure(_) => () // interrupted mid-drain: the documented outcome
    }
    p.close()
  }

  test("zero-element drain yields empty aggregations, not a read error") {
    val p = Pipeline.fromChannel[Int](spark)
    p.closeChannel()
    assert(p.count == Success(0L))
    assert(p.asSlice == Success(Seq.empty))
    p.close()
  }
}
