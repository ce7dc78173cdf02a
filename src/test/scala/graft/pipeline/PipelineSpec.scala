package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Success

/** Pippin-parity semantics of the typed pipeline API: sources,
  * transforms (incl. error-handling variants), sync aggregations.
  * Reference behavior: /root/reference/README.md examples.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("README simple example: filter evens, double, sum == 12") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3, 4, 5))
    val filtered = p.initStage.filter(i => i % 2 == 0)
    val mapped = filtered.map(i => i * 2)
    assert(Aggregate.sum(mapped) == Success(12))
  }

  test("mapWithError drops failing elements (README detailed example)") {
    val p = Pipeline.fromSeq(spark, Seq("1", "a", "2", "-3", "4", "5", "b"))
    val errs = spark.sparkContext.longAccumulator("errs")
    val parsed = p.initStage.mapWithError(_.toInt, _ => errs.add(1))
    assert(Aggregate.asSlice(parsed).get.sorted == Seq(-3, 1, 2, 4, 5))
    assert(errs.value == 2)
  }

  test("mapWithErrorMapper substitutes fallback value") {
    val p = Pipeline.fromSeq(spark, Seq("1", "x", "3"))
    val parsed = p.initStage.mapWithErrorMapper(_.toInt, _ => 42)
    assert(Aggregate.asSlice(parsed).get.sorted == Seq(1, 3, 42))
  }

  test("flatMap flattens collection stages, mapping inner elements") {
    val p = Pipeline.fromSeq(spark, Seq(Seq(1, 2), Seq(3), Seq()))
    val flat = p.initStage.flatMap((e: Int) => e + 1)
    assert(Aggregate.asSlice(flat).get.sorted == Seq(2, 3, 4))
  }

  test("flatMapWithError drops failing inner elements") {
    val p = Pipeline.fromSeq(spark, Seq(Seq("1", "x"), Seq("3")))
    val flat = p.initStage.flatMapWithError((e: String) => e.toInt, _ => ())
    assert(Aggregate.asSlice(flat).get.sorted == Seq(1, 3))
  }

  test("flatMapWithErrorMapper maps failing inner elements") {
    val p = Pipeline.fromSeq(spark, Seq(Seq("1", "x")))
    val flat = p.initStage.flatMapWithErrorMapper((e: String) => e.toInt, _ => 0)
    assert(Aggregate.asSlice(flat).get.sorted == Seq(0, 1))
  }

  test("fromMap yields key-value tuples") {
    val p = Pipeline.fromMap(spark, Map("one" -> 1, "two" -> 2))
    assert(Aggregate.asMap(p.initStage, (t: (String, Int)) => t).get ==
      Map("one" -> 1, "two" -> 2))
  }

  test("numeric aggregations: sum/avg/min/max/count") {
    val s = Pipeline.fromSeq(spark, Seq(1.0, 2.0, 3.0, 4.0)).initStage
    assert(Aggregate.sum(s) == Success(10.0))
    assert(Aggregate.avg(s) == Success(2.5))
    assert(Aggregate.min(s) == Success(1.0))
    assert(Aggregate.max(s) == Success(4.0))
    assert(Aggregate.count(s) == Success(4L))
  }

  test("sum of empty stage is zero (fold semantics)") {
    val s = Pipeline.fromSeq(spark, Seq.empty[Int]).initStage
    assert(Aggregate.sum(s) == Success(0))
  }

  test("complex-number aggregations (SumComplexType/AvgComplexType)") {
    val s = Pipeline.fromSeq(spark, Seq(Complex(1, 2), Complex(3, -1))).initStage
    assert(Aggregate.sumComplexType(s) == Success(Complex(4, 1)))
    assert(Aggregate.avgComplexType(s) == Success(Complex(2, 0.5)))
  }

  test("sort and sortDesc") {
    val s = Pipeline.fromSeq(spark, Seq(3, 1, 2)).initStage
    assert(Aggregate.sort(s) == Success(Seq(1, 2, 3)))
    assert(Aggregate.sortDesc(s) == Success(Seq(3, 2, 1)))
  }

  test("groupBy / reduce / asMultiMap / distinct / distinctCount") {
    val s = Pipeline.fromSeq(spark, Seq(1, 2, 3, 4, 4)).initStage
    assert(Aggregate.groupBy(s, (i: Int) => i % 2).get
      .view.mapValues(_.sorted).toMap == Map(0 -> Seq(2, 4, 4), 1 -> Seq(1, 3)))
    assert(Aggregate.reduce(s, (a: Int, b: Int) => a + b) == Success(14))
    assert(Aggregate.asMultiMap(s, (i: Int) => (i % 2, i)).get
      .view.mapValues(_.sorted).toMap == Map(0 -> Seq(2, 4, 4), 1 -> Seq(1, 3)))
    assert(Aggregate.distinct(s).get.sorted == Seq(1, 2, 3, 4))
    assert(Aggregate.distinctCount(s) == Success(4L))
  }

  test("forEach runs side effect per element (distributed)") {
    val acc = spark.sparkContext.longAccumulator("fe")
    val s = Pipeline.fromSeq(spark, Seq(1, 2, 3)).initStage
    assert(Aggregate.forEach(s, (i: Int) => acc.add(i)).isSuccess)
    assert(acc.value == 6)
  }

  test("stage ids: auto = 1 + previous, customId override") {
    val p = Pipeline.fromSeq(spark, Seq(1))
    assert(p.initStage.id == 1L)
    val s2 = p.initStage.map(i => i)
    assert(s2.id == 2L)
    val s3 = s2.map(i => i, StageConfig(customId = 42L))
    assert(s3.id == 42L)
  }

  test("sync aggregation on unstarted manual pipeline throws (reference panics)") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3), PipelineConfig(manualStart = true))
    assertThrows[IllegalStateException] {
      Aggregate.sum(p.initStage)
    }
  }

  test("maxParallelism bounds stage partitions via coalesce") {
    val p = Pipeline.fromSeq(spark, 1 to 100, PipelineConfig(maxParallelismPerStage = 2))
    val s = p.initStage.map(i => i + 1)
    assert(s.ds.rdd.getNumPartitions <= 2)
  }

  test("fromParquet reads a columnar source as Pipeline[Row]") {
    val p = Pipeline.fromParquet(spark, "/root/testdata/sf0.001/nation.parquet")
    assert(Aggregate.count(p.initStage) == Success(25L))
  }

  test("close() interrupts a pending pipeline and is AutoCloseable") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2, 3), PipelineConfig(manualStart = true))
    p.close()
    assert(p.status == Status.Interrupted)
  }

  test("status transitions to Done after a sync aggregation") {
    val p = Pipeline.fromSeq(spark, Seq(1, 2))
    assert(Aggregate.count(p.initStage).isSuccess)
    assert(p.status == Status.Done)
  }

  test("maxParallelismTotal jointly bounds concurrent async aggregations") {
    // reference semantics (ratelimiter.go): ONE token pool for the
    // whole pipeline — two concurrent async aggregations must never
    // run more than `total` user-stage tasks between them (each action
    // here is bounded to 2 tasks, so unshared enforcement would reach 4
    // on this local[4] session)
    ParGauge.reset()
    val p = Pipeline.fromSeq(spark, 1 to 8, PipelineConfig(maxParallelismTotal = 2))
    val s = p.initStage.map(i => i)
    def body(i: Int): Unit = { ParGauge.enter(); Thread.sleep(100); ParGauge.exit() }
    val f1 = AsyncAggregate.forEach(s, body _)
    val f2 = AsyncAggregate.forEach(s, body _)
    assert(f1.get().isSuccess && f2.get().isSuccess)
    assert(ParGauge.maxSeen <= 2,
      s"observed ${ParGauge.maxSeen} concurrent tasks under a total bound of 2")
  }
}

/** JVM-wide concurrency gauge: executor lambdas run in this JVM under
  * local[4], so a shared static observes true task concurrency.
  */
object ParGauge {
  private val cur = new java.util.concurrent.atomic.AtomicInteger(0)
  private val max = new java.util.concurrent.atomic.AtomicInteger(0)
  def enter(): Unit = {
    val c = cur.incrementAndGet()
    max.getAndAccumulate(c, (a, b) => math.max(a, b))
  }
  def exit(): Unit = cur.decrementAndGet()
  def reset(): Unit = { cur.set(0); max.set(0) }
  def maxSeen: Int = max.get()
}
