package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ObserveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("metrics ride the job — values observed without a second scan") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(6.0))).toDF("id", "v")
    val (instrumented, obs) = Observe.withMetrics(df, "stage1",
      count(lit(1)).as("rows"),
      count(col("v")).as("non_null_v"),
      sum(col("v")).as("sum_v"))
    // ONE action drives both the real output and the metrics
    val out = instrumented.filter(col("v").isNotNull).count()
    assert(out == 2)
    val m = obs.get
    assert(m("rows") == 3L)
    assert(m("non_null_v") == 2L)
    assert(m("sum_v") == 8.0)
  }

  test("funnel instrumentation: per-stage counts from one pass") {
    // the pattern the operator exists for: a curation funnel observed
    // at two stages, single job, no re-execution of upstream stages
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val (all, obsAll) = Observe.withMetrics(docs, "ingest",
      count(lit(1)).as("n_in"))
    val filtered = all.filter(col("n_chars") >= 200)
    val (gated, obsGate) = Observe.withMetrics(filtered, "gate",
      count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
    val result = gated.count()
    val nIn = obsAll.get("n_in").asInstanceOf[Long]
    val nKept = obsGate.get("n_kept").asInstanceOf[Long]
    assert(nIn == docs.count())
    assert(nKept == result && nKept <= nIn)
    assert(obsGate.get("chars_kept").asInstanceOf[Long] >= nKept * 200)
  }
}
