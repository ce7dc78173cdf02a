package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every gated query must OPTIMIZE cleanly under ScaleGuard's fail
  * mode — "the repo is warn-free" as a failing test instead of prose.
  * A future query that sneaks in an empty-partition window or a
  * no-equi-key join fails here at plan time, before any oracle run.
  */
class ScaleGuardSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("all gated queries optimize under ScaleGuard fail mode") {
    graft.plans.ScaleGuard.register(spark)
    spark.conf.set("spark.graft.scaleGuard", "fail")
    try {
      val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        try {
          // optimizedPlan runs the optimizer (and with it the guard);
          // some operators run bounded driver work during CONSTRUCTION
          // (ntile offsets, ivf training, pagerank iterations) — that
          // work itself plans under the same fail-mode session
          SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
          None
        } catch {
          case e: Throwable if e.getMessage != null &&
              e.getMessage.contains("ScaleGuard") => Some(name -> e.getMessage)
        }
      }
      assert(bad.isEmpty, bad.map { case (n, m) => s"$n: $m" }.mkString("\n"))
    } finally {
      spark.conf.set("spark.graft.scaleGuard", "warn")
      graft.plans.ScaleGuard.unregister(spark)
    }
  }
}
