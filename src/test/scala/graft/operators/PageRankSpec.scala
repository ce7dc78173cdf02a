package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int = 5) =
    PageRank.run(vs.toDF("id"), es.toDF("id_a", "id_b"), iters)
      .as[(Long, Double)].collect().toMap

  /** Driver-side reference: same recurrence, dense arrays. */
  private def ref(vs: Seq[Long], es: Seq[(Long, Long)], iters: Int,
                  d: Double = 0.85): Map[Long, Double] = {
    val n = vs.size
    val sym = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size }
    val base = (1.0 - d) / n
    var r = vs.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = vs.map(v => v -> (base + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("matches the dense reference on a small graph") {
    val vs = (0L to 5L).toSeq
    val es = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L) // 4,5 isolated
    val got = run(vs, es)
    val want = ref(vs, es, 5)
    vs.foreach { v =>
      assert(math.abs(got(v) - want(v)) < 1e-12, s"vertex $v: ${got(v)} vs ${want(v)}")
    }
  }

  test("isolated vertices hold exactly the base rank") {
    val got = run(Seq(0L, 1L, 2L), Seq(0L -> 1L))
    assert(got(2L) == (1.0 - 0.85) / 3)
  }

  test("the hub of a star outranks its leaves") {
    val vs = (0L to 6L).toSeq
    val got = run(vs, (1L to 6L).map(i => 0L -> i))
    assert((1L to 6L).forall(l => got(0L) > got(l)))
    // leaves are symmetric → identical ranks
    assert((1L to 6L).map(got).distinct.size == 1)
  }

  test("deterministic across runs") {
    val vs = (0L to 20L).toSeq
    val es = (0L until 20L).map(i => i -> (i + 1))
    assert(run(vs, es) == run(vs, es))
  }

  test("dangling redistribution keeps the rank vector a distribution (sum = 1)") {
    // two isolated vertices park 2/6 of the initial mass
    val vs = (0L to 5L).toSeq
    val es = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L)
    val got = PageRank.run(vs.toDF("id"), es.toDF("id_a", "id_b"),
        iters = 10, redistributeDangling = true)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9,
      s"rank sum ${got.values.sum} != 1 under redistribution")
    // without redistribution the same graph leaks mass (sum < 1)
    val leaky = run(vs, es, iters = 10)
    assert(leaky.values.sum < 1.0 - 1e-6)
    // isolated vertices receive the redistributed share (> base rank)
    assert(got(4L) > (1.0 - 0.85) / 6)
    assert(got(4L) == got(5L)) // symmetric
  }

  test("early stop lands within tol of the fixed point") {
    // an IRREGULAR graph (path: endpoint degree 1, inner degree 2), so
    // ranks actually move across iterations and the stop is earned.
    // iters = 200 is the ceiling; if the early stop regressed, this
    // test would grind through all 200 Spark iterations — the tol path
    // converges in a handful.
    val vs = (0L to 10L).toSeq
    val es = (0L until 10L).map(i => i -> (i + 1))
    val tol = 1e-6
    val d = 0.5 // faster contraction keeps the Spark loop short
    val early = PageRank.run(vs.toDF("id"), es.toDF("id_a", "id_b"),
        iters = 200, damping = d, tol = tol)
      .as[(Long, Double)].collect().toMap
    // the fixed point, approximated by a deep driver-side run
    val fixed = ref(vs, es, 500, d)
    // stopping when the L1 step is < tol leaves at most tol·d/(1−d)
    // of geometric tail to the fixed point
    val l1 = vs.map(v => math.abs(early(v) - fixed(v))).sum
    assert(l1 < tol * d / (1 - d),
      f"early-stop L1 distance $l1%.3e exceeds the contraction bound")
  }
}
