package graft.operators

import graft.SparkTestSession
import graft.plans.BloomMightContain.bloom_might_contain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("no false negatives: every true key passes the bloom") {
    val small = (0L until 500L).map(i => i * 7).toDF("k")
    val bloom = small.stat.bloomFilter("k", 1000, 0.03)
    val big = (0L until 3500L).toDF("x")
    val kept = big.filter(bloom_might_contain(col("x"), bloom))
      .as[Long].collect().toSet
    assert((0L until 500L).map(_ * 7).forall(kept.contains),
      "bloom dropped a true key — false negatives are impossible by construction")
  }

  test("prunes most non-matching rows at the configured fpp") {
    val small = (0L until 1000L).toDF("k")
    val big = (100000L until 200000L).toDF("x") // zero true matches
    val pruned = BloomJoin.prefilter(big, "x", small, "k",
      expectedItems = 1000, fpp = 0.01)
    val fpRate = pruned.count().toDouble / 100000.0
    assert(fpRate <= 0.03, f"false-positive rate $fpRate%.4f far above configured 0.01")
  }

  test("AutoSize keeps the pruning rate flat when the dim outgrows a fixed capacity") {
    // the round-15 sf10 finding: a fixed expectedItems saturates when
    // the key set grows past it (fpp → ~1, the prefilter stops
    // pruning). Auto-sizing counts the dim first, so the same call
    // site prunes at ANY scale. 20k keys vs the old query's 4096 cap:
    val small = (0L until 20000L).map(_ * 5).toDF("k")
    val big = (1000000L until 1100000L).toDF("x") // zero true matches
    val fixed = BloomJoin.prefilter(big, "x", small, "k",
      expectedItems = 4096, fpp = 0.01).count().toDouble / 100000.0
    val auto = BloomJoin.prefilter(big, "x", small, "k",
      fpp = 0.01).count().toDouble / 100000.0
    assert(fixed > 0.5, f"saturated-filter premise broke ($fixed%.3f) — retune the test")
    assert(auto <= 0.03, f"auto-sized fp rate $auto%.4f above configured 0.01")
  }

  test("innerJoin result is row-identical to the plain join") {
    val small = (0L until 100L).map(i => (i * 3, s"dim$i")).toDF("k", "name")
    val big = (0L until 1000L).map(i => (i, i * 2.0)).toDF("x", "v")
    val got = BloomJoin.innerJoin(big, "x", small, "k", expectedItems = 200)
      .select("x", "name", "v").as[(Long, String, Double)].collect().toSet
    val want = big.join(small, col("x") === col("k"))
      .select("x", "name", "v").as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("same-named join keys resolve (frame-qualified, not ambiguous)") {
    val small = (0L until 50L).map(i => (i * 2, i)).toDF("id", "ord")
    val big = (0L until 200L).toDF("id")
    val got = BloomJoin.innerJoin(big, "id", small, "id", expectedItems = 100)
      .select(small("ord")).as[Long].collect().toSet
    assert(got == (0L until 50L).toSet)
  }

  test("interpreted eval and codegen agree") {
    val small = (0L until 64L).toDF("k")
    val bloom = small.stat.bloomFilter("k", 100, 0.01)
    val keys = (0L until 256L)
    val expr = bloom_might_contain(col("x"), bloom)
    val viaPlan = keys.toDF("x").filter(expr).as[Long].collect().toSet
    // driver-side recomputation through the sketch API (the eval path)
    val direct = keys.filter(bloom.mightContainLong).toSet
    assert(viaPlan == direct)
  }

  test("null keys do not pass the filter") {
    val small = (0L until 10L).toDF("k")
    val bloom = small.stat.bloomFilter("k", 100, 0.01)
    val big = Seq[Option[Long]](Some(1L), None, Some(999L)).toDF("x")
    val kept = big.filter(bloom_might_contain(col("x"), bloom))
      .as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }
}
