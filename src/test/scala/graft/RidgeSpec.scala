package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_ridge_regress's DECIMAL(38,0) Gram accumulators (SURVEY §2 row
  * 147's documented sf100+ upgrade): exact past 2⁵³, where the former
  * long sums would silently WRAP and double sums would silently round
  * — and bit-identical to the long path wherever longs were exact.
  */
class RidgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gram accumulators match an exact BigInt driver recompute on the gate corpus") {
    val sf = "/root/testdata/sf0.001"
    val z = Tables.documents(spark, sf).select(
      col("source"),
      col("n_chars").as("z1"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")))
        .cast("long").as("z2"),
      size(graft.functions.Dedup.tokens(col("text"))).cast("long").as("y"))
    // row layout: source, g00 (long count), then eight DECIMAL sums
    val got = graft.queries.GovernanceQueries.gramAggregate(z).collect()
      .map(r => r.getString(0) -> (1 to 9).map(i =>
        if (i == 1) BigInt(r.getLong(1))
        else BigInt(r.getDecimal(i).toBigInteger)).toSeq)
      .toMap
    val rows = z.as[(String, Long, Long, Long)].collect()
    val want = rows.groupBy(_._1).view.mapValues { g =>
      Seq(
        BigInt(g.length),
        g.map(r => BigInt(r._2)).sum, g.map(r => BigInt(r._3)).sum,
        g.map(r => BigInt(r._2) * r._2).sum,
        g.map(r => BigInt(r._2) * r._3).sum,
        g.map(r => BigInt(r._3) * r._3).sum,
        g.map(r => BigInt(r._4)).sum,
        g.map(r => BigInt(r._2) * r._4).sum,
        g.map(r => BigInt(r._3) * r._4).sum)
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (src, g) =>
      assert(g == want(src), s"gram sums diverge for $src")
    }
  }

  test("accumulators stay exact past 2^53 (and past Long.MaxValue) where long sums wrap") {
    // per-row products fit a long (z1² = 9e18 < 2⁶³−1 ≈ 9.22e18), but
    // TWO rows sum to 1.8e19 > Long.MaxValue: a long accumulator
    // wraps negative, a double accumulator rounds — the DECIMAL(38,0)
    // sum must carry the exact integer through
    val big = 3000000000L // 3e9
    val z = Seq(
      ("s", big, 1L, 1L),
      ("s", big, 1L, 1L)).toDF("source", "z1", "z2", "y")
    val g = graft.queries.GovernanceQueries.gramAggregate(z).collect().head
    val g11 = BigInt(g.getDecimal(4).toBigInteger)
    assert(g11 == BigInt("18000000000000000000"),
      s"g11 not exact past Long.MaxValue: $g11")
    assert(g11 > BigInt(Long.MaxValue), "test premise: sum must exceed long range")
    val g01 = BigInt(g.getDecimal(2).toBigInteger)
    assert(g01 == BigInt(2) * BigInt(big))
  }

  test("q_ridge_regress end-to-end emits finite weights for every source") {
    val out = SparkEntry.queries("q_ridge_regress")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      (1 to 3).foreach { i =>
        val w = r.getDouble(i)
        assert(!w.isNaN && !w.isInfinite, s"${r.getString(0)}: w$i = $w")
      }
    }
  }
}
