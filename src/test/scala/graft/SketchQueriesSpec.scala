package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-13 sketch-family invariants: the rows-only KLL query gets its
  * quantitative gate (rank-error bound + merge law), and the two
  * SQL-oracled sketch queries get estimator-QUALITY assertions the
  * oracle can't express (the oracle proves the computation, these
  * prove the estimate means something).
  */
class SketchQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  private lazy val exactBySource: Map[String, Array[Long]] =
    Tables.documents(spark, sf)
      .select($"source".as[String], $"n_chars".as[Long]).collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

  private def orderStat(vs: Array[Long], q: Double): Long =
    vs(math.ceil(q * vs.length).toInt.max(1) - 1)

  test("q_kll_quantiles honors the k=200 normalized rank error bound, " +
    "and the merged ALL row agrees with a direct whole-corpus sketch") {
    val rows = SparkEntry.queries("q_kll_quantiles")(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    val all = exactBySource.values.flatten.toArray.sorted
    assert(rows.map(_._1).toSet == exactBySource.keySet + "ALL")
    rows.foreach { case (src, p50, p90, p99) =>
      val vs = if (src == "ALL") all else exactBySource(src)
      val n = vs.length.toDouble
      val eps = 0.025 * n + 1 // k=200 bound ~1.65% @99% conf, with slack
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (q, v) =>
        val lt = vs.count(_ < v)
        val le = vs.count(_ <= v)
        val target = q * n
        assert(lt <= target + eps && le >= target - eps,
          f"$src q=$q: value $v rank window [$lt,$le] vs target $target%.1f ± $eps%.1f")
      }
    }
  }

  test("q_source_minhash_overlap estimates are within 2 sigma of exact " +
    "pairwise Jaccard (k=16 slots => sigma <= 0.125)") {
    val est = SparkEntry.queries("q_source_minhash_overlap")(spark, sf)
      .select($"source_a".as[String], $"source_b".as[String],
        $"est_jaccard".as[Double]).collect()
    val shingleSets = Tables.documents(spark, sf)
      .select($"source".as[String],
        explode(Dedup.shingles(col("text"), 3)).as[String].as("sh"))
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(est.nonEmpty)
    est.foreach { case (a, b, j) =>
      val sa = shingleSets(a); val sb = shingleSets(b)
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(j - exact) <= 0.25,
        f"($a,$b): est $j%.4f vs exact $exact%.4f — outside 2 sigma")
    }
  }

  test("q_quantile_sketch bucket lower bounds bracket the exact order " +
    "statistics (decimal-HDR bound: est <= exact < 2*est)") {
    val rows = SparkEntry.queries("q_quantile_sketch")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == exactBySource.keySet)
    rows.foreach { case (src, p50, p90, p99) =>
      val vs = exactBySource(src)
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (q, est) =>
        val exact = orderStat(vs, q)
        assert(est <= exact && exact < 2 * est,
          s"$src q=$q: est bucket $est does not bracket exact $exact")
      }
    }
  }

  test("kll sketch bytes merge distributively: merging per-partition " +
    "sketches equals sketching the whole (within the rank bound)") {
    import graft.plans.KllQuantiles._
    val src = spark.range(0, 10000)
      .select(col("id"), (col("id") % 977).cast("double").as("v"),
        (col("id") % 7).as("p"))
    val merged = src.groupBy("p").agg(kll_sketch_agg(col("v")).as("sk"))
      .agg(kll_merge_agg(col("sk")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).getItem(0).as[Double])
      .head()
    val direct = src.agg(kll_sketch_agg(col("v")).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).getItem(0).as[Double])
      .head()
    val vs = src.select($"v".as[Double]).collect().sorted
    val n = vs.length.toDouble
    Seq(merged, direct).foreach { v =>
      val lt = vs.count(_ < v); val le = vs.count(_ <= v)
      assert(lt <= 0.5 * n + 0.025 * n + 1 && le >= 0.5 * n - 0.025 * n - 1,
        s"median estimate $v outside the rank bound (window [$lt,$le])")
    }
  }
}
