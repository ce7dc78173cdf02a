package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** ExactPercentile must be bit-identical to Spark's exact
  * `percentile()` aggregate (same p·(n−1) interpolation) while keeping
  * a bounded-memory rank-selection plan — no value→count
  * ObjectHashAggregate buffer anywhere.
  */
class ExactPercentileSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refPercentiles(df: org.apache.spark.sql.DataFrame, group: String,
                             value: String, ps: Seq[Double]): Map[Any, Seq[Double]] =
    df.groupBy(group)
      .agg(expr(s"percentile($value, array(${ps.mkString(",")}))").as("ps"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Double](1))
      .toMap

  test("matches Spark's exact percentile bit-for-bit on near-unique doubles") {
    // near-unique values with cross-partition ties thrown in
    val df = (1 to 5000).map { i =>
      val g = if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"
      val v = if (i % 100 == 0) 42.5 else i * 1.000173 + (i % 7) * 0.01
      (g, v)
    }.toDF("g", "v").repartition(7)
    val ps = Seq(0.25, 0.5, 0.95, 0.0, 1.0)
    val names = Seq("p25", "p50", "p95", "p0", "p100")
    val (res, release) = ExactPercentile.percentilesWithHandle(df, Seq("g"), "v", ps, names)
    val got = res.collect().map(r => r.getString(0) -> names.indices.map(i => r.getDouble(i + 1))).toMap
    release()
    val want = refPercentiles(df, "g", "v", ps)
    got.keySet shouldBe want.keySet.map(_.asInstanceOf[String])
    got.foreach { case (g, vs) =>
      vs.zip(want(g)).foreach { case (a, b) => assert(a == b, s"group $g: $vs vs ${want(g)}") }
    }
  }

  test("ignores nulls and handles single-row groups, like percentile()") {
    val df = Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)),
      ("solo", Some(7.0)), ("solo", None)).toDF("g", "v")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g"), "v", Seq(0.5), Seq("p50"))
    val got = res.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    release()
    got shouldBe Map("a" -> 15.0, "solo" -> 7.0)
  }

  test("null group keys form their own group") {
    val df = Seq((Some("a"), 1.0), (None, 2.0), (None, 4.0), (Some("a"), 3.0))
      .toDF("g", "v")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g"), "v", Seq(0.5), Seq("p50"))
    val got = res.collect().map(r => (r.get(0), r.getDouble(1))).toMap
    release()
    got shouldBe Map("a" -> 2.0, (null: Any) -> 3.0)
  }

  test("plan has no ObjectHashAggregate / percentile buffer (the 100 TB pin)") {
    val df = (1 to 200).map(i => ("g" + (i % 2), i.toDouble)).toDF("g", "v")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g"), "v", Seq(0.25, 0.5), Seq("p25", "p50"))
    val plan = res.queryExecution.executedPlan.toString
    release()
    plan should not include "ObjectHashAggregate"
    plan.toLowerCase should not include "percentile"
  }

  test("multi-column grouping") {
    val df = (1 to 1000).map(i => (i % 2, (i % 3).toString, i.toDouble))
      .toDF("g1", "g2", "v")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g1", "g2"), "v", Seq(0.5), Seq("p50"))
    val got = res.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
    release()
    val want = df.groupBy("g1", "g2")
      .agg(expr("percentile(v, 0.5)").as("p"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2)).toMap
    got shouldBe want
  }

  test("binary group columns group by value, not reference") {
    // each Row carries a FRESH Array[Byte] — reference-equality keying
    // on the driver would split one logical group into many
    val df = (1 to 400).map { i =>
      (Array[Byte]((i % 2).toByte, 7), i.toDouble)
    }.toDF("g", "v").repartition(5)
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g"), "v", Seq(0.5), Seq("p50"))
    val got = res.collect()
      .map(r => r.getAs[Array[Byte]](0).toSeq -> r.getDouble(1)).toMap
    release()
    val want = df.groupBy("g").agg(expr("percentile(v, 0.5)").as("p"))
      .collect().map(r => r.getAs[Array[Byte]](0).toSeq -> r.getDouble(1)).toMap
    got shouldBe want
    got.size shouldBe 2
  }

  test("group / value column names containing dots resolve") {
    val df = (1 to 300).map(i => ("g" + (i % 2), i.toDouble))
      .toDF("the.group", "the.value")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("the.group"), "the.value", Seq(0.5), Seq("p50"))
    val got = res.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    release()
    val want = df.groupBy(col("`the.group`"))
      .agg(expr("percentile(`the.value`, 0.5)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got shouldBe want
  }

  test("randomized: bit-identical to Spark percentile() across distributions") {
    // mixed regimes per trial: heavy ties, near-unique doubles,
    // negatives, single-element groups, nulls — the operator must be
    // bit-exact against Spark's value→count-map implementation on all
    // of them (deterministic seeds; the gate must not flake)
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { trial =>
      val n = 200 + rnd.nextInt(1800)
      val nGroups = 1 + rnd.nextInt(6)
      val tieDomain = 1 + rnd.nextInt(50)
      val rows = (1 to n).map { _ =>
        val g = "g" + rnd.nextInt(nGroups)
        val v =
          if (rnd.nextBoolean()) Some((rnd.nextInt(tieDomain) - tieDomain / 2).toDouble)
          else if (rnd.nextInt(20) == 0) None
          else Some(rnd.nextDouble() * 2000 - 1000)
        (g, v)
      }
      val df = rows.toDF("g", "v").repartition(1 + rnd.nextInt(9))
      val ps = Seq.fill(1 + rnd.nextInt(4))(rnd.nextDouble()).distinct ++ Seq(0.0, 1.0)
      val names = ps.indices.map(i => s"p$i")
      val (res, release) = ExactPercentile.percentilesWithHandle(
        df, Seq("g"), "v", ps, names)
      val got = res.collect()
        .map(r => r.getString(0) -> names.indices.map(i => r.getDouble(i + 1)))
        .toMap
      release()
      val want = refPercentiles(df, "g", "v", ps)
        .collect { case (k, v) if k != null => k.asInstanceOf[String] -> v }
      // all-null groups drop out of both (percentile over no values)
      val wantNonEmpty = want.filter { case (g, _) => got.contains(g) }
      assert(got.keySet == want.keySet.filter(g =>
        rows.exists(r => r._1 == g && r._2.isDefined)), s"trial $trial group set")
      wantNonEmpty.foreach { case (g, vs) =>
        got(g).zip(vs).zipWithIndex.foreach { case ((a, b), i) =>
          assert(a == b, s"trial $trial group $g p=${ps(i)}: got $a want $b")
        }
      }
    }
  }

  test("empty input yields empty result with the right schema") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val (res, release) = ExactPercentile.percentilesWithHandle(
      df, Seq("g"), "v", Seq(0.5), Seq("p50"))
    res.columns.toSeq shouldBe Seq("g", "p50")
    res.count() shouldBe 0L
    release()
  }
}
