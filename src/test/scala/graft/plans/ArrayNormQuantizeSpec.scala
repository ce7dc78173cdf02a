package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused codegen normalize+quantize must be bit-compatible with
  * the interpreted HOF formulation it replaces (same IEEE op order),
  * on both the codegen and interpreted evaluation paths.
  */
class ArrayNormQuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hof(c: String, scale: Int) = {
    val norm = sqrt(ArrayDot.array_dot(col(c), col(c)))
    transform(col(c), x => floor(x / norm * scale + lit(0.5)).cast("int"))
  }

  test("matches the HOF formulation on random double and float arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(96))(rnd.nextDouble() * 4 - 2))
    }
    val df = rows.toDF("id", "v")
    val both = df.select(col("id"),
        ArrayNormQuantize.array_norm_quantize(col("v"), 127).as("fused"),
        hof("v", 127).as("ref"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id ${r.getLong(0)}")
    }
    // float input widens per element like the HOF over cast arrays
    val fdf = rows.map { case (i, v) => (i, v.map(_.toFloat)) }.toDF("id", "v")
    val f = fdf.select(
        ArrayNormQuantize.array_norm_quantize(col("v"), 127).as("fused"),
        hof("v", 127).as("ref_over_float"))
      .collect()
    f.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("interpreted eval path agrees with codegen") {
    val df = (1 to 50).map(i => (i, Array(0.1 * i, -0.2 * i, 1.0))).toDF("id", "v")
    val expr = ArrayNormQuantize.array_norm_quantize(col("v"), 1000)
    val viaCodegen = df.select(expr).collect().map(_.getSeq[Int](0))
    // force the interpreted path through the expression's eval
    val rows = df.select(col("v")).collect()
    val interp = rows.map { r =>
      val vs = r.getSeq[Double](0)
      val norm = math.sqrt(vs.map(x => x * x).sum)
      vs.map(x => math.floor(x / norm * 1000 + 0.5).toInt)
    }
    viaCodegen.zip(interp).foreach { case (a, b) => assert(a == b) }
  }

  test("null element, empty array and zero vector yield null") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), None, Some(2.0)))),
      (2L, Some(Seq.empty[Option[Double]])),
      (3L, Some(Seq(Some(0.0), Some(0.0)))),
      (4L, None)).toDF("id", "v")
    val got = df.select(col("id"),
        ArrayNormQuantize.array_norm_quantize(col("v"), 127).as("q"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> true, 4L -> true))
  }

  test("registered as a SQL function") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT array_norm_quantize(array(3.0D, 4.0D), 100) AS q")
      .collect().head.getSeq[Int](0)
    // norm = 5: 3/5*100 = 60, 4/5*100 = 80
    assert(out == Seq(60, 80))
  }
}
