package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Relational-path stress: TPC-H Q1/Q3-shaped plans over a 10×
  * lineitem/orders (6M / 1.5M rows), multi-row-group parquet — the
  * shape a real multi-file table has, so scans parallelize naturally
  * (no Tables.spread needed).
  *
  *   sbt "runMain graft.examples.TpchStress"
  */
object TpchStress {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(sys.env.getOrElse("STRESS_LI", "/tmp/stress_li.parquet"))
    val ord = spark.read.parquet(sys.env.getOrElse("STRESS_ORD", "/tmp/stress_ord.parquet"))
    println(s"lineitem: ${li.count()}, orders: ${ord.count()}")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up
    li.agg(count(lit(1))).head()

    (1 to 2).foreach { i =>
      time(s"Q1 pricing summary (run $i)") {
        li.filter(col("l_shipdate") <= expr("TIMESTAMP '2000-09-02 00:00:00'"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
            avg("l_quantity"), count(lit(1)))
          .collect()
      }
      time(s"Q3 join+agg 6M x 1.5M (run $i)") {
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") < expr("TIMESTAMP '1998-01-01 00:00:00'"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
          .collect()
      }
      time(s"window top-3 per order-priority partition (run $i)") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
        ord.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
          .agg(count(lit(1))).head()
      }
    }
    spark.stop()
  }
}
