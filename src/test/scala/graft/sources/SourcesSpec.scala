package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("partitioned parquet sink prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "part", "v")
    Sinks.parquetPartitioned(df, dir, Seq("part"))
    val back = Sources.parquet(spark, dir).filter(col("part") === "a")
    assert(back.count() == 2)
    // partition pruning visible in the scan: only the part=a directory
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), scan)
  }

  test("csv + jsonLines round-trip with explicit schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    df.write.option("header", "true").csv(s"$dir/csv")
    df.write.json(s"$dir/json")
    assert(Sources.csv(spark, s"$dir/csv", df.schema).count() == 2)
    assert(Sources.jsonLines(spark, s"$dir/json", df.schema).count() == 2)
  }

  test("orc round-trip with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = (1L to 100L).map(i => (i, s"name$i", i * 1.5)).toDF("id", "name", "v")
    Sinks.orc(df, dir)
    val back = Sources.orc(spark, dir).filter(col("id") > 90L)
    assert(back.count() == 10)
    val scan = back.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(id,90"), scan)
  }
}
