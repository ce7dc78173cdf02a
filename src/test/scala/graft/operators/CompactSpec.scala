package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compacts a many-small-files directory, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate 20 micro-batch appends → ≥20 small files
    (0 until 20).foreach { i =>
      (i * 100 until (i + 1) * 100).map(j => (j.toLong, s"row$j"))
        .toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val before = Compact.fileCount(spark, dir)
    assert(before >= 20)
    val want = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    val bytes = Compact.dirBytes(spark, dir)
    // target half the directory per file → exactly 2 output files
    val (b, a) = Compact.parquetDir(spark, dir, targetBytes = bytes / 2 + 1)
    assert(b == before && a == 2, s"expected 2 files after compaction, got $a")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == want)
  }

  test("trailing-slash path compacts safely (tmp dir is a sibling, never inside)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"r$i")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val want = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val (_, after) = Compact.parquetDir(spark, dir + "/", targetBytes = Long.MaxValue)
    assert(after == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == want,
      "rows lost through the swap — the old in-place tmp bug")
  }

  test("single-file target floors at one output file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact1").toString + "/t"
    (1 to 5).foreach { _ =>
      Seq((1L, "x")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val (_, after) = Compact.parquetDir(spark, dir, targetBytes = Long.MaxValue)
    assert(after == 1)
    assert(spark.read.parquet(dir).count() == 5)
  }
}
