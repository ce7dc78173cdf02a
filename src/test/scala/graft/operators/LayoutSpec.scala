package graft.operators

import graft.SparkTestSession
import graft.plans.ZOrderCode.z_order
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("z_order interleaves bits (reference values + codegen/eval parity)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL)).toDF("x", "y")
    val got = df.select(z_order($"x", $"y")).as[Long].collect().toSeq
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL))
      .map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(got == want)
    assert(got(1) == 1L && got(2) == 2L && got(3) == 3L) // unit cell order
  }

  test("z-clustered files prune a 2-D box far better than lexicographic layout") {
    // 32×32 grid, 16 files of 64 rows each. Lexicographic (x, y) files
    // are thin slabs (2 x-values × full y range); z-ordered files are
    // 8×8 tiles. A box query on BOTH dims must touch far fewer
    // z-files — the file-level min/max pruning this layout exists for.
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def fileBoxes(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] = {
      val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
      df.write.option("maxRecordsPerFile", 64).mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => (r._2, r._3, r._4, r._5))
    }
    def touched(boxes: Array[(Long, Long, Long, Long)]): Int =
      boxes.count { case (x0, x1, y0, y1) =>
        x1 >= 8 && x0 <= 15 && y1 >= 8 && y0 <= 15 // intersects [8,15]²
      }
    val lexi = touched(fileBoxes(
      grid.repartitionByRange(16, $"x", $"y").sortWithinPartitions("x", "y")))
    val zed = touched(fileBoxes(Layout.clusterByZ(grid, "x", "y", partitions = 16)))
    assert(zed < lexi, s"z-order touched $zed files, lexicographic $lexi")
    assert(zed <= 4, s"8×8-aligned tiles should bound the box by ≤4 files, got $zed")
  }
}
