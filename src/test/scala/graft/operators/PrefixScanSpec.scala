package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixScan must equal the single-task window computation exactly —
  * the operator exists so the SAME numbers come out of a plan that
  * scales, and with integer values the running sums are exact longs
  * under any partition grouping.
  */
class PrefixScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("k").orderBy("o")
    df.withColumn("p", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("r", row_number().over(w))
      .select("k", "o", "p", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
  }

  test("null-valued keys accumulate across partitions (null-safe offset join)") {
    // the null group must carry its cross-partition offsets like any
    // other key: the broadcast join back uses <=> — plain equality
    // never matches null = null, which would silently restart the
    // null group's running totals at every partition boundary
    val rows = (1L to 400L).map(o => (if (o % 2 == 0) "a" else null, o, 1L))
    val df = rows.toDF("k", "o", "v")
    val (scanned, release) = PrefixScan.runningPerKey(
      df, Seq(col("k")), Seq(col("o")), col("v"), "p", "r")
    val got = scanned.select("k", "o", "p", "r")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toSet
    release()
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
      rs.sortBy(_._2).zipWithIndex.map { case ((_, o, _), i) =>
        (Option(k), o, i + 1L, i + 1L)
      }
    }.toSet
    assert(got == want, "null-keyed running totals restarted mid-sequence")
  }

  test("runningPerKey equals the window reference across many partitions") {
    // enough rows that the range shuffle genuinely splits every key
    // across partitions (4 test threads → 4 range partitions)
    val rows = for {
      k <- Seq("a", "b", "c"); o <- 1L to 500L
    } yield (k, o, (o * 7 + k.hashCode.abs % 13) % 101 - 50)
    val df = rows.toDF("k", "o", "v")
    val (scanned, release) = PrefixScan.runningPerKey(
      df, Seq(col("k")), Seq(col("o")), col("v"), "p", "r")
    val got = scanned.select("k", "o", "p", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3).toInt))
      .toSet
    assert(got == reference(df))
    release()
  }

  test("single-row keys, negative values, and an empty frame all scan") {
    val df = Seq(("x", 1L, -5L), ("y", 1L, 3L)).toDF("k", "o", "v")
    val (scanned, release) = PrefixScan.runningPerKey(
      df, Seq(col("k")), Seq(col("o")), col("v"), "p", "r")
    val got = scanned.select("k", "p", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("x", -5L, 1L), ("y", 3L, 1L)))
    release()

    val empty = Seq.empty[(String, Long, Long)].toDF("k", "o", "v")
    val (scannedE, releaseE) = PrefixScan.runningPerKey(
      empty, Seq(col("k")), Seq(col("o")), col("v"), "p", "r")
    assert(scannedE.count() == 0)
    releaseE()
  }
}
