package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Pins the ArrayPairs kernels bit-identical to the interpreted HOF
  * forms they replace (round-18 optimization contract).
  */
class ArrayPairsSpec extends AnyFunSpec {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  describe("LongPairs") {
    it("matches the nested transform/filter pair explode") {
      val df = Seq(
        Seq(3L, 1L, 2L),
        Seq(5L),
        Seq.empty[Long],
        Seq(2L, 2L, 7L),          // duplicate id in a bucket
        Seq(9L, 8L, 7L, 6L, 5L)
      ).toDF("ms")
      val want = df.select(explode(flatten(transform(col("ms"), a =>
          transform(filter(col("ms"), b => b > a),
            b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      val got = df.select(explode(ArrayPairsCols.longPairs(col("ms"))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
    }
  }

  describe("ArrayEqCount") {
    it("matches size(filter(zip_with(a, b, eq), identity))") {
      val df = Seq(
        (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),
        (Seq(1L, 2L), Seq(1L, 2L, 3L)),   // unequal lengths (zip_with pads)
        (Seq.empty[Long], Seq(1L)),
        (Seq(4L, 4L, 4L), Seq(4L, 4L, 4L))
      ).toDF("a", "b")
      val want = df.select(
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), p => p)).as("c"))
      val got = df.select(ArrayPairsCols.arrayEqCount(col("a"), col("b")).as("c"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("SimhashBucketPairs") {
    it("matches the nested transform/filter hamming explode") {
      val ms = Seq(
        Seq((1L, 0x3L), (2L, 0x1L), (3L, 0xFFL), (4L, 0x3L)),
        Seq((7L, 0L)),
        Seq.empty[(Long, Long)]
      ).toDF("raw")
        .select(transform(col("raw"), r =>
          struct(r("_1").as("id"), r("_2").as("sh"))).as("ms"))
      val maxH = 3
      val want = ms.select(explode(flatten(transform(col("ms"), a =>
          transform(
            filter(col("ms"), b => b("id") > a("id") &&
              bit_count(a("sh").bitwiseXOR(b("sh"))) <= maxH),
            b => struct(a("id").as("id_a"), b("id").as("id_b"),
              bit_count(a("sh").bitwiseXOR(b("sh"))).as("hamming")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.hamming").cast("int"))
      val got = ms.select(explode(
          ArrayPairsCols.simhashBucketPairs(col("ms"), maxH)).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
    }
  }
}
