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

  describe("SortedInterCount") {
    it("matches size(array_intersect) on sorted distinct arrays, and the " +
       "derived jaccard matches the array_intersect/array_union form") {
      val df = Seq(
        (Seq(1L, 2L, 3L, 9L), Seq(2L, 3L, 4L)),
        (Seq(1L, 2L), Seq(3L, 4L)),            // disjoint
        (Seq.empty[Long], Seq(1L)),            // empty side
        (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)),  // identical (negatives sort first)
        (Seq(Long.MinValue, -1L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
      ).toDF("ra", "rb")
        .select(sort_array(array_distinct(col("ra"))).as("a"),
          sort_array(array_distinct(col("rb"))).as("b"))
      val want = df.select(
        size(array_intersect(col("a"), col("b"))).as("c"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("j"))
      val inter = ArrayPairsCols.sortedInterCount(col("a"), col("b"))
      val got = df.select(inter.as("c"),
        (inter.cast("double") / (size(col("a")) + size(col("b")) - inter)).as("j"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    }
  }

  describe("DotAgainstSet") {
    it("matches per-pair array_dot with its null semantics") {
      val qset = Seq(
        (1L, Some(Seq(1.0, 2.0, 3.0))),
        (2L, Some(Seq(0.5, -1.0, 2.0))),
        (3L, None),                       // null qvec → null sim
        (4L, Some(Seq(1.0, 2.0)))         // length mismatch → null sim
      )
      val corpus = Seq(
        (10L, Some(Seq(2.0, 0.0, 1.0))),
        (11L, Some(Seq(-1.0, 1.0, 0.5))),
        (12L, None)                       // null cvec → null sim per query
      ).toDF("neighbor_id", "cvec")
        .select(col("neighbor_id"), col("cvec").cast("array<double>"))
      val qdf = qset.toDF("query_id", "qvec")
        .select(col("query_id"), col("qvec").cast("array<double>"))
      val want = corpus.crossJoin(qdf)
        .select(col("query_id"), col("neighbor_id"),
          graft.plans.ArrayDot.array_dot(col("qvec"), col("cvec")).as("sim"))
      val qs = qdf.agg(collect_list(struct(col("query_id"), col("qvec"))).as("qs"))
      val got = corpus.crossJoin(qs)
        .select(col("neighbor_id"),
          explode(ArrayPairsCols.dotAgainstSet(col("cvec"), col("qs"))).as("p"))
        .select(col("p.query_id").as("query_id"), col("neighbor_id"),
          col("p.sim").as("sim"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
    }
  }

  describe("VecPairSims") {
    it("matches LongPairs pair order with per-pair ArrayDot sims and null semantics") {
      val ms = Seq(
        Seq((3L, Some(Seq(1.0, 0.0))), (1L, Some(Seq(0.5, 0.5))),
          (2L, Some(Seq(0.0, 1.0))), (4L, None),          // null vec
          (5L, Some(Seq(1.0, 2.0, 3.0)))),                 // length mismatch
        Seq((7L, Some(Seq(1.0)))),
        Seq.empty[(Long, Option[Seq[Double]])]
      ).toDF("raw")
        .select(transform(col("raw"), r =>
          struct(r("_1").as("id"), r("_2").cast("array<double>").as("vec"))).as("ms"))
      // reference: explode the struct list, LongPairs on ids, attach
      // vectors back by id, ArrayDot per pair
      val rows = ms.select(monotonically_increasing_id().as("g"), col("ms"))
      val flat = rows.select(col("g"), explode(col("ms")).as("e"))
        .select(col("g"), col("e.id").as("id"), col("e.vec").as("vec"))
      val want = rows
        .select(col("g"), explode(ArrayPairsCols.longPairs(
          transform(col("ms"), e => e("id")))).as("p"))
        .select(col("g"), col("p.id_a"), col("p.id_b"))
        .join(flat.select(col("g"), col("id").as("id_a"), col("vec").as("va")), Seq("g", "id_a"))
        .join(flat.select(col("g"), col("id").as("id_b"), col("vec").as("vb")), Seq("g", "id_b"))
        .select(col("id_a"), col("id_b"),
          graft.plans.ArrayDot.array_dot(col("va"), col("vb")).as("sim"))
      val got = ms.select(explode(ArrayPairsCols.vecPairSims(col("ms"))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.sim").as("sim"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === want.count())
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
