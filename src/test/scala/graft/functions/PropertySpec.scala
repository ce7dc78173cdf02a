package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks over generated corpora (raw ScalaCheck Gens
  * with fixed seeds — deterministic, no scalatestplus bridge needed).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val word = Gen.oneOf("spark", "data", "join", "scan", "row", "merge",
    "hash", "sort", "group", "filter", "window", "stream")
  private val doc = Gen.listOfN(12, word).map(_.mkString(" "))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("minhash est_jaccard stays in [0,1]; exact dup pairs hit 1.0") {
    (1 to 5).foreach { trial =>
      val texts = sample(Gen.listOfN(6, doc), 42L + trial)
      val docs = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
        .as[(Long, Long, Double)].collect()
      assert(cands.forall(c => c._3 >= 0.0 && c._3 <= 1.0), s"trial $trial")
      val dup = cands.find(c => c._1 == 0L && c._2 == texts.length.toLong)
      assert(dup.exists(_._3 == 1.0), s"trial $trial: dup pair missing from $cands")
    }
  }

  test("exact dedup keep counts sum to corpus size") {
    (1 to 5).foreach { trial =>
      val texts = sample(Gen.listOfN(10, doc), 100L + trial)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val total = Dedup.exact(docs, "text", "doc_id")
        .agg(org.apache.spark.sql.functions.sum("n_copies")).as[Long].head()
      assert(total == texts.length.toLong)
    }
  }

  test("rolling_hash equals driver-side reference on arbitrary strings") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
    val strs = (1 to 20).map(i => sample(Gen.asciiPrintableStr, 7L * i)) :+ "" :+ "héllo ⛰ utf8"
    val got = strs.map(s => Tuple1(s)).toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).as[Long].collect().toSeq
    assert(got == strs.map(ref))
  }

  test("native topK matches window top-k on random data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    (1 to 3).foreach { trial =>
      val n = 120
      val keys = sample(Gen.listOfN(n, Gen.chooseNum(1L, 9L)), 1000L + trial)
      val scores = sample(Gen.listOfN(n, Gen.chooseNum(0, 50)), 2000L + trial)
      val df = keys.zip(scores).zipWithIndex
        .map { case ((k, s), i) => (k, s.toDouble, i.toLong) }
        .toDF("key", "score", "id").repartition(5)
      val k = 1 + trial * 2
      val expected = df.withColumn("rn", row_number().over(
          Window.partitionBy("key").orderBy(col("score").desc, col("id"))))
        .filter(col("rn") <= k).drop("rn")
        .as[(Long, Double, Long)].collect().toSet
      val got = graft.plans.TopKPerKey.topK(df, Seq("key"),
          Seq("score" -> true, "id" -> false), k)
        .as[(Long, Double, Long)].collect().toSet
      assert(got == expected, s"trial $trial k=$k")
    }
  }

  test("chunking with zero overlap reassembles random documents") {
    (1 to 3).foreach { trial =>
      val texts = sample(Gen.listOfN(8, doc), 3000L + trial)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val size = 1 + trial * 2 // 3, 5, 7 tokens per chunk
      val got = Curation.chunk(docs, "doc_id", "text", chunkTokens = size, overlap = 0)
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == t, s"trial $trial doc $i")
      }
    }
  }

  test("salted join equals plain join on random skewed data") {
    (1 to 3).foreach { trial =>
      val keys = sample(Gen.listOfN(40, Gen.chooseNum(1L, 5L)), 9L + trial)
      val left = keys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
      val dim = (1L to 5L).map(k => (k, s"d$k")).toDF("k", "d")
      val plain = left.join(dim, Seq("k")).as[(Long, Int, String)].collect().sorted.toSeq
      val salted = graft.operators.SkewJoin.saltedEquiJoin(left, dim, "k", salts = 4)
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(salted == plain, s"trial $trial")
    }
  }

  test("joinKeyStats equals the window-based per-key stats it replaced, on random skewed data") {
    // the round-10 restructure's semantic contract: groupBy +
    // merge-join-back must be row-for-row identical to
    // `agg over Window.partitionBy(key)` — including left-join nulls
    // for filtered-out keys — on data with heavy key skew (the case
    // the restructure exists for)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, lit, sum}
    (1 to 3).foreach { trial =>
      // Zipf-ish: a few hot keys, many singletons
      val keys = sample(Gen.listOfN(120,
        Gen.frequency(6 -> Gen.const(1L), 2 -> Gen.chooseNum(2L, 4L),
          2 -> Gen.chooseNum(100L, 999L))), 77L + trial)
      val rows = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("h", "v")
      val viaJoin = graft.functions.Dedup
        .joinKeyStats(rows, "h",
          Seq(count(lit(1)).as("nd"), sum(col("v")).as("sv")),
          col("nd") >= 2, "left")
        .select("h", "v", "nd", "sv")
        .as[(Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
      val w = Window.partitionBy("h")
      val viaWindow = rows
        .withColumn("nd", count(lit(1)).over(w))
        .withColumn("sv", sum(col("v")).over(w))
        .select(col("h"), col("v"),
          org.apache.spark.sql.functions.when(col("nd") >= 2, col("nd")).as("nd"),
          org.apache.spark.sql.functions.when(col("nd") >= 2, col("sv")).as("sv"))
        .as[(Long, Long, Option[Long], Option[Long])].collect().sorted.toSeq
      assert(viaJoin == viaWindow, s"trial $trial")
    }
  }

  test("z_order round-trips: de-interleaving recovers both keys on random input") {
    import graft.plans.ZOrderCode.z_order
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(Int.MaxValue).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", z_order($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    def unspread(z0: Long): Long = { // inverse of the 5-step spread
      var v = z0 & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
      v = (v | (v >> 8)) & 0x0000FFFF0000FFFFL
      (v | (v >> 16)) & 0xFFFFFFFFL
    }
    got.foreach { case (x, y, z) =>
      assert(unspread(z) == x && unspread(z >> 1) == y,
        s"z_order($x,$y)=$z does not de-interleave")
    }
  }

  test("bloom prefilter keeps exactly the true matches after the exact join (random)") {
    val rnd = new scala.util.Random(7)
    val smallKeys = Seq.fill(300)(rnd.nextLong()).distinct
    val bigKeys = (Seq.fill(2000)(rnd.nextLong()) ++ smallKeys.take(100)).distinct
    val small = smallKeys.toDF("k")
    val big = bigKeys.toDF("x")
    val got = graft.operators.BloomJoin
      .innerJoin(big, "x", small, "k", expectedItems = 1024)
      .select("x").as[Long].collect().toSet
    assert(got == (bigKeys.toSet intersect smallKeys.toSet))
  }
}
