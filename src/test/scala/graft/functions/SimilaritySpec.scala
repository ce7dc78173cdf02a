package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(1.0f, 0.02f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val res = Similarity
      .bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 3)
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    // cos(0,4)=0.9998 > cos(0,1)=0.9939 > cos(0,2)=0
    assert(res.map(_._3).toSeq == Seq(4L, 1L, 2L))
    assert(res.head._4 > 0.999 && res(1)._4 > 0.99)
  }

  test("topK caps the result size per query") {
    val res = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" < 2), k = 2)
    assert(res.groupBy("query_id").count().as[(Long, Long)].collect()
      .forall(_._2 == 2))
  }

  test("array_dot matches manual dot product (codegen + interpreted paths)") {
    import org.apache.spark.sql.functions.{col, transform}
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, -5.0, 6.0))).toDF("a", "b")
    val got = df.select(graft.plans.ArrayDot.array_dot(col("a"), col("b"))).as[Double].head()
    assert(got == 1.0 * 4.0 + 2.0 * -5.0 + 3.0 * 6.0)
    // float arrays accepted natively (widened per element)
    val dff = Seq((Array(0.5f, 0.25f), Array(2.0f, 4.0f))).toDF("a", "b")
    val gotF = dff.select(graft.plans.ArrayDot.array_dot(col("a"), col("b")))
      .as[Double].head()
    assert(gotF == 2.0)
    // mixed float × double also works
    val mixed = dff.select(graft.plans.ArrayDot.array_dot(
      col("a"), transform(col("b"), x => x.cast("double")))).as[Double].head()
    assert(mixed == 2.0)
  }

  test("array_dot surfaces length mismatch and null elements as null") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(graft.plans.ArrayDot.array_dot(col("a"), col("b")))
      .as[Option[Double]].head().isEmpty)
    val withNull = Seq((Array[java.lang.Double](1.0, null), Array[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    assert(withNull.select(graft.plans.ArrayDot.array_dot(col("a"), col("b")))
      .as[Option[Double]].head().isEmpty)
  }

  test("lshSignature is deterministic") {
    val a = vecs.select(Similarity.lshSignature($"embedding", 16).as("s"))
      .as[Long].collect()
    val b = vecs.select(Similarity.lshSignature($"embedding", 16).as("s"))
      .as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("codegen hyperplane_sig is bit-identical to the interpreted HOF formula") {
    import org.apache.spark.sql.functions._
    // the original (Spark-4-interpreted) formulation HyperplaneSig replaces
    def hofSignature(vecCol: org.apache.spark.sql.Column, planes: Int) = {
      val bitCols = (0 until planes).map { p =>
        val dotWithPlane = aggregate(
          zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
            (x, j) => x.cast("double") *
              ((pmod(xxhash64(lit(p), j), lit(100000L)).cast("double") / 100000.0) - 0.5)),
          lit(0.0), (a, v) => a + v)
        when(dotWithPlane > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bitCols.reduce(_ + _)
    }
    // real embeddings (float arrays), plus the tiny float vecs above
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
    for (df <- Seq(emb.select($"embedding"), vecs.select($"embedding"));
         planes <- Seq(8, 16, 64)) {
      val mismatches = df
        .select(hofSignature($"embedding", planes).as("old"),
          Similarity.lshSignature($"embedding", planes).as("nu"))
        .filter($"old" =!= $"nu").count()
      assert(mismatches == 0, s"signatures diverge for planes=$planes")
    }
  }

  test("embeddingNearDups finds identical vectors with sim 1.0") {
    val dups = Seq(
      (10L, Array(0.5f, 0.5f, 0.0f, 0.1f)),
      (11L, Array(0.5f, 0.5f, 0.0f, 0.1f)), // identical
      (12L, Array(-0.5f, 0.3f, 0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.embeddingNearDups(dups, minSim = 0.99, planes = 8)
      .as[(Long, Long, Double)].collect()
    assert(res.map(r => (r._1, r._2)).toSet == Set((10L, 11L)))
    assert(res.head._3 == 1.0)
  }

  test("lshTopK recall@10 >= 0.8 vs brute force on a clustered corpus") {
    // the q_ann_lsh parameters (k=10, planes=8) over a deterministic
    // clustered corpus (see AnnTestData for why not the uniform-random
    // sf embeddings) — the quantitative gate for a rows-only query:
    // hash-defined buckets have no SQL oracle, so a recall floor vs
    // the exact result is the substitute. Fixed seed + deterministic
    // hashes → the same number every run.
    val emb = AnnTestData.clustered(spark)
    val queries = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val approx = pairs(Similarity.lshTopK(emb, queries, k = 10, planes = 8))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, f"LSH recall@10 degraded: $recall%.3f < 0.8")
    // the md5-weight portable face (q_ann_lsh's gated path since
    // round 18) draws from the same hyperplane family and must hold
    // the same floor — the DuckDB gate proves reproducibility, this
    // proves the approximation is still GOOD
    val portable = pairs(Similarity.lshTopKPortable(emb, queries, k = 10, planes = 8))
    val recallP = (exact & portable).size.toDouble / exact.size
    assert(recallP >= 0.8, f"portable LSH recall@10 degraded: $recallP%.3f < 0.8")
  }

  test("lshTopK returns only true-cosine-ranked candidates (precision)") {
    val res = Similarity
      .lshTopK(vecs, vecs.filter($"vec_id" === 0L), k = 3, planes = 8)
      .as[(Long, Int, Long, Double)].collect()
    // every returned sim must equal the exact cosine (rerank is exact)
    res.foreach { case (_, _, n, sim) =>
      val exact = Map(1L -> 0.9939, 2L -> 0.0, 3L -> 0.0, 4L -> 0.9998)
      assert(math.abs(sim - exact(n)) < 1e-3)
    }
    // ranks strictly ordered
    assert(res.sortBy(_._2).map(_._4).toSeq.reverse.sorted.reverse ==
      res.sortBy(_._2).map(_._4).toSeq)
  }

  test("adaptiveHalf holds mean bucket size flat as the corpus grows") {
    // min h with 2^h·target ≥ n — integer-exact, so the oracle's
    // range-scan reproduces it
    assert(Similarity.adaptiveHalf(500) == 2)    // sf0.01
    assert(Similarity.adaptiveHalf(2000) == 4)   // sf0.1 → planes 8, the old fixed value
    assert(Similarity.adaptiveHalf(20000) == 8)  // sf1
    assert(Similarity.adaptiveHalf(1999) == 4)
    assert(Similarity.adaptiveHalf(2001) == 5)
    // bucket count scales with n: mean bucket n/2^half stays in
    // (target/2, target] whenever 2^half isn't floored/capped
    for (n <- Seq(1000L, 10000L, 100000L, 1000000L)) {
      val mean = n.toDouble / (1L << Similarity.adaptiveHalf(n))
      assert(mean <= 125.0 && mean > 62.0, s"n=$n mean bucket $mean")
    }
    // cap: never consumes more sign bits than maxHalf allows
    assert(Similarity.adaptiveHalf(Long.MaxValue, maxHalf = 16) == 16)
  }

  test("embeddingNearDupsAxisAuto equals the explicit-planes form at its size") {
    val emb = AnnTestData.clustered(spark, n = 600)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    // n=600 → half 3 → planes 6; the auto path must be a pure sizing
    // wrapper, nothing else
    val auto = pairs(Similarity.embeddingNearDupsAxisAuto(emb, minSim = 0.8))
    val explicit = pairs(Similarity.embeddingNearDupsAxis(emb, minSim = 0.8, planes = 6))
    assert(auto == explicit)
    assert(auto.nonEmpty, "clustered corpus should contain near-dups")
  }
}
