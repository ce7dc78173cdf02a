package graft.plans

import graft.SparkTestSession
import graft.functions.{Dedup, EngineNeutral, Retrieval, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Pins the round-19 doc-at-a-time scoring kernels against the
  * join+aggregate formulations they replace (the TextHashSpec
  * contract: change how, never what). Each case rebuilds the ORIGINAL
  * plan inline — the broadcast (query, term) fan-out + (query, doc)
  * hash aggregate for BM25, the BroadcastNestedLoopJoin + ArrayDot
  * projection for dense cosine — and compares full result rows on the
  * gate corpus.
  *
  * The BM25 comparison is on r4-ROUNDED scores: the kernel sums a
  * (query, doc)'s term contributions in ascending term order where
  * the hash aggregate summed in bucket order — both are fixed orders
  * of the same addends, and the engine-vs-oracle convention already
  * rests on r4 absorbing exactly this association difference. Cosine
  * sims are bit-identical even unrounded (same left-to-right fold).
  */
class ScoreKernelsSpec extends AnyFunSpec {
  lazy val spark = SparkTestSession.spark

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  describe("Bm25Scores kernel") {
    it("bm25TopK matches the legacy broadcast-fan-out + hash-aggregate plan") {
      val corpus = docs.filter(col("source") =!= "src0")
      val queries = docs.filter(col("source") === "src0")
      val topK = 5
      val (k1, b) = (1.2, 0.75)

      // original formulation, inline (pre-round-19 scoreBm25)
      val par = spark.sparkContext.defaultParallelism
      val tok = corpus.repartition(par, col("doc_id"))
        .select(col("doc_id").as("id"),
          TextHashCols.shingleXx64(col("text"), 1, fallback = false).as("ths"))
        .select(col("id"), size(col("ths")).as("dl"), explode(col("ths")).as("th"))
      val tf = tok.groupBy("id", "th")
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val stats = corpus.select(TextHashCols.tokenCount(col("text")).as("dl"))
        .agg(count(lit(1)).as("n"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val dfreq = tf.groupBy("th").agg(count(lit(1)).as("df"))
      val qTerms = queries
        .select(col("doc_id").as("query_id"), explode(Dedup.tokens(col("text"))).as("tok"))
        .select(col("query_id"), xxhash64(col("tok")).as("th"))
        .distinct()
      val qIdf = dfreq.join(broadcast(qTerms), Seq("th"))
        .crossJoin(broadcast(stats))
        .select(col("query_id"), col("th"),
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            .as("idf"), col("avgdl"))
      val contrib =
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
      val scored = tf.join(broadcast(qIdf), Seq("th"))
        .groupBy(col("query_id"), col("id"))
        .agg(sum(contrib).as("s"))
        .select(col("query_id"), col("id").as("doc_id"),
          EngineNeutral.r4(col("s")).as("score"))
      val top = TopKPerKey.topK(scored, Seq("query_id"),
        Seq("score" -> true, "doc_id" -> false), k = topK)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
      val want = top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("doc_id"), col("score"))

      val got = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", topK = topK)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() > 0)
    }
  }

  describe("CosineSims kernel") {
    it("bruteForceTopK matches the legacy BroadcastNestedLoopJoin plan bit-for-bit") {
      val queries = emb.filter(col("vec_id") < 5)
      val k = 10

      // original formulation, inline (pre-round-19 bruteForceTopK)
      def normalized(df: DataFrame): DataFrame =
        df.withColumn("embedding", ArrayUnit.array_unit(col("embedding")))
      val par = spark.sparkContext.defaultParallelism
      val q = broadcast(normalized(queries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
      val scored = normalized(emb.repartition(par))
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
        .join(q, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          EngineNeutral.r4(ArrayDot.array_dot(col("qvec"), col("cvec"))).as("sim"))
      val top = TopKPerKey.topK(scored, Seq("query_id"),
        Seq("sim" -> true, "neighbor_id" -> false), k)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      val want = top.withColumn("rank", row_number().over(w))
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))

      val got = Similarity.bruteForceTopK(emb, queries, k = k)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      assert(got.count() === queries.count() * k)
    }

    it("null and zero-norm vectors keep the join form's null-sim semantics") {
      import spark.implicits._
      val vecs = Seq(
        (0L, Array(1.0, 0.0)),
        (1L, Array(0.0, 1.0)),
        (2L, Array(0.0, 0.0)), // zero-norm: null sim, keeps its pairs
        (3L, Array(0.6, 0.8))
      ).toDF("vec_id", "embedding")
      val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 5)
      // 3 neighbors (1, 2, 3); the zero-norm vector surfaces with a null sim, ranked last
      assert(got.count() === 3)
      val bottom = got.orderBy(col("rank").desc).head
      assert(bottom.getLong(2) === 2L && bottom.isNullAt(3))
    }
  }
}
