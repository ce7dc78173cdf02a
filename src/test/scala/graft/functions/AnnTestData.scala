package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic clustered embedding corpus for ANN recall floors.
  *
  * Recall is only a meaningful quality metric when true near
  * neighbors exist: on the uniform-random sf embeddings (max pairwise
  * cosine ≈ 0.5) every "top-10" is a set of essentially-arbitrary
  * mid-similarity vectors, and approximate recall there measures
  * bucketing luck, not index quality. This corpus has real cluster
  * structure (the regime ANN indexes exist for), with a fixed seed so
  * the recall measurement is exactly repeatable.
  */
object AnnTestData {
  def clustered(spark: SparkSession, n: Int = 2000, dim: Int = 64,
                clusters: Int = 25, noise: Double = 0.15): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(clusters, dim)(rnd.nextGaussian())
    (0 until n).map { i =>
      val c = centers(i % clusters)
      (i.toLong, c.map(x => (x + noise * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
  }
}
