package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-space spectral health: the PCA eigenvalue spectrum of a
  * vector column from ONE distributed pass.
  *
  * The distributed part is [[graft.plans.GramSketch]] — count, Σx and
  * the upper-triangular Σxxᵀ with map-side combine, a d(d+1)/2-double
  * summary independent of corpus size. Everything after (covariance,
  * eigensolve, variance shares) is driver arithmetic on a d×d matrix:
  * at d = 64 that is a 2 080-double collect, the same bounded-collect
  * class as q_ridge_regress's Gram sums. The spectrum is the standard
  * diagnosis for anisotropic / collapsed embedding spaces (a few
  * directions hoarding variance starves cosine similarity of
  * resolution), and effective rank (Roy & Vetterli 2007: exp of the
  * spectral entropy) is its one-number summary.
  */
object EmbedStats {

  /** Eigenvalues of a symmetric matrix by cyclic Jacobi rotations —
    * textbook (Golub & Van Loan §8.5): repeatedly zero the largest
    * off-diagonal elements via 2×2 rotations until the off-diagonal
    * mass is negligible. O(d³) per sweep, a handful of sweeps at
    * d ≤ a few hundred; driver-side only.
    */
  private[graft] def symEigenvalues(m: Array[Array[Double]]): Array[Double] = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val eps = 1e-14 * math.max(a.indices.map(i => math.abs(a(i)(i))).max, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (off > eps && sweep < 100) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > eps) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign must be ±1 even at theta = 0 (equal diagonals need
            // the full 45° rotation; signum(0) = 0 would skip it)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    Array.tabulate(d)(i => a(i)(i))
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  /** Sample covariance from the one-pass sufficient statistics. */
  private[graft] def covarianceOf(n: Long, s: Array[Double], g: Array[Double],
                                  dim: Int): Array[Array[Double]] = {
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (g(t) - s(i) * s(j) / n) / (n - 1.0)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    cov
  }

  /** Top-k PCA components of `vecCol`: one row per component with its
    * eigenvalue, variance share, cumulative share, and the spectrum's
    * effective rank (constant across rows — the headline number).
    * Tiny negative eigenvalues (floating-point noise on a PSD matrix)
    * clamp to zero; shares are r6-rounded so the 10-row result is
    * stable across partitionings of the same data.
    */
  def pcaSpectrum(df: DataFrame, vecCol: String, dim: Int, topK: Int): DataFrame = {
    val spark = df.sparkSession
    val row = df
      .agg(graft.plans.GramSketch.gram_sketch(col(vecCol), dim).as("gs"))
      .select(col("gs.n"), col("gs.skipped"), col("gs.s"), col("gs.g"))
      .head()
    val n = row.getLong(0)
    val skipped = row.getLong(1)
    // a partial spectrum must be loud: null / wrong-length rows mean
    // either a dim-mismatched call (64 on a 128-wide column) or a
    // mixed-width table — a spectrum over the silent subset would
    // LOOK complete (ADVICE r17). Checked before the n floor: when the
    // dim is wrong, EVERY row skips and "needs at least 2 vectors"
    // would point at the wrong cause.
    require(skipped == 0L,
      s"pcaSpectrum($vecCol, dim=$dim): $skipped of ${n + skipped} rows were " +
        "null or not exactly dim-wide — fix the dim argument or filter the " +
        "column explicitly before calling")
    require(n > 1, s"pcaSpectrum needs at least 2 vectors, got $n")
    val s = row.getSeq[Double](2).toArray
    val g = row.getSeq[Double](3).toArray
    // One-pass covariance (G − ssᵀ/n)/(n−1) cancels catastrophically
    // when ‖μ‖² ≫ variance (a strongly off-center embedding space):
    // doubles keep ~16 digits, so variance below ~1e-12·‖μ‖² is noise
    // here — center (or pivot by a first-row shift) upstream and use
    // a two-pass covariance if that regime matters. The unit-norm /
    // roughly-centered spaces this diagnoses are far from the cliff.
    val cov = covarianceOf(n, s, g, dim)
    val ev = symEigenvalues(cov).map(e => math.max(e, 0.0)).sortBy(-_)
    val total = ev.sum
    // all-identical vectors: zero variance in every direction — there
    // is no spectrum to rank; NaN shares would leak otherwise
    require(total > 0.0,
      s"pcaSpectrum($vecCol): total variance is 0 (all $n vectors identical " +
        "up to float precision) — the spectrum is undefined")
    val probs = ev.filter(_ > 0).map(_ / total)
    val erank = r4(math.exp(-probs.map(p => p * math.log(p)).sum))
    var cum = 0.0
    val out = (0 until math.min(topK, dim)).map { k =>
      val share = ev(k) / total
      cum += share
      Row(k + 1, r6(ev(k)), r6(share), r6(cum), erank)
    }
    val schema = StructType(Seq(
      StructField("component", IntegerType, nullable = false),
      StructField("eigenvalue", DoubleType, nullable = false),
      StructField("var_share", DoubleType, nullable = false),
      StructField("cum_share", DoubleType, nullable = false),
      StructField("effective_rank", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
