package graft.functions

import graft.{SparkEntry, SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** q_embed_pca invariants (rows-only row): the one-pass GramSketch
  * spectrum must agree with a DIRECT driver recompute (collect the
  * gate corpus, two-pass centered covariance, same Jacobi), preserve
  * the trace (Σ eigenvalues = Σ per-dim variances), and produce a
  * monotone, normalized share curve. Plus Jacobi sanity on a matrix
  * with known eigenvalues.
  */
class EmbedStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("Jacobi eigenvalues recover a known spectrum") {
    // diag(5, 2, 1) rotated by a hand-built orthogonal basis would be
    // overkill; a 2x2 with known closed form plus an already-diagonal
    // case cover the rotation and convergence paths
    val ev2 = EmbedStats.symEigenvalues(
      Array(Array(2.0, 1.0), Array(1.0, 2.0))).sorted
    assert(math.abs(ev2(0) - 1.0) < 1e-12 && math.abs(ev2(1) - 3.0) < 1e-12,
      ev2.mkString(","))
    val ev3 = EmbedStats.symEigenvalues(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 1.0)))
      .sorted.reverse
    assert(ev3.zip(Seq(5.0, 2.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("q_embed_pca spectrum matches a direct two-pass covariance recompute") {
    val dim = 64
    val vecs = Tables.embeddings(spark, sf)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    assert(n > 1)
    // two-pass: mean first, then centered covariance — an independent
    // route to the same matrix the one-pass sufficient stats imply
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1.0)
    }
    val expectEv = EmbedStats.symEigenvalues(cov).map(math.max(_, 0.0)).sortBy(-_)
    val total = expectEv.sum

    val got = SparkEntry.queries("q_embed_pca")(spark, sf)
      .select("component", "eigenvalue", "var_share", "cum_share", "effective_rank")
      .collect()
    assert(got.length == 10)
    got.zipWithIndex.foreach { case (r, k) =>
      assert(r.getInt(0) == k + 1)
      val ev = r.getDouble(1)
      assert(math.abs(ev - expectEv(k)) < 1e-4 * math.max(expectEv(0), 1.0),
        s"component ${k + 1}: one-pass $ev vs two-pass ${expectEv(k)}")
      assert(math.abs(r.getDouble(2) - expectEv(k) / total) < 1e-5)
    }
    // share curve: monotone cum, each share in (0, 1], cum <= 1 + eps
    val shares = got.map(_.getDouble(2))
    val cums = got.map(_.getDouble(3))
    assert(shares.forall(s => s > 0 && s <= 1.0))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(cums.last <= 1.0 + 1e-9)
    // trace preservation: sum of ALL eigenvalues equals the trace;
    // the direct recompute's trace is the per-dim variance sum
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    assert(math.abs(total - trace) < 1e-6 * trace)
    // effective rank: in [1, dim], constant across rows
    val eranks = got.map(_.getDouble(4)).distinct
    assert(eranks.length == 1 && eranks.head >= 1.0 && eranks.head <= dim,
      eranks.mkString(","))
    // the sf embeddings are uniform-random: the spectrum should be
    // nearly flat, so effective rank must be CLOSE to full — a
    // collapsed-space false alarm here would mean the math is wrong
    assert(eranks.head > dim * 0.8, s"uniform corpus erank ${eranks.head}")
  }

  // Round-18 guards (VERDICT #3 + ADVICE r17): the sketch's memory law
  // is d(d+1)/2 doubles per task buffer — wide embeddings must refuse
  // loudly, and partial coverage (dim-mismatched rows) or a degenerate
  // zero-variance corpus must never produce a quiet, plausible result.
  test("gram_sketch refuses dims past the buffer-memory ceiling") {
    val e = intercept[IllegalArgumentException] {
      graft.plans.GramSketch.gram_sketch(
        org.apache.spark.sql.functions.col("embedding"), 4096)
    }
    assert(e.getMessage.contains("banded"), e.getMessage)
    // the ceiling itself is fine
    graft.plans.GramSketch.gram_sketch(
      org.apache.spark.sql.functions.col("embedding"),
      graft.plans.GramSketch.MaxDim)
  }

  test("pcaSpectrum refuses partial coverage (dim-mismatched rows)") {
    // dim=32 over the 64-wide gate embeddings: every row skips
    val e = intercept[IllegalArgumentException] {
      EmbedStats.pcaSpectrum(Tables.embeddings(spark, sf), "embedding", 32, 5)
    }
    assert(e.getMessage.contains("not exactly dim-wide"), e.getMessage)
    // mixed widths: the skipped COUNT (not just emptiness) trips it
    import spark.implicits._
    val mixed = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 4.0f), Array(5.0f, 6.0f, 7.0f))
      .toDF("embedding")
    val e2 = intercept[IllegalArgumentException] {
      EmbedStats.pcaSpectrum(mixed, "embedding", 2, 2)
    }
    assert(e2.getMessage.contains("1 of 3"), e2.getMessage)
  }

  test("pcaSpectrum refuses a zero-variance (all-identical) corpus") {
    import spark.implicits._
    val flat = Seq.fill(5)(Array(1.0f, 2.0f, 3.0f)).toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      EmbedStats.pcaSpectrum(flat, "embedding", 3, 3)
    }
    assert(e.getMessage.contains("total variance is 0"), e.getMessage)
  }
}
