package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Wave-14 calibration-family invariants: driver recomputes for the
  * winnowing selection and the fixed-point embedding stats (bit-exact
  * references in plain Scala), KN internal consistency from the
  * emitted integer counts, and the z-blend's algebraic properties
  * (per-language mean 0, no NaN escapes, keep/blend agreement) — the
  * behavioral guarantees the SQL oracle proves computationally but
  * not semantically.
  */
class CalibrationQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  /** Driver winnowing reference: same composite-key rule (md5 hex ++
    * zero-padded reversed position), windows of 4 over 4-gram hashes.
    */
  private def winnowFingerprints(words: Array[String]): Set[String] = {
    val k = 4; val w = 4
    val m = math.max(words.length - k, 0) + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until m).map { i =>
      val g = words.slice(i, i + k).mkString(" ")
      val h = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      h + "%09d".format(999999999 - i)
    }
    (0 to math.max(m - w, 0)).map { q =>
      hs.slice(q, q + w).min
    }.toSet
  }

  test("q_winnowing matches a driver winnowing reference exactly, " +
    "and density sits near the paper's 2/(w+1) expectation") {
    val got = SparkEntry.queries("q_winnowing")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, m, nfp, dens) => id -> ((m, nfp, dens)) }.toMap
    val docs = Tables.documents(spark, sf)
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    assert(docs.nonEmpty && got.size == docs.length)
    docs.foreach { case (id, text) =>
      val words = toks(text)
      val fps = winnowFingerprints(words)
      val m = math.max(words.length - 4, 0) + 1
      val (gm, gnfp, _) = got(id)
      assert(gm == m, s"doc $id: n_grams $gm != $m")
      assert(gnfp == fps.size, s"doc $id: n_fp $gnfp != ${fps.size}")
    }
    val meanDensity = got.values.map(_._3).sum / got.size
    // 2/(w+1) = 0.4 for w=4; generous band — synthetic-vocab repeats
    // shift it, but an off-by-one in window handling lands far outside
    assert(meanDensity > 0.25 && meanDensity < 0.65,
      f"mean density $meanDensity%.3f implausible for w=4")
  }

  test("q_winnowing honors the detection guarantee: a shared run of " +
    "k+w-1 tokens implies a shared fingerprint") {
    // construct two synthetic docs sharing exactly one 7-token run
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = ("one two three " + shared + " four five six").split(" ")
    val b = ("red blue green " + shared + " yellow pink teal").split(" ")
    val fa = winnowFingerprints(a).map(_.take(32))
    val fb = winnowFingerprints(b).map(_.take(32))
    assert((fa & fb).nonEmpty,
      "no shared fingerprint despite a shared k+w-1 token run")
  }

  test("q_kneser_ney rows are internally consistent and correctly " +
    "counted against a driver token scan") {
    val rows = SparkEntry.queries("q_kneser_ney")(spark, sf)
      .as[(String, String, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // driver reference counts
    val docs = Tables.documents(spark, sf).select($"text".as[String]).collect()
    val bigrams = docs.flatMap { t => val w = toks(t); w.zip(w.drop(1)) }
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nAfter = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nBefore = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bTypes = c12.size.toLong
    rows.foreach { case (t1, t2, gc12, gc1, gna, gnb, pkn) =>
      assert(gc12 == c12((t1, t2)), s"c12($t1,$t2)")
      assert(gc1 == c1(t1), s"c1($t1)")
      assert(gna == nAfter(t1), s"n_after($t1)")
      assert(gnb == nBefore(t2), s"n_before($t2)")
      val d = 0.75
      val expect = math.max(gc12 - d, 0.0) / gc1 +
        d * gna / gc1 * (gnb.toDouble / bTypes)
      assert(math.abs(pkn - expect) < 1e-6 + 1e-9,
        f"p_kn($t1,$t2): $pkn vs $expect%.8f")
      assert(pkn > 0 && pkn <= 1.0, s"p_kn($t1,$t2) out of (0,1]: $pkn")
    }
    // top-100 really is the count-descending head
    val minTop = rows.map(_._3).min
    val below = c12.values.count(_ > minTop)
    assert(below <= rows.length, "a higher-count bigram missed the top set")
  }

  test("q_quality_blend: per-language blend mean is 0, no NaN escapes, " +
    "keep agrees with the unrounded threshold") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_quality_blend")(spark, sf01)
      .as[(Long, String, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(r => r._3.isNaN || r._3.isInfinite), "NaN/Inf blend")
    // blend is a linear combination of per-lang z-scores => mean 0 per
    // lang; rows carry source not lang, so assert the corpus mean of a
    // complete per-lang-zero quantity is ~0 too
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean) < 1e-3, f"corpus blend mean $mean%.6f far from 0")
    rows.foreach { case (id, _, blend, keep) =>
      // r4'd blend vs the unrounded threshold can only disagree within
      // half an ulp of the rounding grid around -0.5
      if (blend > -0.4999 && !keep) fail(s"doc $id: blend $blend but keep=false")
      if (blend < -0.5001 && keep) fail(s"doc $id: blend $blend but keep=true")
    }
  }

  test("q_quality_blend: single-doc and zero-variance languages get a " +
    "zeroed z term, never NaN/Inf/null (round-14 advice guard)") {
    // a language with exactly ONE doc (n-1 = 0) and a language whose
    // three signals have ZERO variance (identical docs) — before the
    // guard, Spark emitted NULL (non-ANSI divide-by-zero) where DuckDB
    // emitted IEEE inf/NaN; both now zero the z term identically
    val dir = java.nio.file.Files.createTempDirectory("qblend_degenerate").toString
    Seq(
      (1L, "lone wolf document text here", "solo", "src_a", 28L),
      (2L, "same same words here", "flat", "src_b", 20L),
      (3L, "same same words here", "flat", "src_b", 20L),
      (4L, "alpha beta gamma delta epsilon", "ok", "src_c", 30L),
      (5L, "a b", "ok", "src_c", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_quality_blend")(spark, dir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(!r.isNullAt(2), s"doc ${r.getLong(0)}: NULL blend leaked")
      val b = r.getDouble(2)
      assert(!b.isNaN && !b.isInfinite, s"doc ${r.getLong(0)}: blend $b")
    }
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // all z terms zeroed for the degenerate languages => blend exactly 0
    assert(byId(1L) == 0.0 && byId(2L) == 0.0 && byId(3L) == 0.0,
      s"degenerate-language blends not zeroed: $byId")
    // the healthy 2-doc language still standardizes (±z, nonzero)
    assert(byId(4L) != 0.0 && byId(5L) != 0.0 && byId(4L) > byId(5L))
  }

  test("q_embed_dim_stats matches a driver fixed-point recompute " +
    "bit-exactly and reports every dimension") {
    val got = SparkEntry.queries("q_embed_dim_stats")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val vecs = Tables.embeddings(spark, sf)
      .select($"embedding".as[Seq[Float]]).collect()
    val dims = vecs.head.length
    assert(got.keySet == (1 to dims).map(_.toLong).toSet)
    def r(x: Double, p: Double) = math.floor(x * p + 0.5) / p
    (0 until dims).foreach { i =>
      val vm = vecs.map(v => math.floor(v(i).toDouble * 10000.0 + 0.5).toLong)
      val n = vm.length.toLong
      val s = vm.sum; val q = vm.map(x => x * x).sum
      val mean = r(s.toDouble / n / 10000.0, 1e6)
      val variance = r((q.toDouble / n - (s.toDouble / n) * (s.toDouble / n)) / 1e8, 1e6)
      val nz = vm.count(x => math.abs(x) < 100).toLong
      val (_, gn, gmean, gvar, gnz) = got((i + 1).toLong)
      assert(gn == n && gmean == mean && gvar == variance &&
        gnz == r(nz.toDouble / n, 1e4),
        s"dim ${i + 1}: got ($gn,$gmean,$gvar,$gnz) want ($n,$mean,$variance,${r(nz.toDouble / n, 1e4)})")
      assert(gvar >= 0.0, s"dim ${i + 1}: negative variance")
    }
  }

  test("q_lsh_band_sweep: candidate volume grows with band count, " +
    "survivors are banding-invariant truths, and the 16-band row IS " +
    "the production q_dedup_minhash count") {
    val rows = SparkEntry.queries("q_lsh_band_sweep")(spark, sf)
      .as[(Int, Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8, 16, 32))
    rows.foreach { case (nb, r, nc, g3, g5) =>
      assert(nb * r == 64, s"config ($nb,$r) does not tile 64 hashes")
      assert(g5 <= g3 && g3 <= nc, s"survival not monotone at $nb bands")
    }
    // the S-curve: more bands can only ADD candidate pairs from the
    // same signature table (each config's buckets refine coarser ones
    // only in one direction), so volume is non-decreasing in nb
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      s"candidate volume not non-decreasing: ${rows.map(_._3).toSeq}")
    // cross-pin: the 16-band config is EXACTLY the production path,
    // so its ≥0.5 survivor count must equal q_dedup_minhash's rows
    val prod = SparkEntry.queries("q_dedup_minhash")(spark, sf).count()
    assert(rows.find(_._1 == 16).get._5 == prod,
      "16-band sweep row diverged from the production candidate count")
  }

  test("q_minhash_calibration: bucket partition of the est≥0.25 " +
    "candidate set, by-construction bounds hold") {
    val rows = SparkEntry.queries("q_minhash_calibration")(spark, sf)
      .as[(Int, Long, Double, Double, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, me, mn, mx, ne) =>
      assert(b >= 2 && b <= 9, s"bucket $b outside est≥0.25 range")
      assert(n > 0 && ne <= n, s"bucket $b: error count exceeds pairs")
      assert(mn <= mx, s"bucket $b: min_exact > max_exact")
      assert(mn >= 0.0 && mx <= 1.0, s"bucket $b: jaccard outside [0,1]")
      // mean_est must live in the bucket's own decile (bucket 9 is
      // open-topped: est can be 1.0)
      assert(me >= b / 10.0 - 1e-12 &&
        (b == 9 || me < (b + 1) / 10.0 + 1e-12),
        s"bucket $b: mean_est $me outside its decile")
    }
    // the buckets partition the candidate set: sizes sum to the
    // est≥0.25 candidate count from the production path
    val cands = graft.functions.Dedup
      .minhashCandidates(Tables.documents(spark, sf), "doc_id", "text")
      .filter(col("est_jaccard") >= 0.25).count()
    assert(rows.map(_._2).sum == cands,
      s"bucket sizes ${rows.map(_._2).sum} != candidate count $cands")
  }
}
