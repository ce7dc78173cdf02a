package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-15 corpus-health invariants: exact driver recomputes for the
  * KS statistic and the Gini rank sums (pure-integer references), and
  * tolerance-checked recomputes for the two ln-based fits — the
  * semantic guarantees behind the SQL oracles.
  */
class CorpusHealthQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def toks(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  private lazy val docs: Array[(String, Long, String)] =
    Tables.documents(spark, sf)
      .select($"source".as[String], $"n_chars".as[Long], $"text".as[String])
      .collect()

  test("q_ks_test matches an exact driver KS recompute per source") {
    val got = SparkEntry.queries("q_ks_test")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val bySource = docs.groupBy(_._1)
    val all = docs.map(_._2).sorted
    val xs = all.distinct
    bySource.foreach { case (src, rows) =>
      val mine = rows.map(_._2).sorted
      val rest = docs.filterNot(_._1 == src).map(_._2).sorted
      val d = xs.map { x =>
        val fs = mine.count(_ <= x).toDouble / mine.length
        val fr = rest.count(_ <= x).toDouble / rest.length
        math.abs(fs - fr)
      }.max
      val (_, nDocs, ks) = got(src)
      assert(nDocs == rows.length, s"$src n_docs")
      assert(math.abs(ks - d) < 1e-6 + 1e-12, f"$src: ks $ks vs driver $d%.8f")
    }
    // KS is a probability-scale statistic
    got.values.foreach { case (s, _, ks) =>
      assert(ks >= 0.0 && ks <= 1.0, s"$s ks out of [0,1]: $ks")
    }
  }

  test("q_gini_tokens matches an exact BigInt rank-sum recompute") {
    val got = SparkEntry.queries("q_gini_tokens")(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val cnt = rows.flatMap(r => toks(r._3)).groupBy(identity)
        .view.mapValues(_.length.toLong).toSeq
      val ranked = cnt.sortBy { case (tok, c) => (c, tok) }.zipWithIndex
      val v = ranked.length
      val n = cnt.map(_._2).sum
      val src2 = ranked.map { case ((_, c), i) => BigInt(i + 1) * c }.sum
      val gini = (2.0 * src2.toDouble - (v + 1).toDouble * n.toDouble) /
        (v.toDouble * n.toDouble)
      val (_, gn, gv, gg) = got(src)
      assert(gn == n && gv == v, s"$src totals: ($gn,$gv) vs ($n,$v)")
      assert(math.abs(gg - gini) < 1e-6 + 1e-12, s"$src gini $gg vs $gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
  }

  test("q_zipf_slope matches a driver OLS over the top-100 and is negative") {
    val got = SparkEntry.queries("q_zipf_slope")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val cnt = rows.flatMap(r => toks(r._3)).groupBy(identity)
        .view.mapValues(_.length.toLong).toSeq
      val top = cnt.sortBy { case (tok, c) => (-c, tok) }.take(100)
      val xy = top.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble))
      }
      val n = xy.length.toDouble
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (_, nTop, gs) = got(src)
      assert(nTop == xy.length, s"$src n_top")
      assert(math.abs(gs - slope) < 1e-4 + 1e-9, s"$src slope $gs vs $slope")
      assert(gs < 0.0, s"$src: Zipf slope must be negative, got $gs")
    }
  }

  test("degenerate corpora: single-source KS and single-token Zipf are excluded, not NaN") {
    // KS against an empty "rest" sample is 0/0 and a one-point Zipf
    // fit has a zero OLS denominator — Spark (NULL on /0) and DuckDB
    // (NaN, which sorts ABOVE everything in max) would diverge, so
    // both queries exclude the degenerate group identically in query
    // and oracle; this pins the Spark half
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("chealth_degen").toString
    Seq(
      (1L, "alpha beta gamma alpha", "en", "only_source", 22L),
      (2L, "beta gamma delta", "en", "only_source", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ks = SparkEntry.queries("q_ks_test")(spark, dir).collect()
    assert(ks.isEmpty, s"single-source corpus must yield no KS rows: ${ks.toSeq}")

    val dir2 = java.nio.file.Files.createTempDirectory("chealth_degen2").toString
    Seq(
      (1L, "same same same", "en", "one_type", 14L),
      (2L, "alpha beta gamma alpha beta", "en", "healthy", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val z = SparkEntry.queries("q_zipf_slope")(spark, dir2).collect()
    assert(z.map(_.getString(0)).toSet == Set("healthy"),
      s"one-type-vocabulary source must be excluded: ${z.toSeq}")
    z.foreach(r => assert(!r.getDouble(2).isNaN && !r.isNullAt(2)))
  }

  test("q_seasonal_anomaly matches a driver baseline recompute; degenerate " +
    "baselines z-score to 0") {
    import org.apache.spark.sql.functions.{col, date_format, date_trunc, hour}
    val buckets = Tables.events(spark, sf)
      .select(col("event_type").as[String],
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as[String],
        hour(col("ts")).as[Int])
      .collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, day, hod), c) => (t, day, hod, c) }
    val got = SparkEntry.queries("q_seasonal_anomaly")(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    buckets.groupBy(_._1).foreach { case (t, rows) =>
      val byHod = rows.groupBy(_._3)
      val zs = rows.map { case (_, _, hod, c) =>
        val cs = byHod(hod).map(_._4)
        val n = cs.length.toDouble
        val s = cs.sum.toDouble; val q = cs.map(x => x.toDouble * x).sum
        val varT = (q - s * s / n) / (n - 1)
        if (n > 1 && varT > 0) math.abs(c - s / n) / math.sqrt(varT) else 0.0
      }
      val (_, nb, na, mz) = got(t)
      assert(nb == rows.length, s"$t n_buckets")
      assert(na == zs.count(_ > 3.0), s"$t n_anomalous")
      assert(math.abs(mz - zs.max) < 1e-4 + 1e-9, s"$t max_z $mz vs ${zs.max}")
    }
    assert(got.nonEmpty)
  }

  test("q_gini_users matches an exact BigInt rank-sum recompute on events") {
    import org.apache.spark.sql.functions.col
    val evts = Tables.events(spark, sf)
      .select(col("event_type").as[String], col("user_id").as[Long])
      .collect()
    val got = SparkEntry.queries("q_gini_users")(spark, sf)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    evts.groupBy(_._1).foreach { case (t, rows) =>
      val cnt = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val ranked = cnt.sortBy { case (uid, c) => (c, uid) }.zipWithIndex
      val v = ranked.length; val n = cnt.map(_._2).sum
      val src = ranked.map { case ((_, c), i) => BigInt(i + 1) * c }.sum
      val gini = (2.0 * src.toDouble - (v + 1).toDouble * n.toDouble) /
        (v.toDouble * n.toDouble)
      val (_, gn, gv, gg) = got(t)
      assert(gn == n && gv == v, s"$t totals")
      assert(math.abs(gg - gini) < 1e-6 + 1e-12, s"$t gini $gg vs $gini")
    }
    assert(got.nonEmpty)
  }

  test("q_cond_entropy matches a driver recompute and sits in [0, ln vocab]") {
    val got = SparkEntry.queries("q_cond_entropy")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val bgs = rows.flatMap { r => val w = toks(r._3); w.zip(w.drop(1)) }
      val c12 = bgs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val c1 = bgs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      val nBg = bgs.length.toLong
      val h = c12.map { case ((t1, _), c) =>
        c.toDouble * (math.log(c1(t1).toDouble) - math.log(c.toDouble))
      }.sum / nBg
      val (_, gn, gh) = got(src)
      assert(gn == nBg, s"$src n_bigrams")
      assert(math.abs(gh - h) < 1e-4 + 1e-9, s"$src h_cond $gh vs $h")
      val vocab = rows.flatMap(r => toks(r._3)).distinct.length
      assert(gh >= 0.0 && gh <= math.log(vocab.toDouble) + 1e-9,
        s"$src h_cond $gh outside [0, ln($vocab)]")
    }
  }
}
