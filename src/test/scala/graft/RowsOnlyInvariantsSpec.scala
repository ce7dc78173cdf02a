package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantitative gates for the rows-only queries (SURVEY §2 "✅rows"):
  * hash/LSH/sketch internals have no portable SQL oracle, so each one
  * gets a property assertion here instead — error bounds vs the exact
  * answer, run-to-run determinism, or an independent driver-side
  * recomputation of the reported values. The ANN recall floors
  * (q_ann_lsh, q_ann_ivf) live in SimilaritySpec/IvfSpec.
  */
class RowsOnlyInvariantsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.01"

  test("q_approx_distinct is within 3x the sketch rsd of exact counts") {
    // no longer rows-only (the round-15 portable HLL is hash-gated),
    // but the ACCURACY invariant stays: the oracle proves both engines
    // compute the same estimate, not that the estimate is any good.
    // m = 1024 → rsd ≈ 1.04/√1024 ≈ 3.25%
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id").as("n")).as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val rel = math.abs(approx(k) - n).toDouble / n
      assert(rel <= 3 * 1.04 / 32.0, f"$k: approx=${approx(k)} exact=$n relErr=$rel%.4f > 3*rsd")
    }
  }

  test("q_approx_percentile values honor the sketch's rank-error bound") {
    // Spark guarantees the returned value's rank is within
    // n/accuracy of the target rank; verify against exact per-group
    // rank counts with a +2 integer-boundary margin
    val rows = SparkEntry.queries("q_approx_percentile")(spark, sf)
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag".as[String], $"l_extendedprice".as[Double])
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (rf, p50, p95) =>
      val vs = li(rf)
      val n = vs.length.toDouble
      val eps = n / 10000.0 + 2
      Seq(0.5 -> p50, 0.95 -> p95).foreach { case (p, v) =>
        val lt = vs.count(_ < v)
        val le = vs.count(_ <= v)
        val target = p * n
        assert(lt <= target + eps && le >= target - eps,
          f"$rf p=$p: value $v has rank window [$lt,$le], target $target%.1f ± $eps%.1f")
      }
    }
  }

  test("q_fingerprint is deterministic across two independent runs") {
    def run() = SparkEntry.queries("q_fingerprint")(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(run() == run())
  }

  private def shingleSet(t: String, k: Int = 3): Set[String] = {
    val toks = t.split(" ").filter(_.nonEmpty)
    if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toSet
    else Set(toks.mkString(" "))
  }

  test("q_dedup_minhash pairs all have substantial exact Jaccard") {
    // est_jaccard >= 0.5 candidates must be genuinely similar: the
    // exact shingle-set Jaccard of every reported pair clears a floor
    // well above the random-pair level (~0 on this corpus)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val pairs = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val exact = pairs.map { case (a, b) =>
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      (a, b, (sa & sb).size.toDouble / (sa | sb).size)
    }
    exact.foreach { case (a, b, j) =>
      assert(j >= 0.3, f"pair ($a,$b): exact jaccard $j%.3f below candidate floor")
    }
  }

  test("q_dedup_simhash hamming distances match an independent recomputation") {
    val sh = Dedup.simhashes(Tables.documents(spark, sf), "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, h) =>
      assert(a < b, s"pair order violated: ($a,$b)")
      assert(h <= 3, s"pair ($a,$b) exceeds maxHamming: $h")
      assert(java.lang.Long.bitCount(sh(a) ^ sh(b)) == h,
        s"pair ($a,$b): reported hamming $h != recomputed")
    }
  }

  test("q_dedup_embedding sims equal exact cosine and clear the threshold") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      d(ad, bd) / (math.sqrt(d(ad, ad)) * math.sqrt(d(bd, bd)))
    }
    val pairs = SparkEntry.queries("q_dedup_embedding")(spark, sf)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, s) =>
      assert(a < b, s"pair order violated: ($a,$b)")
      assert(s >= 0.3, s"pair ($a,$b) below minSim: $s")
      // reported sim is EngineNeutral.r4 (4-decimal) of normalized-dot;
      // normalization vs direct cosine differ only by float rounding
      assert(math.abs(s - cos(vecs(a), vecs(b))) < 5e-4,
        s"pair ($a,$b): reported $s != exact ${cos(vecs(a), vecs(b))}")
    }
  }

  test("q_coreness equals a sequential min-degree-peel reference on the gate corpus") {
    val got = SparkEntry.queries("q_coreness")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got.values.max >= 2,
      s"degenerate graph: max coreness ${if (got.isEmpty) -1 else got.values.max}")
    // independent reference: textbook peeling over the collected edges
    val edges = graft.functions.Dedup.sharedShingleEdges(
        Tables.documents(spark, sf), "doc_id", "text",
        shingleK = 3, minShared = 5, minDf = 2, maxDf = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val want = scala.collection.mutable.Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      k = math.max(k, adj.valuesIterator.map(_.size).min.toLong)
      var changed = true
      while (changed) {
        val drop = adj.collect { case (v, ns) if ns.size <= k => v }.toSeq
        changed = drop.nonEmpty
        drop.foreach { v =>
          want(v) = k
          adj.remove(v).foreach(_.foreach(n => adj.get(n).foreach(_ -= v)))
        }
      }
    }
    assert(got == want.toMap, "distributed peeling diverged from the reference")
    // the PERSISTED route (row 133b) must serve the identical
    // decomposition — one truth, two physical routes, same invariant
    val indexed = SparkEntry.queries("q_coreness_indexed")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(indexed == want.toMap,
      "indexed coreness diverged from the sequential peel reference")
  }

  test("q_hll_union: sketches merge exactly and estimates stay within 5% of exact") {
    val rows = SparkEntry.queries("q_hll_union")(spark, sf)
      .as[(String, Long)].collect().toMap
    // mergeability law: the union of per-source register tables must
    // estimate EXACTLY what one whole-corpus register table estimates
    // (same register state, not just similar numbers). Since round 17
    // this is also what the DuckDB gate proves. NOTE (ADVICE r17):
    // both sides below are PortableHll, so union == whole holds BY
    // CONSTRUCTION (max-of-max over identical hashes) — the equality
    // is a wiring check, not an independent one; independence comes
    // from the DuckDB gate, the 5% exact-count floor below, and the
    // hand-computed register check at the end of this test.
    val wholeRegs = graft.functions.PortableHll.registers(
      Tables.documents(spark, sf)
        .select(explode(graft.functions.Dedup.tokens(col("text"))).as("t")),
      Seq(), col("t"))
    val whole = graft.functions.PortableHll.estimate(wholeRegs, Seq())
      .select("est_distinct").as[Long].collect().head
    assert(rows("ALL") == whole,
      s"union-of-parts ${rows("ALL")} != whole-corpus sketch $whole")
    // error floor vs exact distincts, per source and globally
    val exact = Tables.documents(spark, sf)
      .select(col("source"), explode(graft.functions.Dedup.tokens(col("text"))).as("t"))
      .groupBy("source").agg(countDistinct("t").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = Tables.documents(spark, sf)
      .select(explode(graft.functions.Dedup.tokens(col("text"))).as("t"))
      .agg(countDistinct("t")).as[Long].collect().head
    (exact + ("ALL" -> exactAll)).foreach { case (src, n) =>
      val rel = math.abs(rows(src) - n).toDouble / n
      assert(rel <= 0.05, f"$src: est ${rows(src)} vs exact $n relErr $rel%.4f")
    }
    // in-repo INDEPENDENT register check (ADVICE r17): replay the
    // hash → bucket → rho chain in plain JVM code (MessageDigest +
    // integer ops — no Spark expressions) over a controlled token set
    // and require the register TABLE to match exactly. This is the
    // cross-implementation check the old DataSketches comparison
    // provided before the round-17 rebuild.
    def md5Long60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.take(15), 16)
    val tokens = Seq("alpha", "beta", "gamma", "delta", "alpha")
    val wantRegs = tokens.distinct.map { t =>
      val h = md5Long60(t)
      val rest = h / graft.functions.PortableHll.m
      val rho =
        if (rest == 0L) 51
        else 51 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      (h.toLong % graft.functions.PortableHll.m, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val gotRegs = graft.functions.PortableHll.registers(
        tokens.toDF("t"), Seq(), col("t"))
      .select("bucket", "mr").as[(Long, Int)].collect().toMap
    assert(gotRegs == wantRegs,
      s"register chain diverged from the hand computation: $gotRegs vs $wantRegs")
  }

  test("q_bpe_merges' first merge is the corpus's true top adjacent char pair") {
    // independent recompute of iteration 1 with a DIFFERENT engine
    // path: per-token adjacent character pairs (with the </w>
    // sentinel) counted by a Spark aggregation over the RAW token
    // stream — weighting by token occurrence is exactly the
    // word-count weighting the driver loop uses
    import graft.functions.Bpe
    val first = SparkEntry.queries("q_bpe_merges")(spark, sf)
      .orderBy("rank").limit(1)
      .as[(Int, String, String, Long)].collect().head
    val top = Tables.documents(spark, sf)
      .select(explode(graft.functions.Dedup.tokens(col("text"))).as("w"))
      .select(explode(expr(
        s"""transform(
           |  sequence(1, length(w)),
           |  i -> struct(
           |    substring(w, i, 1) AS l,
           |    CASE WHEN i = length(w) THEN '${Bpe.Eow}'
           |         ELSE substring(w, i + 1, 1) END AS r))""".stripMargin))
        .as("p"))
      .groupBy(col("p.l"), col("p.r")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(1).as[(String, String, Long)].collect().head
    assert((first._2, first._3, first._4) == top,
      s"first merge $first != independently recomputed top pair $top")
  }

  test("q_ngram_jaccard values are the exact shingle-set Jaccard") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val rows = SparkEntry.queries("q_ngram_jaccard")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, j) =>
      assert(j >= 0.5 && j <= 1.0, s"pair ($a,$b) outside [0.5,1]: $j")
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val exact = (sa & sb).size.toDouble / (sa | sb).size
      assert(j == exact, s"pair ($a,$b): reported $j != recomputed $exact")
    }
  }
}
