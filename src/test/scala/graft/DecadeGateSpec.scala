package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the decade gate's pinned set honest: every pinned name must
  * exist in the inventory (a rename would silently turn the gate into
  * a no-op for that query), ceilings stay in the sane linear band,
  * and the set keeps covering the queries whose failure modes the
  * gate exists for.
  */
class DecadeGateSpec extends AnyFunSuite {
  test("pinned queries exist and ceilings are the linear band") {
    val pins = examples.DecadeGate.Pins
    val unknown = pins.map(_._1).filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"decade-gate pins reference unknown queries: $unknown")
    assert(pins.size >= 10, "the gate must cover the top-10 shuffle movers")
    pins.foreach { case (n, c) =>
      assert(c >= 10.0 && c <= 14.0,
        s"$n ceiling $c outside the 10-14x linear band — a loosened pin " +
          "hides superlinear drift, a sub-10x pin fails legitimate growth")
    }
    // the two round-15 catch classes stay covered for good
    assert(pins.exists(_._1 == "q_linkage"), "stats-broadcast catch class unpinned")
    assert(pins.exists(_._1 == "q_bloom_join"), "fixed-capacity catch class unpinned")
    // round-18 band: every post-r15 arrival and md5-rebuilt signature
    // path must stay under the gate — the r15 sweep predates them
    val wave = Seq("q_dedup_minhash", "q_dedup_simhash", "q_hll_union",
      "q_rfm", "q_threshold_sweep", "q_export_shards", "q_embed_pca",
      "q_nll_sweep",
      "q_lsh_band_sweep", "q_minhash_calibration", "q_cluster_size_dist")
    val missing = wave.filterNot(pins.map(_._1).toSet)
    assert(missing.isEmpty, s"wave-17/18 arrivals unpinned: $missing")
    // output-relative pins must reference pinned queries, and the
    // slack must stay in the "output-proportional plus metadata" band
    // — 2x slack would let a genuinely quadratic intermediate hide
    // behind a superlinear output
    val rel = examples.DecadeGate.OutputRelative
    assert(rel.subsetOf(pins.map(_._1).toSet),
      s"output-relative entries not pinned: ${rel -- pins.map(_._1).toSet}")
    assert(examples.DecadeGate.OutputSlack >= 1.0 &&
      examples.DecadeGate.OutputSlack <= 1.8)
  }
}
