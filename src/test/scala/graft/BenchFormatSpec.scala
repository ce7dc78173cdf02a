package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line must fit the consumer's 2000-char tail
  * window — this is the regression gate for "add a query, truncate
  * the line mid-JSON and the artifact records parsed: null", which
  * went unnoticed for five rounds. Round 15 made the fit STRUCTURAL:
  * keys are enumerated base-36 positions and the fastest entries trim
  * adaptively (with an explicit `q_omitted` count) when the full map
  * would overflow, so the line parses at ANY inventory size — the
  * recurring per-wave headroom wall is gone by construction.
  *
  * Worst-case per-query value is pinned at 99.9 s, which since the
  * round-18 densification renders "100" — fCompact's WIDEST class (3
  * chars; <10 s prints "9.9", also 3). The densification (≥10 s drops
  * the decimal, still 2 sig figs in the 10-99 band) is what fits the
  * 193-query FULL map back inside the tail-window budget.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val worstCase = 99.9

  test("current inventory: the FULL map fits at worst-case value widths") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase))
    val (line, note) = BenchFormat.compactLine(
      results, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    assert(note.isEmpty,
      s"query inventory outgrew the full-map budget (${line.length} chars): " +
        "the adaptive trim will keep the line parsing, but a full stdout map " +
        "needs either realistic-width acceptance or a denser value format")
    assert(line.length <= BenchFormat.MaxLineChars)
    assert(!line.contains("\"q_omitted\""))
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"shuffle_mb\":99999"))
    assert(line.contains("\"sf\":0.1"))
  }

  test("driver tail-window consumption: every plausible parser recovers the line") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase))
    val (line, _) = BenchFormat.compactLine(
      results, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    // The transcript as the consumer sees it after build.sbt's
    // StdoutOutput (program lines raw, no "[info] " prefix) and
    // showSuccess := false (no "[success] Total time …" trailer), with
    // Bench printing the line once, after spark.stop(): sbt preamble,
    // Spark log noise, then the JSON as the FINAL line.
    val transcript = (Seq(
      "[info] welcome to sbt",
      "[info] compiling 1 Scala source",
      "[info] running (fork) graft.Bench ") ++
      (1 to 40).map(i => s"26/08/13 00:00:$i WARN TaskSetManager: noise line $i") ++
      Seq(line)).mkString("\n") + "\n"
    val tail = transcript.takeRight(2000)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // parser A: last non-empty line of the tail is JSON
    val lastLine = tail.split("\n").filter(_.nonEmpty).last
    val a = mapper.readTree(lastLine)
    assert(a.get("metric").asText == "total" && a.get("queries").size == results.size)
    // parser B: any line starting with '{'
    val b = tail.split("\n").filter(_.startsWith("{"))
    assert(b.length == 1 && mapper.readTree(b.head).get("failed").asInt == 0)
    // parser C: substring from first '{' to last '}'
    val c = tail.substring(tail.indexOf('{'), tail.lastIndexOf('}') + 1)
    assert(mapper.readTree(c).get("metric").asText == "total")
  }

  test("+50 queries: the line still fits, parses, and any trim is loud (headroom gate)") {
    val padded = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase)) ++
      (1 to 50).map(i => (f"q_future_$i%02d", worstCase))
    val (line, note) = BenchFormat.compactLine(
      padded, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    assert(line.length <= BenchFormat.MaxLineChars)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(line)
    val kept = tree.get("queries").size
    assert(kept > 100, s"only $kept per-query entries survived at +50 queries")
    // a partial map must be loud: q_omitted in the JSON AND a stderr note
    if (kept < padded.size) {
      assert(tree.get("q_omitted").asInt == padded.size - kept)
      assert(note.isDefined)
    } else assert(note.isEmpty)
    info(s"+50-query worst case: ${line.length} of ${BenchFormat.MaxLineChars} chars, " +
      s"$kept of ${padded.size} entries on the line")
  }

  test("+500 queries: structural durability — fits and parses at any size") {
    val padded = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase)) ++
      (1 to 500).map(i => (f"q_future_$i%03d", worstCase))
    val (line, note) = BenchFormat.compactLine(
      padded, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= BenchFormat.MaxLineChars)
    assert(note.isDefined)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(line)
    assert(tree.get("queries").size + tree.get("q_omitted").asInt == padded.size)
  }

  test("keys are base-36 positions, reproducible by reader-side replay") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val keys = BenchFormat.compactKeys(names)
    assert(keys.distinct.size == keys.size)
    // the decode contract: a reader with the inventory (full names ship
    // in BENCH_DETAIL.json every run) sorts it and renders each index
    // in base 36 — no assignment algorithm to replay
    names.zipWithIndex.foreach { case (_, i) =>
      assert(keys(i) == java.lang.Long.toString(i.toLong, 36))
    }
    assert(BenchFormat.compactKeys(Seq("q_a", "q_b", "q_c")) == Seq("0", "1", "2"))
  }

  test("trim drops the fastest entries first and never drops failed markers") {
    // long names are irrelevant now (keys are positions); force a trim
    // with sheer count, with one slow query, one failed, many fast
    val many = Seq(("q_failed", -1.0), ("q_slowest", 99.9)) ++
      (1 to 400).map(i => (f"q_fast_$i%03d", 0.1))
    val sorted = many.sortBy(_._1)
    val (line, note) = BenchFormat.compactLine(sorted, 139.9, 1, "/sf")
    assert(note.isDefined)
    assert(line.length <= BenchFormat.MaxLineChars)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(line)
    assert(tree.get("q_omitted").asInt ==
      sorted.size - tree.get("queries").size)
    // the failed marker and the slow query survive under their
    // positional keys; trimmed entries are exclusively fast ones
    val failedKey = java.lang.Long.toString(
      sorted.indexWhere(_._1 == "q_failed").toLong, 36)
    val slowKey = java.lang.Long.toString(
      sorted.indexWhere(_._1 == "q_slowest").toLong, 36)
    assert(tree.get("queries").get(failedKey).asDouble == -1.0)
    // 99.9 renders "100" under the densified ≥10 s integer format
    assert(tree.get("queries").get(slowKey).asDouble == 100.0)
  }

  test("sfJson only emits valid JSON numbers, escaping everything else") {
    assert(BenchFormat.sfJson("/root/testdata/sf0.1") == "0.1")
    assert(BenchFormat.sfJson("/data/sf0.001/") == "0.001")
    // leading zero and double-dot would be invalid JSON numbers
    assert(BenchFormat.sfJson("/data/sf01") == "\"/data/sf01\"")
    assert(BenchFormat.sfJson("/data/sf1.2.3") == "\"/data/sf1.2.3\"")
    // non-matching fallback escapes JSON-hostile characters
    assert(BenchFormat.sfJson("""/we"ird\path""") == """"/we\"ird\\path"""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Seq("/data/sf01", """/we"ird\path""", "/root/testdata/sf0.1").foreach { d =>
      val json = s"""{"sf":${BenchFormat.sfJson(d)}}"""
      assert(mapper.readTree(json).has("sf"), s"unparseable: $json")
    }
  }

  test("compact values: 2-sig-fig widths, failed markers stay -1") {
    assert(BenchFormat.fCompact(0.32) == "0.3")
    assert(BenchFormat.fCompact(9.94) == "9.9")
    assert(BenchFormat.fCompact(12.34) == "12")
    assert(BenchFormat.fCompact(99.9) == "100")
    assert(BenchFormat.fCompact(239.9) == "240")
    assert(BenchFormat.fCompact(-1.0) == "-1")
    val (line, _) = BenchFormat.compactLine(
      Seq(("q_a", 1.5), ("q_b", -1.0)), total = -1.0, failed = 1, "/sf")
    assert(line.contains("\"1\":-1"))
    assert(line.contains("\"failed\":1"))
    assert(line.contains("\"value\":-1"))
    assert(line.contains("\"sf\":\"/sf\""))
  }

  test("detail file keeps full names and 3-decimal precision") {
    val detail = BenchFormat.detailJson(
      Seq(("q_tpch_q1", 1.5, Seq(2.0, 1.5))), 1.5, 0, 1.0, 1.0, "32", "/sf",
      Seq(("q_tpch_q1", (2097152L, 1048576L, 0L))))
    assert(detail.contains("\"q_tpch_q1\":1.500"))
    assert(detail.contains("\"shuffle_mb\":{\"q_tpch_q1\":[2.00,1.00,0.00]}"))
    assert(detail.contains("\"recovered\":[]"))
  }

  test("detail file names re-timed queries explicitly") {
    val detail = BenchFormat.detailJson(
      Seq(("q_a", 1.5, Seq(2.0, 1.5)), ("q_b", 1.8, Seq(1.9, 103.0, -1.0, 1.8))),
      3.3, 0, 1.0, 1.0, "32", "/sf", Nil, Seq("q_b"))
    assert(detail.contains("\"recovered\":[\"q_b\"]"))
  }

  // BenchSampling: the r17 artifact failure class. q_resample recorded
  // −1/failed:1 from samples [6.8 s cold, 103 s, timeout] even though
  // the query demonstrably ran — a failed timed iter with ANY valid
  // sibling must re-time and record min(valid), never fail the record.
  test("sampling: fail-then-succeed recovers to the re-timed min, not -1") {
    assert(BenchSampling.needsRetime(cold = 6.8, warm = Seq(103.0, -1.0), iters = 3))
    // after the re-time lands at 1.8 s the record is that sample
    assert(BenchSampling.record(6.8, Seq(103.0, -1.0, 1.8)) == 1.8)
    // re-time ALSO fails: min of the remaining valid samples
    assert(BenchSampling.record(6.8, Seq(103.0, -1.0, -1.0)) == 103.0)
    // every timed iter failed but the cold run succeeded: record cold
    // (an honest upper bound from a real successful run)
    assert(BenchSampling.record(6.8, Seq(-1.0, -1.0, -1.0)) == 6.8)
  }

  test("sampling: -1 only when NO iteration succeeded") {
    assert(BenchSampling.record(-1.0, Seq(-1.0, -1.0)) == -1.0)
    assert(!BenchSampling.needsRetime(-1.0, Seq(-1.0, -1.0), iters = 3))
  }

  // ADVICE r17 (medium): the intra-pair >3× rule never fires when BOTH
  // timed iters are stall-poisoned (they agree with each other) — the
  // cold iteration is the external reference that sees that case.
  test("sampling: both-slow vs the cold reference triggers a re-time") {
    assert(BenchSampling.needsRetime(cold = 1.0, warm = Seq(5.0, 5.2), iters = 3))
    // one-poisoned intra-pair burst still triggers
    assert(BenchSampling.needsRetime(cold = 1.0, warm = Seq(1.1, 40.0), iters = 3))
    // clean pair near the cold reference: no re-time
    assert(!BenchSampling.needsRetime(cold = 1.0, warm = Seq(0.8, 0.9), iters = 3))
    // warm faster than cold is the EXPECTED shape, however large the
    // gap (cold pays first-touch costs) — never a trigger
    assert(!BenchSampling.needsRetime(cold = 9.0, warm = Seq(0.5, 0.6), iters = 3))
    // single-iter mode: the one sample is all there is
    assert(!BenchSampling.needsRetime(cold = 5.0, warm = Seq(5.0), iters = 1))
  }
}
