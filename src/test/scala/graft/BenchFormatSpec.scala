package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line must fit the consumer's 2000-char tail
  * window for the CURRENT query inventory — this is the regression
  * gate for "add a query, silently lose the per-query map" (or worse,
  * pre-guard: "add a query, the line truncates mid-JSON and the
  * artifact records parsed: null", which went unnoticed for five
  * rounds). Worst-case per-query value is pinned at 240 s — the
  * bench's own per-query timeout ceiling, so no real run can print a
  * wider number.
  */
class BenchFormatSpec extends AnyFunSuite {

  private val worstCase = 240.0

  test("compact line fits the tail window for every current query at worst-case widths") {
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase))
    val (line, overflow) = BenchFormat.compactLine(
      results, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    assert(overflow.isEmpty,
      s"query inventory outgrew the stdout budget (${line.length} chars): " +
        "shrink names or move more detail to BENCH_DETAIL.json")
    assert(line.length <= BenchFormat.MaxLineChars)
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

  test("15 more queries still carry a per-query map (headroom gate)") {
    val padded = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, worstCase)) ++
      (1 to 15).map(i => (f"q_future_$i%02d", worstCase))
    val (line, overflow) = BenchFormat.compactLine(
      padded, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    assert(overflow.isEmpty && line.length <= BenchFormat.MaxLineChars,
      s"at +15 queries the line is ${line.length} chars: " +
        "shrink the compact format before adding the next query wave")
    assert(!line.contains("\"queries\":{}"))
    info(s"headroom: +15-query worst-case line is ${line.length} of ${BenchFormat.MaxLineChars} chars")
  }

  test("current inventory emits collision-free, decodable segment keys") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val keys = BenchFormat.compactKeys(names)
    assert(keys.distinct.size == keys.size)
    // decodability: some split of the key yields a prefix of the
    // name's family and a prefix of its rest AFTER the family's
    // common rest prefix (recomputable from the inventory — round 14
    // strips it: tpch_q15 → tp15). A reader can match keys back to
    // inventory names with the inventory in hand (full names stay in
    // BENCH_DETAIL.json).
    val split = names.map { n =>
      val s = n.stripPrefix("q_")
      s.indexOf('_') match {
        case -1 => (s, ""); case i => (s.substring(0, i), s.substring(i + 1))
      }
    }
    val commonLen: Map[String, Int] = split.groupBy(_._1).map { case (f, g) =>
      val rests = g.map(_._2).filter(_.nonEmpty)
      val len =
        if (rests.size < 2) 0
        else {
          val sh = rests.minBy(_.length)
          val lcp = (0 until sh.length)
            .takeWhile(i => rests.forall(_.charAt(i) == sh.charAt(i))).size
          math.min(lcp, rests.map(_.length).min - 1)
        }
      f -> len
    }
    names.zip(keys).foreach { case (n, k) =>
      val s = n.stripPrefix("q_")
      val (sf, sr) = s.indexOf('_') match {
        case -1 => (s, ""); case i => (s.substring(0, i), s.substring(i + 1))
      }
      val srs = sr.drop(commonLen(sf))
      val decodes = (0 to k.length).exists { i =>
        val (kf, kr0) = (k.substring(0, i), k.substring(i))
        val kr = kr0.stripPrefix("_")
        sf.startsWith(kf) && (sr.startsWith(kr) || srs.startsWith(kr))
      } || s.startsWith(k) // full-name fallback
      assert(decodes, s"$k does not decode to $s")
    }
  }

  test("family rests extend past shared prefixes instead of colliding") {
    // round-14 scheme: the family-common rest prefix ("prefix_")
    // strips first, then shortest-free-prefix assignment — the first
    // sibling claims the 1-char form, the second stops one char past
    // the collision, distinctness preserved by construction
    val keys = BenchFormat.compactKeys(
      Seq("q_same_prefix_aa", "q_same_prefix_bb", "q_other"))
    assert(keys == Seq("s", "sb", "o"))
    assert(keys.distinct.size == keys.size)
  }

  test("a family name that is also a standalone query stays unique") {
    // 'distinct' alone abbreviates to the family key; 'distinct_count'
    // concatenates the rest — distinct strings by the collision check
    val keys = BenchFormat.compactKeys(Seq("q_distinct", "q_distinct_count"))
    assert(keys == Seq("d", "dc"))
    assert(keys.distinct.size == 2)
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
    assert(BenchFormat.fCompact(12.34) == "12.3")
    assert(BenchFormat.fCompact(239.9) == "240")
    assert(BenchFormat.fCompact(-1.0) == "-1")
    val (line, _) = BenchFormat.compactLine(
      Seq(("q_a", 1.5), ("q_b", -1.0)), total = -1.0, failed = 1, "/sf")
    assert(line.contains("\"b\":-1"))
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
  }

  test("overflow degrades to an empty map that still parses, with a warning") {
    val many = (1 to 400).map(i => (f"q_synthetic_query_name_$i%03d", 1.0))
    val (line, overflow) = BenchFormat.compactLine(many, 400.0, 0, "/sf")
    assert(overflow.isDefined)
    assert(line.contains("\"queries\":{}"))
    assert(line.length <= BenchFormat.MaxLineChars)
  }
}
