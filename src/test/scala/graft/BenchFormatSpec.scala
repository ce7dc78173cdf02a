package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout line must fit the consumer's 2000-char tail
  * window for the CURRENT query inventory — this is the regression
  * gate for "add a query, silently lose the per-query map" (or worse,
  * pre-guard: "add a query, the line truncates mid-JSON and the
  * artifact records parsed: null", which went unnoticed for five
  * rounds).
  */
class BenchFormatSpec extends AnyFunSuite {

  test("compact line fits the tail window for every current query at worst-case widths") {
    // worst plausible per-query width: hundreds of seconds each, tens
    // of GB of total shuffle
    val results = SparkEntry.queries.keys.toSeq.sorted.map(k => (k, 999.99))
    val (line, overflow) = BenchFormat.compactLine(
      results, total = 99999.999, failed = 0, sfDir = "/root/testdata/sf0.1",
      shuffleWriteBytes = 99999L * 1048576L)
    assert(overflow.isEmpty,
      s"query inventory outgrew the stdout budget (${line.length} chars): " +
        "shrink names or move more detail to BENCH_DETAIL.json")
    assert(line.length <= BenchFormat.MaxLineChars)
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"shuffle_mb\":99999"))
  }

  test("compact map drops the uniform q_ prefix; detail keeps full names") {
    val (line, _) = BenchFormat.compactLine(
      Seq(("q_tpch_q1", 1.5)), total = 1.5, failed = 0, "/sf")
    assert(line.contains("\"tpch_q1\":1.50") && !line.contains("\"q_tpch_q1\""))
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

  test("failed markers surface as -1 and never as a fast number") {
    val (line, _) = BenchFormat.compactLine(
      Seq(("q_a", 1.5), ("q_b", -1.0)), total = -1.0, failed = 1, "/sf")
    assert(line.contains("\"b\":-1"))
    assert(line.contains("\"failed\":1"))
    assert(line.contains("\"value\":-1"))
  }
}
