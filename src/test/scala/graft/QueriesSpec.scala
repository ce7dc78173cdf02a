package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: the full Verify+DuckDB oracle run is the
  * real gate (tools/check.py); this spec guards the contract shape
  * plus a few end-to-end smokes at sf0.001.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("SURVEY §2 inventory is fully wired") {
    assert(SparkEntry.queries.size == 48)
    assert(SparkEntry.oracleSql.size == 40)
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries return rows at sf0.001") {
    Seq("q_tpch_q1", "q_dedup_minhash", "q_ann_bruteforce", "q_stream_window")
      .foreach { q =>
        assert(SparkEntry.queries(q)(spark, sf).count() > 0, s"$q returned 0 rows")
      }
  }
}
