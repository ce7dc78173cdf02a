package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Asserted shuffle ceilings — the test form of "shuffle bytes scale
  * with rows × key-width, not corpus bytes". Wall time on a 32-core
  * box cannot catch a 100 TB shuffle regression (a query that starts
  * carrying document text through its exchange is still fast at
  * sf0.01); measured shuffle volume can, and this pins it.
  */
class ShuffleBoundSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  /** Total shuffle write bytes while running `df` through the noop
    * writer (same measurement as Bench's per-query recording).
    */
  private def shuffleWrite(df: org.apache.spark.sql.DataFrame): Long = {
    val l = new Bench.TaskTotals
    spark.sparkContext.addSparkListener(l)
    try df.write.mode("overwrite").format("noop").save()
    finally {
      org.apache.spark.sql.graftbridge.Bridge.drainListeners(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
    }
    l.shuffleWrite.get
  }

  test("q_dedup_exact shuffles key-width rows, never document bytes") {
    val docs = Tables.documents(spark, sf)
    val rows = docs.count()
    val corpusBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
    // warm once so AQE/codegen first-touch doesn't pollute, then measure
    SparkEntry.queries("q_dedup_exact")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val bytes = shuffleWrite(SparkEntry.queries("q_dedup_exact")(spark, sf))
    // two exchanges (hash agg + output sort) of fixed-width rows:
    // 32-char md5 + two longs + compressed-block overhead — 200 B/row
    // is generous, and at this SF it is also well under the raw text
    // volume, which is the actual claim (key-width, not payload-width;
    // at 100 TB corpusBytes/rows·400 diverge by orders of magnitude,
    // here by ~2×, so both asserts stay meaningful)
    val ceiling = rows * 200
    assert(bytes > 0, "expected a hash shuffle — plan shape changed?")
    assert(bytes <= ceiling,
      s"q_dedup_exact shuffled $bytes B for $rows rows (> $ceiling): " +
        "an exchange is carrying payload it should have projected away")
    assert(corpusBytes > ceiling,
      s"corpus too small for the ceiling to mean anything ($corpusBytes B)")
  }

  test("q_snapshot_diff shuffles (id, hash) rows, never crawl text") {
    val docs = Tables.documents(spark, sf)
    val rows = docs.count()
    val corpusBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
    SparkEntry.queries("q_snapshot_diff")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val bytes = shuffleWrite(SparkEntry.queries("q_snapshot_diff")(spark, sf))
    // both snapshot sides + the full-outer join + the final (status,
    // count) partial agg move (long id, 32-char hex) rows — 200 B per
    // doc across ALL exchanges is generous, and the text volume the
    // diff must NOT carry already exceeds it at this SF (at two
    // 100 TB crawls they diverge by orders of magnitude)
    val ceiling = rows * 200
    assert(bytes > 0, "expected shuffles — plan shape changed?")
    assert(bytes <= ceiling,
      s"q_snapshot_diff shuffled $bytes B for $rows docs (> $ceiling): " +
        "an exchange is carrying crawl text instead of content hashes")
    assert(corpusBytes > ceiling,
      s"corpus too small for the ceiling to bind ($corpusBytes B)")
  }

  test("q_tpch_q1 shuffles the pruned spread rows plus aggregate partials") {
    val rows = Tables.lineitem(spark, sf).count()
    SparkEntry.queries("q_tpch_q1")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val bytes = shuffleWrite(SparkEntry.queries("q_tpch_q1")(spark, sf))
    // round 19: the query spreads the filtered scan (the q_map /
    // q_lm_score single-row-group convention — the serial decimal
    // aggregate was the whole 1.35 s wall), so the expected shuffle is
    // now the round-robin exchange of the SIX pruned columns (~15 B/row
    // snappy, measured 0.9 MB at sf0.01) plus KB-scale aggregate
    // partials. The ceiling still binds against both regressions this
    // pin exists for: an unpruned spread (16 lineitem columns ≈
    // ≥ 40 B/row) or a broken map-side combine (input-row-count agg
    // rows at ~50 B each) lands well above rows × 25.
    assert(bytes > 0 && bytes < rows * 25,
      s"q_tpch_q1 shuffled $bytes B for $rows rows — unpruned spread " +
        "or map-side combine regression?")
  }

  test("q_tpch_q2 shuffle stays key-width after the pushed part filter") {
    val rows = Tables.lineitem(spark, sf).count()
    SparkEntry.queries("q_tpch_q2")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val bytes = shuffleWrite(SparkEntry.queries("q_tpch_q2")(spark, sf))
    // the (partkey, suppkey, unit_cost) aggregates of the ~22% of
    // lineitem surviving the semi-join: measured 0.4 MB at sf0.01;
    // 3× headroom. Near rows×30 would mean the part filter stopped
    // pruning below the aggregation (21 MB at sf0.1 before the fix).
    assert(bytes > 0 && bytes <= rows * 22,
      s"q_tpch_q2 shuffled $bytes B for $rows input rows: " +
        "the pushed-down part filter or map-side combine regressed")
  }

  test("q_lm_score shuffles token partials, never the exploded corpus") {
    val docs = Tables.documents(spark, sf)
    val corpusBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
    SparkEntry.queries("q_lm_score")(spark, sf)
      .write.mode("overwrite").format("noop").save()
    val bytes = shuffleWrite(SparkEntry.queries("q_lm_score")(spark, sf))
    // what SHOULD move: the round-robin spread of compact document
    // rows (≈ corpus bytes, twice — vocab + scoring branch) plus tiny
    // vocab/per-doc partials; measured 1.3× corpus at sf0.01. A hash
    // exchange carrying the exploded (doc_id, token) rows would add
    // ≥ another corpus-worth on top — 3× is the tripwire.
    assert(bytes > 0 && bytes < corpusBytes * 3,
      s"q_lm_score shuffled $bytes B (corpus $corpusBytes B): " +
        "an exchange is carrying the exploded token rows")
  }
}
