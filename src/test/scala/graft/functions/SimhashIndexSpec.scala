package graft.functions

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted SimHash index must be the q_dedup_simhash plan split
  * at the corpus/batch boundary: same 60-bit simhashes, same
  * pigeonhole buckets, same hamming distances — so its candidate set
  * restricted to (even, odd) pairs must CONTAIN every mixed-parity
  * pair the self-join reports (the bipartite cap has no lower bound,
  * so it can only find MORE: a singleton corpus bucket still matches
  * a batch doc), appends must serve identically to a from-scratch
  * rebuild, and compaction must be invisible to serving.
  */
class SimhashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private def candSet(vdir: String) =
    SimhashIndex.candidates(spark, vdir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet

  test("indexed batch-vs-corpus candidates cover the self-join across the parity cut, same hammings") {
    val root = java.nio.file.Files.createTempDirectory("graft-sh").toString
    val vdir = SimhashIndex.writeIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", root)
    val got = candSet(vdir)
    // the oracled self-join result, reoriented to (even, odd): the
    // self-join's bucket filter is BETWEEN 2 AND 1000 while the
    // bipartite corpus cap is ≤ 1000 with no floor, so the index may
    // report extra pairs (from size-1 corpus buckets) but must never
    // miss one, and every shared pair carries the identical hamming
    val want = SparkEntry.queries("q_dedup_simhash")(spark, sf)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, h) => if (a % 2 == 0) (a, b, h) else (b, a, h) }
      .toSet
    assert(got.nonEmpty, "parity cut produced no cross pairs — weak corpus")
    assert((want -- got).isEmpty,
      s"indexed candidates MISS self-join pairs: ${want -- got}")
    // every extra pair must verify: hamming really ≤ MaxHamming on
    // the true simhashes (recompute independently)
    val sh = Dedup.simhashes(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    (got -- want).foreach { case (a, b, h) =>
      val d = java.lang.Long.bitCount(sh(a) ^ sh(b))
      assert(d == h && d <= SimhashIndex.MaxHamming,
        s"extra pair ($a,$b) claims hamming $h, truth $d")
    }
  }

  test("append serves identically to a from-scratch rebuild; compaction is invisible") {
    val rootA = java.nio.file.Files.createTempDirectory("graft-sh-a").toString
    val vA = SimhashIndex.writeIndex(
      docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", rootA)
    SimhashIndex.appendIndex(spark, rootA, vA,
      docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
    assert(graft.operators.Versioned.listDeltas(spark, vA).size == 1)
    val appended = candSet(vA)

    val rootB = java.nio.file.Files.createTempDirectory("graft-sh-b").toString
    val vB = SimhashIndex.writeIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", rootB)
    assert(appended == candSet(vB),
      "append-then-serve diverged from a from-scratch index")

    // re-appending already-indexed docs is a no-op delta-wise
    SimhashIndex.appendIndex(spark, rootA, vA,
      docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
    assert(graft.operators.Versioned.listDeltas(spark, vA).size == 1,
      "re-append of known ids must not create a delta")

    val vC = SimhashIndex.compactIndex(spark, rootA)
    assert(graft.operators.Versioned.listDeltas(spark, vC).isEmpty)
    assert(candSet(vC) == appended, "compaction changed the served result")

    // the maintenance fleet recognizes the layout and folds it
    val status = IndexMaintenance.report(spark, Seq(rootA))
    assert(status.nonEmpty && status.head.family == "simhash",
      s"fleet detection failed: $status")
  }
}
