package graft.functions

import graft.{SparkEntry, SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted MinHash index must be the q_dedup_minhash plan split
  * at the corpus/batch boundary: same signatures, same buckets, same
  * est_jaccard — so its candidate set restricted to (even, odd) pairs
  * must EQUAL the self-join query's, appends must serve identically
  * to a from-scratch rebuild, and compaction must be invisible to
  * serving.
  */
class MinhashIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  private def candSet(vdir: String) =
    MinhashIndex.candidates(spark, vdir,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 0.5)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet

  test("indexed batch-vs-corpus candidates equal the self-join across the parity cut") {
    val root = java.nio.file.Files.createTempDirectory("graft-mh").toString
    val vdir = MinhashIndex.writeIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", root)
    val got = candSet(vdir)
    // the oracled self-join result, reoriented to (even, odd): every
    // mixed-parity pair it reports must come back through the index,
    // with the identical est_jaccard
    val want = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 2) != (b % 2) }
      .map { case (a, b, j) => if (a % 2 == 0) (a, b, j) else (b, a, j) }
      .toSet
    assert(got.nonEmpty, "parity cut produced no cross pairs — weak corpus")
    assert(got == want,
      s"indexed candidates diverge from the self-join cut: " +
        s"extra=${got -- want}, missing=${want -- got}")
  }

  test("append serves identically to a from-scratch rebuild; compaction is invisible") {
    val rootA = java.nio.file.Files.createTempDirectory("graft-mh-a").toString
    val vA = MinhashIndex.writeIndex(
      docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", rootA)
    MinhashIndex.appendIndex(spark, rootA, vA,
      docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
    assert(graft.operators.Versioned.listDeltas(spark, vA).size == 1)
    val appended = candSet(vA)

    val rootB = java.nio.file.Files.createTempDirectory("graft-mh-b").toString
    val vB = MinhashIndex.writeIndex(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", rootB)
    assert(appended == candSet(vB),
      "append-then-serve diverged from a from-scratch index")

    // re-appending already-indexed docs is a no-op delta-wise
    MinhashIndex.appendIndex(spark, rootA, vA,
      docs.filter(col("doc_id") % 4 === 2), "doc_id", "text")
    assert(graft.operators.Versioned.listDeltas(spark, vA).size == 1,
      "re-append of known ids must not create a delta")

    val vC = MinhashIndex.compactIndex(spark, rootA)
    assert(graft.operators.Versioned.listDeltas(spark, vC).isEmpty)
    assert(candSet(vC) == appended, "compaction changed the served result")

    // the maintenance fleet recognizes the layout and folds it
    val status = IndexMaintenance.report(spark, Seq(rootA))
    assert(status.nonEmpty && status.head.family == "minhash",
      s"fleet detection failed: $status")
  }
}
