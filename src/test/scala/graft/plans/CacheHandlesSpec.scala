package graft.plans

import graft.SparkTestSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

class CacheHandlesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("track/release: targeted prefix release unpersists exactly its family") {
    CacheHandles.releaseAll() // isolate from other suites
    val a = CacheHandles.track("famA.one",
      Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_ONLY))
    val b = CacheHandles.track("famB.two",
      Seq(4, 5).toDF("y").persist(StorageLevel.MEMORY_ONLY))
    a.count(); b.count()
    assert(CacheHandles.liveLabels.toSet == Set("famA.one", "famB.two"))
    assert(CacheHandles.release("famA") == 1)
    assert(a.storageLevel == StorageLevel.NONE, "famA must be unpersisted")
    assert(b.storageLevel == StorageLevel.MEMORY_ONLY, "famB must survive")
    assert(CacheHandles.liveLabels == Seq("famB.two"))
    assert(CacheHandles.releaseAll() == 1)
    assert(b.storageLevel == StorageLevel.NONE)
    assert(CacheHandles.liveLabels.isEmpty)
  }

  test("the lazy-persist operator family registers and releases its blocks") {
    import org.apache.spark.sql.functions._
    CacheHandles.releaseAll()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about something else entirely")
    ).toDF("doc_id", "text")
    // minhash: lazy-return persist of the signature table
    graft.functions.Dedup.minhashCandidates(docs, "doc_id", "text").count()
    // ngram jaccard: lazy-return persist of the shingle-set aggregate
    val cands = Seq((1L, 2L)).toDF("id_a", "id_b")
    graft.functions.Dedup.ngramJaccard(docs, cands, "doc_id", "text").count()
    // selection model: lazy-return persist of the counts aggregate
    val (lr, defs) = graft.functions.Selection.tokenLogRatios(
      docs, "text", col("doc_id") === 1L)
    graft.functions.Selection
      .scoreAgainst(docs.filter(col("doc_id") =!= 1L), "doc_id", "text", lr, defs)
      .count()
    val labels = CacheHandles.liveLabels
    assert(labels.contains("dedup.minhash.sigs"), labels.toString)
    assert(labels.contains("dedup.ngramJaccard.shingleSets"), labels.toString)
    assert(labels.contains("selection.tokenCounts"), labels.toString)
    // deterministic release, idempotent on repeat
    assert(CacheHandles.releaseAll() >= 3)
    assert(CacheHandles.releaseAll() == 0)
  }
}
