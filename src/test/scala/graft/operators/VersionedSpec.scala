package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The Versioned layout's mutation guarantees. The read-path behavior
  * (pointer resolution, fallback, reader safety across compaction) is
  * exercised end-to-end by CompactSpec/IvfSpec/PqSpec; this spec pins
  * the writer-side races directly.
  */
class VersionedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_versioned").toString

  private def fill(n: Long)(dir: String): Unit =
    spark.range(n).write.parquet(dir)

  test("commitDelta appends to the current version as an enumerable delta") {
    val root = newRoot()
    val v1 = Versioned.commitNew(spark, root)(fill(10))
    Versioned.commitDelta(spark, root, v1)(fill(5))
    val deltas = Versioned.listDeltas(spark, v1)
    assert(deltas.size == 1)
    assert(spark.read.parquet(deltas.head).count() == 5)
    assert(Versioned.resolve(spark, root).contains(v1))
  }

  test("commitDelta accepts a scheme-qualified path to the current version") {
    // callers that got versionDir from a FileStatus/listing hold the
    // file:/-qualified form while resolve() returns the unqualified
    // string — the superseded re-check must compare CANONICAL paths,
    // not raw Path equality, or the genuinely-current version is
    // spuriously rejected
    val root = newRoot()
    val v1 = Versioned.commitNew(spark, root)(fill(10))
    val qualified = "file:" + v1
    Versioned.commitDelta(spark, root, qualified)(fill(5))
    assert(Versioned.listDeltas(spark, v1).size == 1)
  }

  test("commitDelta refuses a version dir superseded while the append was prepared") {
    // the append-vs-compaction race the _LOCK exists for: a caller
    // resolves v1, a rebuild commits v2 (v1 stays on disk — prune
    // keeps it for concurrent readers and it still has _COMMITTED),
    // then the append lands. Without the under-lock re-resolve the
    // delta would be written into v1 and silently vanish from every
    // read through the pointer.
    val root = newRoot()
    val v1 = Versioned.commitNew(spark, root)(fill(10))
    val v2 = Versioned.commitNew(spark, root)(fill(20)) // rebuild/compaction
    assert(new java.io.File(v1).exists, "prune must keep the previous version")
    val e = intercept[java.io.IOException] {
      Versioned.commitDelta(spark, root, v1)(fill(5))
    }
    assert(e.getMessage.contains("superseded"))
    assert(Versioned.listDeltas(spark, v1).isEmpty, "no delta may land in the stale version")
    // the current version is unaffected and still appendable
    Versioned.commitDelta(spark, root, v2)(fill(5))
    assert(Versioned.listDeltas(spark, v2).size == 1)
  }

  test("commitDeltaIf: a false guard commits nothing; the guard is " +
    "re-evaluated under the lock, closing stale caller pre-checks") {
    val root = newRoot()
    val v1 = Versioned.commitNew(spark, root)(fill(10))
    // the check-then-act window: a caller tests its precondition (here:
    // "delta_1 absent") BEFORE committing, another writer's commit
    // lands in between. The by-name guard re-reads the truth under the
    // _LOCK, so the stale caller refuses instead of double-committing.
    val staleCheckPassed = Versioned.listDeltas(spark, v1).isEmpty
    assert(staleCheckPassed)
    Versioned.commitDelta(spark, root, v1)(fill(5)) // the interleaved writer
    var wrote = false
    val r = Versioned.commitDeltaIf(spark, root, v1)(
      Versioned.listDeltas(spark, v1).isEmpty) { dir => wrote = true; fill(5)(dir) }
    assert(r.isEmpty && !wrote, "false guard must skip the write entirely")
    assert(Versioned.listDeltas(spark, v1).size == 1,
      "exactly the interleaved writer's delta survives")
    // lock released on the guard-false path: a guarded-true commit works
    assert(Versioned.commitDeltaIf(spark, root, v1)(true)(fill(3)).nonEmpty)
    assert(Versioned.listDeltas(spark, v1).size == 2)
  }
}
