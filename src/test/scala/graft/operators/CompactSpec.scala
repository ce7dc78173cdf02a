package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compacts a many-small-files directory, preserving every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate 20 micro-batch appends → ≥20 small files
    (0 until 20).foreach { i =>
      (i * 100 until (i + 1) * 100).map(j => (j.toLong, s"row$j"))
        .toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val before = Compact.fileCount(spark, dir)
    assert(before >= 20)
    val want = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    val bytes = Compact.dirBytes(spark, dir)
    // target half the directory per file → exactly 2 output files
    val (b, a) = Compact.parquetDir(spark, dir, targetBytes = bytes / 2 + 1)
    assert(b == before && a == 2, s"expected 2 files after compaction, got $a")
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == want)
  }

  test("trailing-slash path compacts safely (tmp dir is a sibling, never inside)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact2").toString + "/t"
    (0 until 4).foreach { i =>
      Seq((i.toLong, s"r$i")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val want = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    val (_, after) = Compact.parquetDir(spark, dir + "/", targetBytes = Long.MaxValue)
    assert(after == 1)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSet == want,
      "rows lost through the swap — the old in-place tmp bug")
  }

  test("versioned table: compaction commits a new version, rows preserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_v").toString + "/t"
    val rows = (0 until 1000).map(j => (j.toLong, s"row$j"))
    Compact.writeVersioned(rows.toDF("id", "s").repartition(20), dir)
    assert(Compact.read(spark, dir).count() == 1000)
    val (b, a) = Compact.parquetDirVersioned(spark, dir, targetBytes = Long.MaxValue)
    assert(b >= 20 && a == 1, s"expected 20+ -> 1 files, got $b -> $a")
    assert(Compact.read(spark, dir).as[(Long, String)].collect().toSet == rows.toSet)
    // the new version is resolved; the previous is still on disk for
    // in-flight readers (prune keeps 2)
    val v = Versioned.resolve(spark, dir).get
    assert(v.endsWith("_v=2"))
    assert(new java.io.File(dir + "/_v=1").exists())
  }

  test("partitioned layout: compaction preserves col=value dirs and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_p").toString + "/t"
    val rows = (0 until 2000).map(j => (j.toLong, s"row$j", j % 8))
    // many small files per partition — the layout an ingest loop leaves
    rows.toDF("id", "s", "cell").repartition(25)
      .write.partitionBy("cell").parquet(dir)
    assert(Compact.partitionColumns(spark, dir) == Seq("cell"))
    val (b, a) = Compact.parquetDir(spark, dir, targetBytes = Long.MaxValue)
    assert(a == 8, s"expected one file per partition, got $b -> $a")
    // the col=value dirs survived (a flat rewrite would fold `cell`
    // into the data files and kill scan-time pruning)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("cell=")))
    val back = spark.read.parquet(dir)
    assert(back.select("id", "s", "cell").as[(Long, String, Int)].collect().toSet
      == rows.toSet)
    // pruning still prunes: the scan carries a partition filter
    val scan = back.filter($"cell" === 3).queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cell"), scan)
    assert(back.filter($"cell" === 3).count() == 250)
  }

  test("a second writer fails fast on _LOCK; an expired lock is stolen") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lock").toString + "/t"
    val df = (0 until 10).map(j => (j.toLong, s"r$j")).toDF("id", "s")
    Compact.writeVersioned(df, dir)
    // a live writer's lock: the next mutation must fail fast, not
    // compute the same next version and mix files with it
    val lock = new java.io.File(s"$dir/_LOCK")
    assert(lock.createNewFile())
    val e = intercept[java.io.IOException] { Compact.writeVersioned(df, dir) }
    assert(e.getMessage.contains("locked"))
    // readers never look at the lock
    assert(Compact.read(spark, dir).count() == 10)
    // a lock past the TTL is presumed abandoned by a crashed writer
    assert(lock.setLastModified(
      System.currentTimeMillis() - Versioned.LockTtlMs - 60000))
    Compact.writeVersioned(df, dir)
    assert(Versioned.resolve(spark, dir).get.endsWith("_v=2"))
    // the steal cleaned up after itself
    assert(!lock.exists())
  }

  test("concurrent readers never observe a missing file across repeated compactions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_cc").toString + "/t"
    val rows = (0 until 2000).map(j => (j.toLong, s"row$j"))
    Compact.writeVersioned(rows.toDF("id", "s").repartition(16), dir)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val readers = (1 to 3).map { _ =>
      new Thread(() => {
        while (!stop.get()) {
          try {
            val n = Compact.read(spark, dir).count()
            if (n != 2000) failures.add(
              new IllegalStateException(s"reader saw $n rows"))
          } catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    readers.foreach(_.start())
    try {
      // alternating target sizes so every compaction genuinely
      // rewrites the layout (1 file <-> many files)
      (0 until 4).foreach { i =>
        val tgt = if (i % 2 == 0) Long.MaxValue else 4096L // 1 file <-> ~dozen
        Compact.parquetDirVersioned(spark, dir, targetBytes = tgt)
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }
    assert(failures.isEmpty,
      s"concurrent reader failed: ${Option(failures.peek()).map(_.toString)}")
    assert(Compact.read(spark, dir).count() == 2000)
  }

  test("single-file target floors at one output file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact1").toString + "/t"
    (1 to 5).foreach { _ =>
      Seq((1L, "x")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    }
    val (_, after) = Compact.parquetDir(spark, dir, targetBytes = Long.MaxValue)
    assert(after == 1)
    assert(spark.read.parquet(dir).count() == 5)
  }
}
