package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two well-separated clusters around e1 and e2
  private def vecs = (0L until 20L).map { i =>
    val base = if (i < 10) Array(1.0f, 0.05f * i, 0f, 0f) else Array(0f, 0.05f * (i - 10), 1.0f, 0f)
    (i, base)
  }.toDF("vec_id", "embedding")

  test("centroids are deterministic and unit-norm") {
    val c1 = Ivf.trainCentroids(vecs, "vec_id", "embedding", k = 2)
    val c2 = Ivf.trainCentroids(vecs, "vec_id", "embedding", k = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    c1.foreach { c => assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9) }
  }

  test("assignCells separates the two clusters") {
    val cents = Ivf.trainCentroids(vecs, "vec_id", "embedding", k = 2)
    val cells = Ivf.assignCells(vecs, "embedding", cents)
      .select("vec_id", "ivf_cell").as[(Long, Int)].collect().toMap
    val cluster1 = (0L until 10L).map(cells)
    val cluster2 = (10L until 20L).map(cells)
    assert(cluster1.toSet.size == 1)
    assert(cluster2.toSet.size == 1)
    assert(cluster1.head != cluster2.head)
  }

  test("ivfTopK recall@10 >= 0.95 vs brute force on a clustered corpus") {
    // the q_ann_ivf parameters (16 cells, nprobe=4, k=10) over a
    // deterministic clustered corpus (see AnnTestData for why not the
    // uniform-random sf embeddings) — the quantitative gate for a
    // rows-only query (cell assignment has no SQL oracle).
    // Deterministic centroids + data → exactly repeatable.
    val emb = AnnTestData.clustered(spark)
    val queries = emb.filter($"vec_id" < 20)
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 16)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val approx = pairs(Ivf.ivfTopK(emb, queries, k = 10, cents, nprobe = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.95, f"IVF recall@10 degraded: $recall%.3f < 0.95")
  }

  test("ivfTopK finds same-cluster neighbors first") {
    val cents = Ivf.trainCentroids(vecs, "vec_id", "embedding", k = 2)
    val res = Ivf.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), k = 5, cents, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect()
    assert(res.nonEmpty)
    // with nprobe=1 every neighbor comes from query 0's own cluster
    assert(res.forall(_._3 < 10L))
    // ranks ordered by sim desc
    val sims = res.sortBy(_._2).map(_._4)
    assert(sims.sorted.reverse.toSeq == sims.toSeq)
  }

  test("index round-trip: persisted centroids identical, indexed recall holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val emb = AnnTestData.clustered(spark)
    val queries = emb.filter($"vec_id" < 20)
    val cents = Ivf.trainCentroids(emb, "vec_id", "embedding", k = 16)
    Ivf.writeIndex(emb, dir, cents)
    // centroids survive the round-trip bit-exactly
    val reloaded = Ivf.readCentroids(spark, dir)
    assert(reloaded.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq)
    // cells layout is partitioned by cell id (probe-side pruning),
    // inside a committed Versioned dir
    val vdir = graft.operators.Versioned.resolve(spark, dir).get
    assert(new java.io.File(s"$vdir/cells").listFiles()
      .exists(_.getName.startsWith("ivf_cell=")))
    assert(new java.io.File(s"$vdir/_COMMITTED").exists())
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 10))
    val indexed = pairs(Ivf.ivfTopKIndexed(spark, dir, queries, k = 10, nprobe = 4))
    val recall = (exact & indexed).size.toDouble / exact.size
    assert(recall >= 0.95, f"indexed IVF recall@10 degraded: $recall%.3f < 0.95")
    // and the indexed path agrees with the train-and-query path
    val direct = pairs(Ivf.ivfTopK(emb, queries, k = 10, cents, nprobe = 4))
    assert(indexed == direct)
  }

  test("appendToIndex grows the index; replayed batches are idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    val emb = AnnTestData.clustered(spark)
    val base = emb.filter($"vec_id" < 1500)
    val batch = emb.filter($"vec_id" >= 1500)
    val cents = Ivf.trainCentroids(base, "vec_id", "embedding", k = 16)
    Ivf.writeIndex(base, dir, cents)
    Ivf.appendToIndex(batch, dir)
    // the append landed as a delta INSIDE the version — O(batch), no
    // base rewrite, no new version
    val vdir = graft.operators.Versioned.resolve(spark, dir).get
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)
    assert(new java.io.File(vdir).getName == "_v=1",
      "append must not commit a new version (that would be a full rewrite)")
    // appended index answers exactly like one built from the union
    // with the SAME centroids (quantizer does not move on append)
    val queries = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    Ivf.writeIndex(emb, full, cents)
    val expected = pairs(Ivf.ivfTopKIndexed(spark, full, queries, k = 10, nprobe = 4))
    assert(pairs(Ivf.ivfTopKIndexed(spark, dir, queries, k = 10, nprobe = 4)) == expected)
    // a replayed micro-batch (at-least-once delivery) changes nothing:
    // no rows added, and an all-duplicate batch commits no delta at all
    def cellRows() = Ivf.readCellsFrom(spark,
      graft.operators.Versioned.resolve(spark, dir).get).count()
    val rows = cellRows()
    Ivf.appendToIndex(batch, dir)
    assert(cellRows() == rows && rows == 2000)
    assert(graft.operators.Versioned.listDeltas(spark,
      graft.operators.Versioned.resolve(spark, dir).get).size == 1)
    // compaction folds the delta into a single-base NEW version and
    // answers stay identical
    Ivf.compactIndex(spark, dir)
    val cdir = graft.operators.Versioned.resolve(spark, dir).get
    assert(graft.operators.Versioned.listDeltas(spark, cdir).isEmpty)
    assert(cellRows() == 2000)
    assert(pairs(Ivf.ivfTopKIndexed(spark, dir, queries, k = 10, nprobe = 4)) == expected)
  }

  test("retrainIndex re-clusters the grown index; probes equal a fresh rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_rt").toString
    val emb = AnnTestData.clustered(spark)
    val base = emb.filter($"vec_id" < 1500)
    val batch = emb.filter($"vec_id" >= 1500)
    Ivf.writeIndex(base, dir, Ivf.trainCentroids(base, "vec_id", "embedding", k = 8))
    Ivf.appendToIndex(batch, dir)
    val oldV = graft.operators.Versioned.resolve(spark, dir).get
    // retrain with MORE cells (the index grew) — new deltaless version
    val newV = Ivf.retrainIndex(spark, dir, k = 16)
    assert(newV != oldV)
    assert(graft.operators.Versioned.resolve(spark, dir).contains(newV))
    assert(graft.operators.Versioned.listDeltas(spark, newV).isEmpty)
    assert(Ivf.readCellsFrom(spark, newV).count() == 2000)
    val newCents = Ivf.readCentroids(spark, dir)
    assert(newCents.length == 16)
    // equality with a fresh writeIndex over the SAME input rows the
    // retrain consumed (the OLD version's stored vectors — newV's are
    // re-normalized once more, last-bit different): identical inputs
    // → deterministic trainCentroids → identical centroids,
    // assignments, and probe answers
    val stored = Ivf.readCellsFrom(spark, oldV)
      .select($"neighbor_id".as("vec_id"), $"cvec".as("embedding"))
    val rebuild = java.nio.file.Files.createTempDirectory("graft_ivf_rt2").toString
    Ivf.writeIndex(stored,
      rebuild, Ivf.trainCentroids(stored, "vec_id", "embedding", k = 16))
    assert(Ivf.readCentroids(spark, rebuild).map(_.toSeq).toSeq ==
      newCents.map(_.toSeq).toSeq)
    val queries = emb.filter($"vec_id" < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val got = pairs(Ivf.ivfTopKIndexed(spark, dir, queries, k = 10, nprobe = 4))
    assert(got == pairs(Ivf.ivfTopKIndexed(spark, rebuild, queries, k = 10, nprobe = 4)))
    assert(got.nonEmpty)
    // the superseded version stays intact on disk — readers that
    // resolved it mid-retrain finish against complete data
    assert(Ivf.readCellsFrom(spark, oldV).count() == 2000)
    assert(new java.io.File(s"$oldV/_COMMITTED").exists())
    // appends keep working against the retrained quantizer
    Ivf.appendToIndex(emb.limit(10), dir) // all duplicates: no delta
    assert(graft.operators.Versioned.listDeltas(spark, newV).isEmpty)
  }

  test("append shuffle volume is batch-proportional, independent of index size") {
    // the O(batch) claim as a failing test: the same 100-row batch
    // appended to a 4×-bigger index must not shuffle 4× the bytes —
    // the index side of the dedup join is a column-pruned scan that
    // never enters an exchange. The old unionByName+dropDuplicates
    // implementation rewrote (and shuffled) the whole cells table and
    // fails this by construction.
    val emb = AnnTestData.clustered(spark)
    val batch = emb.filter($"vec_id" >= 1900) // 100 rows
    def appendShuffle(baseN: Int): Long = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_ivf_sh$baseN").toString
      val base = emb.filter($"vec_id" < baseN)
      val cents = Ivf.trainCentroids(base, "vec_id", "embedding", k = 16)
      Ivf.writeIndex(base, dir, cents)
      val l = new graft.Bench.TaskTotals
      spark.sparkContext.addSparkListener(l)
      try Ivf.appendToIndex(batch, dir)
      finally {
        org.apache.spark.sql.graftbridge.Bridge.drainListeners(spark.sparkContext)
        spark.sparkContext.removeSparkListener(l)
      }
      l.shuffleWrite.get
    }
    val small = appendShuffle(400)
    val large = appendShuffle(1600)
    assert(large <= small * 2 + 64 * 1024,
      s"append to 4x index shuffled $large B vs $small B on the small one: " +
        "append cost is tracking index size, not batch size")
  }
}
