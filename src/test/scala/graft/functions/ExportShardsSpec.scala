package graft.functions

import graft.{SparkEntry, SparkTestSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** The exportShards WRITER face must be the q_export_shards plan made
  * durable: same manifest row-for-row, shards that round-trip the
  * input exactly, and within-shard rows laid down in shard order (the
  * position key `_h`) so a trainer can stream a shard file top to
  * bottom.
  */
class ExportShardsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    Curation.exportShards(
      Tables.documents(spark, sf).select("doc_id", "n_chars", "source"),
      "doc_id", "n_chars", dir)
    dir
  }

  test("written manifest is row-for-row the q_export_shards result") {
    val want = SparkEntry.queries("q_export_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val got = Curation.readShardManifest(spark, root)
      .select("shard", "n_docs", "n_chars", "first_doc", "last_doc")
      .orderBy("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length == 16)
    assert(got.toSeq == want.toSeq)
  }

  test("shards round-trip the input and agree with the manifest") {
    import org.apache.spark.sql.functions._
    val in = Tables.documents(spark, sf).select("doc_id", "n_chars")
    val back = Curation.readShards(spark, root)
    assert(back.count() == in.count())
    // every doc present exactly once, with its columns intact
    val diff = back.select("doc_id", "n_chars")
      .exceptAll(in).union(in.exceptAll(back.select("doc_id", "n_chars")))
    assert(diff.isEmpty, "shard round-trip changed rows")
    // the persisted shard assignment IS the declared function of the id
    val misplaced = back.filter(
      col("shard") =!= pmod(EngineNeutral.md5Long60(col("doc_id").cast("string")),
        lit(16L))).count()
    assert(misplaced == 0)
    // per-shard counts match the manifest
    val fromShards = back.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromManifest = Curation.readShardManifest(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromShards == fromManifest)
  }

  test("each shard is one file with rows in position-key order") {
    import org.apache.spark.sql.functions._
    val dir = graft.operators.Versioned.resolve(spark, root).get
    val shardDirs = new java.io.File(s"$dir/shards".stripPrefix("file:"))
      .listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 16)
    shardDirs.foreach { sd =>
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: ${files.length} files")
      // single tiny file → single read partition → collect() preserves
      // the file's physical row order
      val hs = spark.read.parquet(files.head.getPath)
        .select("_h").collect().map(_.getLong(0))
      assert(hs.sameElements(hs.sorted), s"${sd.getName} not in shard order")
    }
  }
}
