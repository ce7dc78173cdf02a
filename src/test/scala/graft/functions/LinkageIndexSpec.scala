package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class LinkageIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def customers = graft.Tables.customer(spark, sf)
    .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
  private val blocks = Seq("c_nationkey", "c_mktsegment")

  private def inJob(df: org.apache.spark.sql.DataFrame) =
    graft.operators.EditDistanceJoin
      .selfJoin(df, "c_custkey", "c_name", blocks, maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet

  test("indexed pairs equal the in-job self-join exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_linkidx_eq").toString
    val vdir = LinkageIndex.writeIndex(
      customers, "c_custkey", "c_name", blocks, dir)
    val indexed = LinkageIndex.readPairs(spark, vdir)
      .as[(Long, Long, Int)].collect().toSet
    val direct = inJob(customers)
    assert(direct.nonEmpty, "test corpus produced no near pairs — threshold dead")
    assert(indexed == direct)
    // serving is a read: the plan must hold NO levenshtein and no
    // explode — the whole point of persisting the verified pair set
    val plan = LinkageIndex.readPairs(spark, vdir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("levenshtein") && !plan.contains("explode"),
      s"indexed serving re-derives linkage work:\n${plan.take(1500)}")
  }

  test("append ≡ rebuild; replay appends nothing; compaction folds equal") {
    val base = customers.filter(col("c_custkey") % 3 =!= 0)
    val batch = customers.filter(col("c_custkey") % 3 === 0)
    assert(base.count() > 0 && batch.count() > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_linkidx_app").toString
    val vdir = LinkageIndex.writeIndex(base, "c_custkey", "c_name", blocks, dir)

    val delta = LinkageIndex.appendIndex(batch, "c_custkey", "c_name", blocks, dir)
    assert(delta.isDefined, "a genuinely-new batch must commit a delta")
    val appended = LinkageIndex.readPairs(spark, vdir)
      .as[(Long, Long, Int)].collect().toSet
    val rebuilt = inJob(customers)
    assert(appended == rebuilt)
    // the delta must carry NEW-side pairs: the batch split above
    // guarantees some cross pairs (new-old) and the full equality just
    // proved covers new-new — also prove the append actually added rows
    val basePairs = spark.read.parquet(s"$vdir/pairs").count()
    assert(appended.size > basePairs,
      "append added no pairs — the batch split produced no cross pairs, weak test data")

    // all-duplicates replay: self-healing no-op
    assert(LinkageIndex.appendIndex(batch, "c_custkey", "c_name", blocks, dir).isEmpty)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)

    // compaction folds into a deltaless version serving the same set
    val cdir = LinkageIndex.compactIndex(spark, dir)
    assert(graft.operators.Versioned.listDeltas(spark, cdir).isEmpty)
    val compacted = LinkageIndex.readPairs(spark, cdir)
      .as[(Long, Long, Int)].collect().toSet
    assert(compacted == rebuilt)

    // append still works after compaction (the version pointer moved)
    assert(LinkageIndex.appendIndex(batch, "c_custkey", "c_name", blocks, dir).isEmpty)
  }

  test("block-arity mismatch on append fails fast instead of mis-keying") {
    val dir = java.nio.file.Files.createTempDirectory("graft_linkidx_meta").toString
    LinkageIndex.writeIndex(customers, "c_custkey", "c_name", blocks, dir)
    val e = intercept[IllegalArgumentException] {
      LinkageIndex.appendIndex(customers, "c_custkey", "c_name",
        Seq("c_nationkey"), dir)
    }
    assert(e.getMessage.contains("block columns"))
  }
}
