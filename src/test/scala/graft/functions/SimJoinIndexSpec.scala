package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class SimJoinIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, sf)

  /** The in-job q_simjoin result (the brute-force-oracled truth). */
  private def inJob(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
    val sh = Dedup.shingleHashes(d, "doc_id", "text", shingleK = 3)
      .dropDuplicates("id", "h")
    val sets = sh.groupBy("id")
      .agg(org.apache.spark.sql.functions.collect_set(col("h")).as("s"))
    import org.apache.spark.sql.functions._
    sets.select(col("id").as("id_a"), col("s").as("s_a"))
      .join(sets.select(col("id").as("id_b"), col("s").as("s_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("s_a"), col("s_b"))).cast("double") /
          size(array_union(col("s_a"), col("s_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
  }

  test("indexed pairs equal the brute-force truth exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sjidx_eq").toString
    val vdir = SimJoinIndex.writeIndex(docs, "doc_id", "text", dir)
    val indexed = SimJoinIndex.readPairs(spark, vdir)
      .as[(Long, Long, Double)].collect().toSet
    val truth = inJob(docs)
    assert(truth.nonEmpty, "test corpus produced no similar pairs — threshold dead")
    assert(indexed == truth)
    // serving is a read: no shingling, no window, no self-join recurs
    val plan = SimJoinIndex.readPairs(spark, vdir)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("xxhash64") && !plan.contains("window"),
      s"indexed serving re-derives simjoin work:\n${plan.take(1500)}")
  }

  test("append under the PINNED order ≡ rebuild; replay no-op; compaction re-pins") {
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    assert(base.count() > 0 && batch.count() > 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_sjidx_app").toString
    val vdir = SimJoinIndex.writeIndex(base, "doc_id", "text", dir)

    val delta = SimJoinIndex.appendIndex(batch, "doc_id", "text", dir)
    assert(delta.isDefined, "a genuinely-new batch must commit a delta")
    val appended = SimJoinIndex.readPairs(spark, vdir)
      .as[(Long, Long, Double)].collect().toSet
    val truth = inJob(docs)
    assert(appended == truth)
    // the append found genuinely NEW pairs (cross or in-batch), not
    // just replayed the base set
    val basePairs = spark.read.parquet(s"$vdir/pairs").count()
    assert(appended.size > basePairs,
      "append added no pairs — weak test split")
    // new-OLD pairs specifically: at least one appended pair must
    // straddle the split, or the probe-the-touched-postings path was
    // never exercised
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    val newPairs = appended.size - basePairs
    val straddling = spark.read.parquet(s"${delta.get}/pairs")
      .as[(Long, Long, Double)].collect()
      .count(p => baseIds.contains(p._1) ^ baseIds.contains(p._2))
    assert(straddling > 0,
      s"none of the $newPairs appended pairs crosses the base/batch split")

    // all-duplicates replay: self-healing no-op
    assert(SimJoinIndex.appendIndex(batch, "doc_id", "text", dir).isEmpty)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)

    // compaction folds deltaless, re-pins the order, serves the same set
    val cdir = SimJoinIndex.compactIndex(spark, dir)
    assert(graft.operators.Versioned.listDeltas(spark, cdir).isEmpty)
    val compacted = SimJoinIndex.readPairs(spark, cdir)
      .as[(Long, Long, Double)].collect().toSet
    assert(compacted == truth)
    // the re-pinned dfs covers the batch's shingles too (the base
    // build's dfs could not)
    val dfsBase = spark.read.parquet(s"$vdir/dfs").count()
    val dfsCompacted = spark.read.parquet(s"$cdir/dfs").count()
    assert(dfsCompacted >= dfsBase)
  }

  test("prefix postings are strictly smaller than the shingle table (the filter works)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sjidx_pf").toString
    val vdir = SimJoinIndex.writeIndex(docs, "doc_id", "text", dir)
    val nSh = spark.read.parquet(s"$vdir/shingles").count()
    val nPre = spark.read.parquet(s"$vdir/prefix").count()
    assert(nPre < nSh, s"prefix table ($nPre) not smaller than shingles ($nSh)")
    // the lemma's bound: per doc, exactly n - ceil(t*n) + 1 postings
    import org.apache.spark.sql.functions.{ceil, count, lit}
    val bad = spark.read.parquet(s"$vdir/prefix")
      .groupBy("id", "n")
      .agg(count(lit(1)).as("k"))
      .filter(col("k") =!= (col("n") - ceil(lit(0.5) * col("n")) + lit(1)))
      .count()
    assert(bad == 0, s"$bad docs expose a wrong prefix count")
  }

  test("simjoinIngest: channel-driven micro-batches + redelivery ≡ batch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sjidx_ing").toString
    SimJoinIndex.writeIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", s"$dir/index")
    val rows = docs.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val ch = graft.streaming.Streams.Channel[(Long, String)](spark)
    ch.send(b1: _*)
    val q = graft.streaming.Streams.simjoinIngest(
      ch.toDS.toDF("doc_id", "text"), s"$dir/index", s"$dir/out", s"$dir/ckpt")
    try {
      ch.send(b2: _*)
      q.processAllAvailable()
      val vdir = graft.operators.Versioned.resolve(spark, s"$dir/index").get
      val nDeltas = graft.operators.Versioned.listDeltas(spark, vdir).size
      val streamed = SimJoinIndex.readPairs(spark, vdir)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == inJob(docs),
        "streamed index diverges from the batch rebuild")
      // every delta pair has ≥1 fresh side, so delta pair sets are
      // disjoint from the base and from each other: the sink's union
      // is exactly the appended pairs
      val emitted = spark.read.parquet(s"$dir/out")
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val basePairs = spark.read.parquet(s"$vdir/pairs")
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(emitted == streamed -- basePairs,
        "sink partitions must union to exactly the appended pairs")
      assert(emitted.nonEmpty, "the stream found no new pairs — weak split")
      // source redelivery: every id indexed → no delta, no emission
      ch.send(b1: _*)
      q.processAllAvailable()
      assert(graft.operators.Versioned.listDeltas(spark, vdir).size == nDeltas,
        "redelivered batch must commit nothing")
      assert(spark.read.parquet(s"$dir/out")
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet == emitted)
    } finally q.stop()
  }
}
