package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("decontamOverlap: known-leak docs score their exact gram fraction") {
    // corpus doc 10 contains a verbatim 5-gram from the benchmark; doc
    // 11 shares nothing; doc 12 IS a benchmark doc verbatim (full leak)
    val bench = Seq(
      (1L, "the capital of france is paris and it is large"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "someone wrote the capital of france is paris yesterday evening ok"),
      (11L, "entirely unrelated words about distributed query engines at scale"),
      (12L, "the capital of france is paris and it is large"))
      .toDF("doc_id", "text")
    val got = Curation.decontamOverlap(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // doc 10: 7 distinct 5-grams, 3 of them benchmark grams
    // ("the capital of france is", "capital of france is paris" are in
    // the bench doc's gram set; count exactly below)
    val benchGrams = "the capital of france is paris and it is large"
      .split(" ").sliding(5).map(_.mkString(" ")).toSet
    def grams(t: String) = t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    def expect(id: Long, t: String) = {
      val g = grams(t); val hit = g.count(benchGrams)
      (id, g.size.toLong, hit.toLong, hit.toDouble / g.size)
    }
    assert(got == Seq(
      expect(10L, "someone wrote the capital of france is paris yesterday evening ok"),
      expect(11L, "entirely unrelated words about distributed query engines at scale"),
      expect(12L, "the capital of france is paris and it is large")))
    assert(got(2)._4 == 1.0) // verbatim benchmark doc: full leak
    assert(got(1)._3 == 0L)  // clean doc: zero hits
    assert(got(0)._3 > 0L)   // partial quote: nonzero
  }

  test("decontamOverlapGrams probes a persisted index identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dci").toString
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro alpha beta gamma delta epsilon outro words here"),
      (11L, "totally different content with no shared sequences at all"))
      .toDF("doc_id", "text")
    val vdir = Curation.writeDecontamIndex(bench, "doc_id", "text", 5, dir)
    val viaIndex = Curation.decontamOverlapGrams(
      corpus, Curation.readDecontamIndex(spark, vdir), "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val direct = Curation.decontamOverlap(corpus, bench, "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaIndex == direct)
    assert(viaIndex.exists(_._3 > 0))
  }

  test("appendDecontamIndex: append ≡ rebuild on the union, delta holds only new grams") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dcap").toString
    val suiteA = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val suiteB = Seq(
      (2L, "alpha beta gamma delta epsilon zeta"), // verbatim suite-A doc: zero new grams
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro alpha beta gamma delta epsilon outro words here"),
      (11L, "see one two three four five six seven end"),
      (12L, "totally different content with no shared sequences at all"))
      .toDF("doc_id", "text")

    val vdir = Curation.writeDecontamIndex(suiteA, "doc_id", "text", 5, dir)
    val delta = Curation.appendDecontamIndex(suiteB, "doc_id", "text", 5, dir)
    assert(delta.isDefined, "suite B brings new grams — a delta must commit")

    // the delta carries ONLY grams the index lacked: suite B's doc 2 is
    // a verbatim suite-A doc, so the delta is exactly doc 3's gram set
    val deltaRows = spark.read.parquet(s"${delta.get}/grams").count()
    val doc3Grams = "one two three four five six seven"
      .split(" ").sliding(5).size
    assert(deltaRows == doc3Grams,
      s"delta carries $deltaRows grams; want only doc 3's $doc3Grams new ones")

    // append ≡ rebuild: scoring via base+delta equals scoring via a
    // fresh full index over the union of the suites
    val viaAppend = Curation.decontamOverlapGrams(
      corpus, Curation.readDecontamIndex(spark, vdir), "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    val rebuiltDir = java.nio.file.Files.createTempDirectory("graft_dcrb").toString
    val rb = Curation.writeDecontamIndex(suiteA.unionByName(suiteB),
      "doc_id", "text", 5, rebuiltDir)
    val viaRebuild = Curation.decontamOverlapGrams(
      corpus, Curation.readDecontamIndex(spark, rb), "doc_id", "text", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(viaAppend == viaRebuild)
    assert(viaAppend.exists(r => r._1 == 11L && r._3 > 0),
      "doc 11 must hit suite B's grams through the appended delta")

    // idempotent: re-appending an already-indexed suite commits nothing
    assert(Curation.appendDecontamIndex(suiteB, "doc_id", "text", 5, dir).isEmpty)
    assert(graft.operators.Versioned.listDeltas(spark, vdir).size == 1)
  }

  test("chunk emits overlapping windows with a shorter tail") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Curation.chunk(df, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "a b c d"), (1L, 1L, "c d e f"), (1L, 2L, "e f g h"),
      (1L, 3L, "g h i j"), (1L, 4L, "i j"), // tail window, shorter
      (2L, 0L, "x y")))                      // empty doc 3: no chunks
  }

  test("chunk windows reassemble the document (zero overlap)") {
    val df = Seq((7L, (1 to 23).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val got = Curation.chunk(df, "doc_id", "text", chunkTokens = 5, overlap = 0)
      .as[(Long, Long, String)].collect().sortBy(_._2)
    assert(got.map(_._3).mkString(" ") == (1 to 23).map(i => s"t$i").mkString(" "))
  }

  test("packSequences lays documents end-to-end per shard") {
    // single shard, ctx 10: docs of 4,4,4 tokens → third doc straddles
    // the first sequence boundary (starts at offset 8, seq 0)
    val docs = Seq((0L, 4), (8L, 4), (16L, 4)).toDF("doc_id", "n_tokens")
    val got = Curation.packSequences(docs, "doc_id", "n_tokens", ctxLen = 10, shards = 1)
      .select("doc_id", "shard", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 0L, 0L), (8L, 0L, 0L, 4L), (16L, 0L, 0L, 8L)))
  }

  test("packSequences invariants on a corpus: offsets bounded, starts contiguous") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", TextAnalysis.nWords($"text").as("n_tokens"))
    val ctx = 128L
    val packed = Curation.packSequences(docs, "doc_id", "n_tokens", ctx, shards = 4)
      .join(docs, "doc_id")
      .select("doc_id", "shard", "seq_id", "seq_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(packed.nonEmpty)
    packed.foreach { case (id, _, seq, off, _) =>
      assert(seq >= 0 && off >= 0 && off < ctx, s"doc $id: seq=$seq off=$off")
    }
    // within a shard, consecutive docs start exactly where the
    // previous ended (continuous layout, straddling allowed)
    packed.groupBy(_._2).foreach { case (shard, ds) =>
      val byId = ds.sortBy(_._1)
      byId.sliding(2).foreach {
        case Array((_, _, s1, o1, t1), (id2, _, s2, o2, _)) =>
          val start1 = s1 * ctx + o1
          val start2 = s2 * ctx + o2
          assert(start2 == start1 + t1,
            s"shard $shard doc $id2: starts at $start2, expected ${start1 + t1}")
        case _ => ()
      }
    }
  }
}
