package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different content about distributed analytics engines at scale"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val res = Dedup.exact(docs, "text", "doc_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(res == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("shingles: k consecutive tokens, short docs fall back to whole text") {
    val sh = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).sorted == Seq("a b c", "b c d"))
    assert(sh(2L) == Seq("a b"))
  }

  test("shingleHashes matches shingle count and is duplicate-preserving") {
    val n = Dedup.shingleHashes(Seq((1L, "a b c d e")).toDF("id", "text"), "id", "text")
      .count()
    assert(n == 3) // "a b c", "b c d", "c d e"
    val short = Dedup.shingleHashes(Seq((1L, "a b")).toDF("id", "text"), "id", "text")
    assert(short.count() == 1)
  }

  test("minhash signature of identical docs is identical; est_jaccard = 1") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(cands((1L, 4L)) == 1.0)
    assert(cands.contains((1L, 2L))) // near-dup must be a candidate
    assert(cands((1L, 2L)) > 0.3 && cands((1L, 2L)) < 1.0)
    assert(!cands.contains((1L, 3L)) || cands((1L, 3L)) < 0.3)
  }

  test("ngram jaccard: exact dup = 1.0, near-dup in (0,1), computed exactly") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
    val j = Dedup.ngramJaccard(docs, cands, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 4L)) == 1.0)
    // docs 1,2 share 10 of their 11 shingle positions → |∩|=10, |∪|=12
    assert(math.abs(j((1L, 2L)) - 10.0 / 12.0) < 1e-9)
  }

  test("simhash: identical docs get identical hashes; hamming pairs found") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs((1L, 4L)) == 0L)
    assert(pairs.get((1L, 2L)).forall(_ <= 3L))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash banding preserves recall guarantee for maxHamming > 3") {
    // docs 1 and 2 differ slightly; whatever their hamming distance,
    // every pair within maxHamming must be found (pigeonhole over
    // maxHamming+1 bands)
    val pairs5 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7)
      .as[(Long, Long, Long)].collect().map { case (a, b, h) => (a, b) -> h }.toMap
    val pairs3 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect().map { case (a, b, h) => (a, b) -> h }.toMap
    // supersets: everything found at 3 must be found at 7
    assert(pairs3.keySet.subsetOf(pairs5.keySet))
    assert(pairs5((1L, 4L)) == 0L)
  }

  test("bucket cap drops degenerate buckets") {
    val boiler = (1L to 20L).map(i => (i, "same boilerplate text repeated everywhere ok"))
      .toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(boiler, "doc_id", "text", maxBucket = 5)
    assert(capped.count() == 0) // every bucket exceeds the cap → dropped
    val uncapped = Dedup.minhashCandidates(boiler, "doc_id", "text", maxBucket = 100)
    assert(uncapped.count() == 20L * 19L / 2)
  }
}
