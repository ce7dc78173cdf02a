package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed oracle for BPE merge learning (the q_bpe_merges
  * rows-only gate), on the classic low/lower/newest corpus family —
  * small enough that every pair count is checkable by hand.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train learns the hand-computed merges on a known dictionary") {
    // dictionary: low×5, lower×2 — symbol sequences
    //   l o w </w>          ×5
    //   l o w e r </w>      ×2
    // pair counts: (l,o)=7 (o,w)=7 (w,</w>)=5 (w,e)=2 (e,r)=2 (r,</w>)=2
    // merge 1: tie (l,o) vs (o,w) at 7 → lexicographic → (l,o)
    // after: lo w </w> ×5, lo w e r </w> ×2 → (lo,w)=7 wins
    // after: low </w> ×5, low e r </w> ×2 → (low,</w>)=5 wins
    val merges = Bpe.train(Seq("low" -> 5L, "lower" -> 2L), nMerges = 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "low", Bpe.Eow, 5L)))
  }

  test("train stops early when every word is a single symbol") {
    val merges = Bpe.train(Seq("ab" -> 3L), nMerges = 10)
    // a b </w> → merge (a,b) [3] → ab </w> → merge (ab,</w>) [3] → done
    assert(merges.length == 2)
    assert(merges.last.left == "ab" && merges.last.right == Bpe.Eow)
  }

  test("mergeOnce is leftmost-first and non-overlapping") {
    // aaa with merge (a,a): leftmost pair merges, third a survives
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
  }

  test("segmentWith applies learned merges as the driver loop would") {
    val merges = Bpe.train(Seq("low" -> 5L, "lower" -> 2L), nMerges = 3)
    val df = Seq("low", "lower", "slow").toDF("tok")
      .select(col("tok"), Bpe.segmentWith(merges)(col("tok")).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(df("low") == Seq("low</w>"))
    assert(df("lower") == Seq("low", "e", "r", Bpe.Eow))
    // 'slow' shares the suffix: s + low… but merges applied in rank
    // order over the char sequence s l o w </w>:
    //   (l,o) → s lo w </w>; (lo,w) → s low </w>; (low,</w>) → s low</w>
    assert(df("slow") == Seq("s", "low</w>"))
  }

  test("learnMerges over the corpus is deterministic and well-formed") {
    val sf = "/root/testdata/sf0.001"
    def run() = graft.queries.ProfilingQueries.queries("q_bpe_merges")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val a = run()
    assert(a.nonEmpty && a.map(_._1) == (1 to a.length))
    assert(a == run(), "merge learning must be deterministic")
    // every merged symbol is reachable: a merge's left/right are either
    // single chars, </w>, or the concatenation of an EARLIER merge
    val known = scala.collection.mutable.Set[String](Bpe.Eow)
    a.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach { s =>
        assert(s.length == 1 || known.contains(s),
          s"symbol '$s' used before being produced by a merge")
      }
      known += (l + r)
    }
  }
}
