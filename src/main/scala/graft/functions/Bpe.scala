package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over a distributed corpus —
  * the subword-vocabulary step every pretraining pipeline runs before
  * token counting means anything (Sennrich et al. 2016's algorithm,
  * as productionized by the open-source tokenizer trainers: merges
  * are learned from the word-frequency DICTIONARY, not the raw
  * token stream).
  *
  * Scale shape, in two deliberately different regimes:
  *
  *  1. The corpus-sized part — collapsing 100 TB of text into
  *     (word, count) rows — is a distributed map-side-combinable
  *     groupBy: duplicate words collapse on the mappers, and the
  *     shuffle carries vocabulary-sized data (corpus-sublinear,
  *     Heaps' law). The dictionary is then capped to the top
  *     `maxWords` by (count desc, word) via orderBy+limit — Spark
  *     plans that as TakeOrderedAndProject (per-partition partial
  *     top-N, driver merge), never a global sort exchange.
  *  2. The iterative merge loop runs on the DRIVER over the capped
  *     dictionary — bounded work (≤ maxWords rows, nMerges passes)
  *     that every published BPE trainer does in memory; distributing
  *     it would shuffle per-iteration pair counts for a dataset that
  *     fits in one task. Determinism: ties on pair count break
  *     lexicographically on (left, right).
  *
  * The learned merge table is itself a tiny DataFrame (nMerges rows)
  * — broadcastable to whatever applies it. [[segmentWith]] applies a
  * learned merge list to a token column as a chain of codegen'd
  * higher-order folds (one `aggregate` pass per merge, no UDFs) —
  * the demonstration path for spec-sized merge lists; a production
  * applier would compile the merge list into a trie-driven
  * Expression.
  *
  * Reference parity: the reference has no tokenizer training; this is
  * part of the beyond-reference LLM-training-data surface (SURVEY §2)
  * alongside dedup/decontamination/importance.
  */
object Bpe {

  /** End-of-word sentinel: a symbol that cannot collide with corpus
    * characters under [[Dedup.tokens]]' whitespace tokenization.
    */
  val Eow = "</w>"

  /** Distributed (word, count) dictionary, capped to the `maxWords`
    * most frequent words (count desc, word asc — deterministic).
    */
  def wordCounts(docs: DataFrame, textCol: String, maxWords: Int): Array[(String, Long)] =
    docs.select(explode(Dedup.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** One learned merge: rank (1-based), left symbol, right symbol,
    * weighted pair count at selection time.
    */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Sennrich-style merge learning over a word-frequency dictionary.
    * Each word is a symbol sequence of its characters plus [[Eow]];
    * each iteration merges the globally most frequent adjacent symbol
    * pair (count-weighted; ties lexicographic on (left, right)) and
    * rewrites the dictionary. Stops early when no adjacent pair
    * remains (all words fully merged).
    */
  def train(dict: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (w.map(_.toString).toArray :+ Eow, c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(j), syms(j + 1)))(p => Some(p.getOrElse(0L) + c))
      if (pairCounts.isEmpty) done = true
      else {
        val ((l, r), cnt) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(rank, l, r, cnt)
        words = words.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Single left-to-right merge pass: every adjacent (l, r) becomes
    * l+r (non-overlapping, leftmost-first — the standard rule).
    */
  private[functions] def mergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Learn merges from a corpus and return them as a DataFrame
    * (rank, left, right, pair_count) — the persisted artifact shape.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 100000): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    train(wordCounts(docs, textCol, maxWords).toSeq, nMerges)
      .map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Applies a learned merge list to a whitespace token column: each
    * token becomes its BPE symbol array. One codegen'd `aggregate`
    * fold per merge (left-to-right, non-overlapping — matches
    * [[mergeOnce]] because a fold IS leftmost-first), no UDFs.
    * Intended for spec-scale merge lists; see class doc.
    */
  def segmentWith(merges: Seq[Merge])(tokenCol: Column): Column = {
    // split("") keeps a trailing zero-width match under Spark's
    // limit=-1 semantics — filter it before appending the sentinel
    val chars = concat(
      filter(split(tokenCol, ""), x => length(x) > 0), array(lit(Eow)))
    merges.foldLeft(chars) { case (symsCol, m) =>
      val l = lit(m.left); val r = lit(m.right)
      aggregate(symsCol, array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
          .otherwise(concat(acc, array(x))))
    }
  }
}
