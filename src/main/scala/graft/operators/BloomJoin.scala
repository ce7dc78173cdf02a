package graft.operators

import graft.plans.BloomMightContain.bloom_might_contain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Bloom-prefiltered join: build a bloom filter over the small side's
  * join keys (one action over the — by assumption — small relation),
  * prune the big side at its scan with the codegen'd
  * `bloom_might_contain` predicate, then run the exact join. Results
  * are identical to the plain join (blooms have no false negatives;
  * false positives are removed by the join itself) — the oracle for
  * `q_bloom_join` checks exactly that.
  *
  * When it pays at 100 TB: the dim side is too big (or too contested)
  * to broadcast but its KEY SET fits a few MB of bloom bits — e.g.
  * 10 M keys at 1% fpp ≈ 12 MB. A shuffle join would move every fact
  * row; with the bloom, ~(1−selectivity)·(1−fpp) of the fact NEVER
  * leaves its scan stage, so shuffle bytes drop by the dim's
  * selectivity. This is the manual form of Spark's runtime row-level
  * filtering (spark.sql.optimizer.runtime.bloomFilter), usable when
  * the optimizer's heuristics won't inject it — and deterministic, so
  * it can be gated by an oracle.
  */
object BloomJoin {

  /** Sentinel: size the sketch from the small side's ACTUAL row count
    * (one extra cheap action over the — by assumption — small
    * relation). A FIXED `expectedItems` is a scale defect waiting to
    * happen: the round-15 sf10 sweep measured q_bloom_join's shuffle
    * growing 342× across a 10× jump because a 4096-capacity filter
    * met a 10×-grown key set — an overloaded bloom saturates, the fpp
    * goes to ~1, and the prefilter silently stops pruning (correctness
    * holds, the scale win evaporates). Auto-sizing makes the pruning
    * rate SF-invariant.
    */
  val AutoSize: Long = -1L

  /** Prune `big` to rows whose `bigKey` might be in `small.smallKey`,
    * then inner-join. `expectedItems`/`fpp` size the sketch — bits ≈
    * −n·ln(fpp)/ln(2)², so overestimating n costs memory linearly but
    * never correctness; the [[AutoSize]] default counts the small
    * side first.
    */
  def innerJoin(big: DataFrame, bigKey: String, small: DataFrame,
                smallKey: String, expectedItems: Long = AutoSize,
                fpp: Double = 0.01): DataFrame = {
    val pruned = prefilter(big, bigKey, small, smallKey, expectedItems, fpp)
    // frame-qualified keys: bigKey/smallKey may share a NAME (the
    // common case for a generic join helper), which unqualified
    // col() would make an ambiguous reference
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }

  /** Just the prune step: `big` rows whose key passes the bloom built
    * from `small`'s keys. Exposed for composition (semi-join shapes,
    * multi-stage pipelines) and for the spec's pruning-rate assertion.
    */
  def prefilter(big: DataFrame, bigKey: String, small: DataFrame,
                smallKey: String, expectedItems: Long = AutoSize,
                fpp: Double = 0.01): DataFrame = {
    val bloom =
      if (expectedItems == AutoSize) {
        // AutoSize runs TWO actions over the small side (count, then
        // bloomFilter) before the join's own probe-side build — an
        // uncached derived/filtered dim would materialize its lineage
        // three times. Persist around the count+bloomFilter pair;
        // unpersist eagerly once the sketch (a plain driver value) is
        // built, so nothing lingers for the lazy join.
        val cached = small.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val n = math.max(cached.count(), 64L)
          cached.stat.bloomFilter(smallKey, n, fpp)
        } finally cached.unpersist(blocking = false)
      } else small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.filter(bloom_might_contain(col(bigKey), bloom))
  }
}
