package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via HashMin label propagation —
  * the standard MapReduce CC algorithm: every vertex starts labeled
  * with its own id and repeatedly adopts the minimum label among
  * itself and its neighbors until no label changes.
  *
  * Two structural choices keep it scalable:
  *
  *  - **Only edge-touched vertices iterate.** An isolated vertex's
  *    label can never change, and in a near-dup graph the touched set
  *    is a small fraction of the corpus — the loop's shuffles scale
  *    with duplicate-pair volume, not corpus size. Isolated vertices
  *    are unioned back (own id as component) at the end.
  *  - **Self-loops instead of a second labels reference.** The
  *    symmetrized edge table carries (a,b),(b,a),(a,a),(b,b) per
  *    edge, so the per-iteration neighbor-minimum already includes
  *    the vertex's own label: one join + one aggregation per
  *    iteration, and `labels` appears ONCE in each generation's plan.
  *    Referencing it twice (the textbook least(own, neighborMin)
  *    formulation) doubles the logical plan per iteration —
  *    exponential growth that OOMs the driver's plan stringification
  *    after ~8 iterations regardless of data size.
  *
  * Each generation is persisted and the previous one dropped, so
  * physical lineage stays one iteration deep. Iteration count is the
  * graph diameter; dedup-cluster graphs are piles of small dense
  * blobs, so convergence takes 2-4 passes.
  *
  * Used for dedup canonicalization: LSH/shingle near-dup PAIRS become
  * CLUSTERS, and `min(id)` per cluster is the canonical document to
  * keep (the same keep-first rule as [[graft.functions.Dedup.exact]]).
  */
object ConnectedComponents {

  /** Returns (id, comp): every vertex labeled with the minimum vertex
    * id of its component. `vertices` must carry an `id` column,
    * `edges` columns `id_a`/`id_b` (endpoints must exist in
    * `vertices`); isolated vertices keep their own id as the
    * component.
    *
    * Throws `IllegalStateException` if labels have not converged after
    * `maxIter` passes — silently returning half-merged components
    * would keep duplicate documents downstream, a correctness bug, not
    * a degraded answer. Raise `maxIter` (it bounds graph diameter, not
    * edge count) if a legitimately deep graph trips it.
    *
    * The returned DataFrame is one materialized MEMORY_ONLY cache
    * (loop generations and the edge table are released before
    * returning); call `.unpersist()` on it when finished.
    */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       maxIter: Int = 50): DataFrame = {
    // symmetrize + self-loops in ONE pass over `edges` (explode, not a
    // self-union: union branches would each evaluate the full upstream
    // edge pipeline — for shingle-join edge rules the expensive part).
    // Duplicate self-loops (one per incident edge) are harmless under
    // the min aggregate and cheaper than a distinct to dedupe them.
    // pre-partitioned by SRC before the persist: the label table is
    // the small side, so the per-iteration join broadcasts it (or
    // shuffles only it), and the groupBy(src) neighbor-min then runs
    // DIRECTLY on the cached hash(src) layout — zero edge-table
    // shuffles per iteration (verified: the iteration plan is
    // HashAggregate over BroadcastHashJoin over the in-memory scan,
    // no Exchange)
    val sym = edges
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")),
        struct(col("id_a").as("src"), col("id_a").as("dst")),
        struct(col("id_b").as("src"), col("id_b").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_ONLY)
    val touched = sym.select(col("src").as("id")).distinct()
    var labels: DataFrame = vertices.join(touched, Seq("id"), "left_semi")
      .select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_ONLY)
    // Convergence check without a per-iteration join against the
    // previous generation: labels only ever DECREASE (min over
    // neighbors ∪ self), so the generation changed iff the exact
    // label sum changed. decimal(38,0): exact at any id magnitude ×
    // any row count — a hash/long sum could overflow or collide.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty graph sums to null
    var prevSum = labelSum(labels) // also materializes the initial cache
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // self-loops put the vertex's own label in its neighbor group,
      // so this min IS the HashMin update — labels referenced once.
      // truncateLineage (round 19): each generation re-roots on its
      // own execution RDD so the logical plan stays one iteration deep
      // (matching the physical cache depth) instead of nesting every
      // previous generation's text — the q_pagerank plan-blowup fix,
      // applied to the CC loop that q_dedup_clusters' 8.7 k-line dump
      // traced to. persist/unpersist discipline unchanged.
      // Round 19 wave 5: TWO HashMin hops per generation — the loop's
      // per-generation cost at any reasonable scale is dominated by
      // the FIXED action overhead (plan/AQE/persist/convergence-sum
      // ~3-4 stages), not the edge-sized data stages, so chaining a
      // second join+min inside the same plan halves the generation
      // count for the same diameter (dedup blobs: 4-5 sums → 3). The
      // fixpoint is identical (HashMin is monotone and idempotent —
      // if labels converge after an odd hop, the extra hop is a
      // no-op), and the sum convergence check is unchanged: unchanged
      // sum ⟺ both hops changed nothing ⟺ fixpoint.
      def hop(l: DataFrame): DataFrame = sym
        .join(l.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("id")).agg(min("comp").as("comp"))
      val next = org.apache.spark.sql.graftbridge.Bridge
        .truncateLineage(hop(hop(labels)))
        .persist(StorageLevel.MEMORY_ONLY)
      val s = labelSum(next) // materializes `next`; parent safe to drop
      labels.unpersist()
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    if (!converged) {
      sym.unpersist()
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations; " +
          "raise maxIter for deep graphs")
    }
    // isolated vertices rejoin with their own id; materialize the
    // combined frame so callers get ONE cached frame whose
    // .unpersist() releases everything, and the loop caches + edge
    // table can be dropped eagerly here
    val combined = graft.plans.CacheHandles.track("cc.labels", labels
      .unionAll(vertices.join(touched, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("comp")))
      .persist(StorageLevel.MEMORY_ONLY))
    combined.count()
    labels.unpersist()
    sym.unpersist()
    combined
  }
}
