package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components via HashMin label propagation —
  * the standard MapReduce CC algorithm: every vertex starts labeled
  * with its own id and repeatedly adopts the minimum label among
  * itself and its neighbors until no label changes.
  *
  * Each iteration is one key-shuffle join (edges ⋈ labels) + one
  * aggregation — no driver-side graph state, so it scales to
  * billion-edge near-dup graphs. Iteration count is the graph
  * diameter; dedup-cluster graphs are piles of small dense blobs
  * (diameter ≤ a handful), so convergence takes 2-4 passes. Labels are
  * persisted per iteration (and the previous generation unpersisted)
  * to cut lineage growth — without it iteration N would recompute all
  * N-1 predecessors.
  *
  * Used for dedup canonicalization: LSH/shingle near-dup PAIRS become
  * CLUSTERS, and `min(id)` per cluster is the canonical document to
  * keep (the same keep-first rule as [[graft.functions.Dedup.exact]]).
  */
object ConnectedComponents {

  /** Returns (id, comp): every vertex labeled with the minimum vertex
    * id of its component. `vertices` must carry an `id` column,
    * `edges` columns `id_a`/`id_b`; isolated vertices keep their own
    * id as the component.
    *
    * Throws `IllegalStateException` if labels have not converged after
    * `maxIter` passes — silently returning half-merged components
    * would keep duplicate documents downstream, a correctness bug, not
    * a degraded answer. Raise `maxIter` (it bounds graph diameter, not
    * edge count) if a legitimately deep graph trips it.
    *
    * The returned DataFrame is persisted MEMORY_ONLY (the loop needs
    * each generation materialized, and callers invariably reuse the
    * labels for the join back to payloads); call `.unpersist()` on it
    * when finished to release the blocks.
    */
  def labelPropagation(vertices: DataFrame, edges: DataFrame,
                       maxIter: Int = 50): DataFrame = {
    // symmetrize in ONE pass over `edges` (explode, not a self-union:
    // union's two branches would each evaluate the full upstream edge
    // pipeline — for shingle-join edge rules that's the expensive part)
    val sym = edges
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_ONLY)
    var labels = vertices.select(col("id"), col("id").as("comp"))
      .persist(StorageLevel.MEMORY_ONLY)
    // Convergence check without a per-iteration join against the
    // previous generation: labels only ever DECREASE (least of self
    // and neighbor minima), so the generation changed iff the exact
    // label sum changed. decimal(38,0): exact at any id magnitude ×
    // any row count — a hash/long sum could overflow or collide.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty graph sums to null
    var prevSum = labelSum(labels) // also materializes the initial cache
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("id")).agg(min("comp").as("ncomp"))
      val next = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .persist(StorageLevel.MEMORY_ONLY)
      val s = labelSum(next) // materializes `next`; parent safe to drop
      labels.unpersist()
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter iterations; " +
          "raise maxIter for deep graphs")
    }
    labels
  }
}
