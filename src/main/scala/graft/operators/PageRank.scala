package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over an undirected edge list — fixed power iterations of
  *
  *   r₁(v) = (1−d)/N + d · Σ_{u~v} rₖ(u)/deg(u)
  *
  * (the simplified no-dangling-redistribution form: isolated vertices
  * hold the base rank (1−d)/N and leaked mass is not re-injected — the
  * deterministic variant an unrolled SQL oracle can reproduce exactly,
  * which is how q_pagerank is gated).
  *
  * The companion to [[ConnectedComponents]] in the dedup-graph
  * toolchain: CC tells you WHICH documents form a near-duplicate
  * cluster, PageRank ranks centrality WITHIN the similarity graph —
  * e.g. picking the canonical representative as the most-connected
  * document rather than min-id.
  *
  * Scale design (mirrors ConnectedComponents): the symmetrized edge
  * table is hash-partitioned by src and persisted ONCE — each
  * iteration is a join of the (small) rank table against that cached
  * layout plus one groupBy(dst), so per-iteration shuffle carries one
  * (id, contribution) pair per edge, never the edge table. Iteration
  * count is fixed (power iteration converges geometrically at rate d;
  * 5-10 iterations separate centrality tiers), so the plan is linear
  * in iters — each generation is persisted and the parent released,
  * exactly the CC lesson about lazy plan growth.
  */
object PageRank {

  /** Returns (id, rank). `vertices` must carry an `id` column; `edges`
    * columns `id_a`/`id_b`. Each undirected edge contributes in both
    * directions; deg is the symmetric degree.
    *
    * `redistributeDangling = true` switches to the standard random-
    * surfer model: the rank mass parked on dangling (here: isolated)
    * vertices is re-injected uniformly each iteration, so the rank
    * vector stays a probability distribution (Σr = 1 exactly). The
    * default keeps the simplified leak-and-hold form — the
    * deterministic variant the unrolled SQL oracle reproduces.
    *
    * `tol > 0` adds a convergence early-stop: iteration ends when the
    * L1 delta `Σ|rₖ₊₁ − rₖ|` drops below `tol` (power iteration
    * contracts the L1 error by ≥ d per step, so the extra distance to
    * the fixed point is at most `tol·d/(1−d)`). Costs one scalar
    * aggregate per iteration; `iters` remains the hard ceiling. The
    * default 0.0 keeps the fixed-iteration mode the oracle needs.
    *
    * Like [[ConnectedComponents.labelPropagation]], the returned frame
    * is one materialized MEMORY_ONLY cache (edge/degree/generation
    * caches are released before returning) — call `.unpersist()` on it
    * when finished.
    */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int = 5,
          damping: Double = 0.85, redistributeDangling: Boolean = false,
          tol: Double = 0.0): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = vertices.count()
    require(n > 0, "empty vertex set")
    val base = (1.0 - damping) / n

    val sym = edges
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_ONLY)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_ONLY)
    deg.count() // materialize both caches before iterating
    // dangling set is iteration-invariant; only its MASS changes
    val dangling =
      if (!redistributeDangling) null
      else vertices.select(col("id"))
        .join(deg.select(col("src").as("id")), Seq("id"), "left_anti")
        .persist(StorageLevel.MEMORY_ONLY)

    var ranks = vertices.select(col("id"), lit(1.0 / n).as("r"))
      .persist(StorageLevel.MEMORY_ONLY)
    var it = 0
    var delta = Double.MaxValue
    while (it < iters && (tol <= 0.0 || delta >= tol)) {
      // dangling mass this iteration — a scalar aggregate over the
      // (tiny) rank rows of the dangling set, spread uniformly
      val redistribute =
        if (!redistributeDangling) 0.0
        else {
          val row = ranks.join(dangling, "id").agg(sum("r")).head()
          val mass = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
          damping * mass / n
        }
      val contribs = sym
        .join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      val stepped = vertices.select(col("id"))
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(base + redistribute) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("r"))
      // each generation's plan nests the previous one — the cumulative
      // Catalyst plan (and AQE's explain strings) grow quadratically
      // with iterations (round 18's q_pagerank dump was 95 k lines at
      // 5 iterations: every generation re-prints the cached edge
      // pipeline's subtree). Round 19: EVERY generation re-roots on
      // its own execution RDD (Bridge.truncateLineage — the
      // localCheckpoint plan surgery without its GC-managed blocks;
      // the former every-10th createDataFrame(stepped.rdd, ...) round-
      // tripped through external Rows, this stays on InternalRow), so
      // plan depth is constant at any iteration count. persist/
      // unpersist discipline unchanged.
      val next = org.apache.spark.sql.graftbridge.Bridge
        .truncateLineage(stepped)
        .persist(StorageLevel.MEMORY_ONLY)
      if (tol > 0.0) {
        delta = next.join(ranks.withColumnRenamed("r", "r0"), "id")
          .agg(sum(abs(col("r") - col("r0")))).head().getDouble(0)
      } else {
        next.count() // materialize; parent safe to release
      }
      ranks.unpersist()
      ranks = next
      it += 1
    }
    sym.unpersist()
    deg.unpersist()
    if (dangling != null) dangling.unpersist()
    graft.plans.CacheHandles.track("pagerank.ranks", ranks)
  }
}
