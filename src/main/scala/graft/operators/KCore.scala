package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of an undirected graph (Seidman 1983;
  * coreness via the distributed h-index propagation of Montresor, De
  * Pellegrini & Miorandi 2011) — the density-governance companion to
  * [[graft.operators.PageRank]] and the triangle family: a near-dup
  * cluster whose nodes sit in a high k-core is a genuine duplicate
  * COMMUNITY (every member tied to ≥ k others), where a star of
  * pairwise matches glued by one template never leaves the 1-core.
  *
  * INPUT CONTRACT (both operators): a CANONICAL undirected edge list —
  * each edge exactly once, one orientation (no (b,a) mirror of an
  * (a,b) row), no duplicate rows, no self-loops. Duplicates/mirrors
  * double-count degrees and inflate cores; normalize upstream with
  * `least/greatest + distinct` if the source is not already canonical
  * (every in-repo caller builds edges from pair enumerations that are
  * canonical by construction — a defensive distinct here would tax
  * them all with an extra shuffle per iteration-0).
  *
  * Scale shape: every iteration is map-side-combinable aggregation
  * plus merge joins — no whole-graph windows (the h-index window
  * partitions by VERTEX id with ≤ distinct-neighbor-estimate rows per
  * group, bounded by degree and shrinking with convergence). Unlike
  * the FIXED-iteration PageRank loop, iteration depth is
  * data-dependent (≤ graph degeneracy for [[kCore]]; h-index
  * convergence rounds for [[coreness]] — tens TOTAL, with no per-k
  * restart), so each generation is `localCheckpoint`ed — lineage
  * TRUNCATES instead of nesting one join tree per iteration (blocks
  * are reclaimed by the context cleaner as generations go out of
  * scope).
  */
object KCore {

  private def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** The k-core: the maximal subgraph where every node has degree ≥ k
    * WITHIN the subgraph. Returns its edge set (same (id_a, id_b)
    * shape as the input); derive membership by collecting ids.
    * Classic fixpoint: repeatedly drop nodes with current degree < k
    * (and their edges) until stable.
    */
  def kCore(edges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be ≥ 1")
    var cur = materialize(edges.select("id_a", "id_b"))
    var nCur = cur.count()
    var done = nCur == 0L
    while (!done) {
      val sym = cur.select(col("id_a").as("u"))
        .unionAll(cur.select(col("id_b").as("u")))
      val keep = sym.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select("u")
      val next = materialize(cur
        .join(keep.withColumnRenamed("u", "id_a").hint("merge"), Seq("id_a"), "left_semi")
        .join(keep.withColumnRenamed("u", "id_b").hint("merge"), Seq("id_b"), "left_semi")
        .select("id_a", "id_b"))
      val nNext = next.count()
      done = nNext == nCur || nNext == 0L
      cur = next
      nCur = nNext
    }
    cur
  }

  /** Convergence rounds of the last [[coreness]] call — measurement
    * instrumentation (PERF.md records it), not part of the result.
    */
  @volatile private[graft] var lastRounds: Int = 0

  /** Full coreness: (id, coreness) for every node of the input graph,
    * where coreness(v) = the largest k with v in the k-core.
    *
    * H-index propagation (Montresor et al. 2011; Lü et al. 2016 prove
    * the fixpoint): start every vertex at its degree (an upper bound)
    * and repeatedly lower it to the H-INDEX of its neighbors'
    * estimates — the largest h such that ≥ h neighbors currently
    * estimate ≥ h — until nothing changes. Estimates are monotone
    * non-increasing and the fixpoint is exactly the coreness, in tens
    * of rounds TOTAL on real graphs. (The previous shape — a full
    * min-degree peel restarted per k level — ran Σ-per-k-depth
    * sequential jobs: already ~40 driver barriers at sf1 and
    * hundreds on a deeper graph, each an O(edges) checkpoint. Same
    * answer, KCoreSpec-pinned against the sequential peel.)
    *
    * Per round: one merge join (estimates onto the symmetric edge
    * list), one map-side-combinable (vertex, estimate) count, a
    * per-vertex window of ≤ distinct-neighbor-estimate rows for the
    * running count (h = max over distinct estimate values cv of
    * min(cv, #neighbors ≥ cv)), and one changed-row count for
    * termination. Shuffle stays ∝ edges; no per-k restarts.
    */
  def coreness(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the caller's edge subtree ONCE — callers often pass
    // an expensive unpersisted pipeline (q_coreness hands the whole
    // shared-shingle blocking here); the symmetric view drives every
    // round and the degree init
    val e0 = materialize(edges.select("id_a", "id_b"))
    // round-19: the symmetric edge table is hash-partitioned AND
    // sorted by the per-round join key v BEFORE its one-time
    // materialization (the ConnectedComponents/PageRank pre-partition
    // discipline, which this loop had skipped): localCheckpoint
    // records the partitioning/ordering on the LogicalRDD, so every
    // round's merge join now exchanges and sorts only the
    // VERTEX-sized estimate side — the EDGE-sized sym shuffle+sort
    // that each round previously paid is gone from the loop.
    val sym = materialize(
      e0.select(col("id_a").as("u"), col("id_b").as("v"))
        .unionAll(e0.select(col("id_b").as("u"), col("id_a").as("v")))
        .repartition(col("v")).sortWithinPartitions("v"))
    var est = materialize(sym.groupBy("u").agg(count(lit(1)).as("c")))
    // round-19 convergence check without the per-round est⋈next merge
    // join: estimates only ever DECREASE (next c = least(c, h) ≤ c),
    // so the generation changed iff the exact estimate sum changed —
    // the ConnectedComponents labelSum trick. decimal(38,0): exact at
    // any degree × vertex count; a changed vertex strictly lowers the
    // sum, an unchanged sum therefore means a fixpoint.
    def estSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("c").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = estSum(est)
    var converged = est.isEmpty
    var rounds = 0
    while (!converged) {
      val nbr = sym
        .join(est.select(col("u").as("v"), col("c").as("cv")).hint("merge"),
          Seq("v"))
        .select("u", "cv")
      val cnt = nbr.groupBy("u", "cv").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("u").orderBy(col("cv").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val h = cnt.withColumn("cum", sum("n").over(w))
        .groupBy("u").agg(max(least(col("cv"), col("cum"))).as("h"))
      val next = materialize(
        est.join(h.hint("merge"), Seq("u"))
          .select(col("u"), least(col("c"), col("h")).as("c")))
      val s = estSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      est = next
      rounds += 1
    }
    lastRounds = rounds
    est.select(col("u").as("id"), col("c").as("coreness"))
  }
}
