package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition of an undirected graph (Seidman 1983; the
  * distributed peeling formulation of Montresor et al.) — the
  * density-governance companion to [[graft.operators.PageRank]] and
  * the triangle family: a near-dup cluster whose nodes sit in a high
  * k-core is a genuine duplicate COMMUNITY (every member tied to ≥ k
  * others), where a star of pairwise matches glued by one template
  * never leaves the 1-core.
  *
  * Scale shape: every peeling iteration is one map-side-combinable
  * degree aggregation plus two merge semi-join filters — no
  * whole-graph windows, shuffle bounded by the surviving edge set
  * (monotonically shrinking). Unlike the FIXED-iteration PageRank
  * loop, peeling depth is data-dependent (≤ the graph degeneracy for
  * [[kCore]]; Σ per-k depths for [[coreness]]), so each generation is
  * `localCheckpoint`ed — lineage TRUNCATES instead of nesting one
  * join tree per iteration (a hundred-iteration peel would otherwise
  * hand the optimizer an exponentially-printed plan; blocks are
  * reclaimed by the context cleaner as generations go out of scope).
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

  /** Full coreness: (id, coreness) for every node of the input graph,
    * where coreness(v) = the largest k with v in the k-core. Peels
    * k = 1, 2, … until the graph empties; nodes that leave between
    * the k-core and the (k+1)-core keep the last level they survived.
    */
  def coreness(edges: DataFrame): DataFrame = {
    // materialize the caller's edge subtree ONCE: levels and the first
    // peel both consume it, and callers often pass an expensive
    // unpersisted pipeline (q_coreness hands the whole shared-shingle
    // blocking here)
    val e0 = materialize(edges.select("id_a", "id_b"))
    var levels = materialize(
      e0.select(col("id_a").as("u"))
        .unionAll(e0.select(col("id_b").as("u")))
        .distinct()
        .withColumn("c", lit(0L)))
    var cur: DataFrame = e0
    var k = 1
    var done = false
    while (!done) {
      val core = kCore(cur, k) // already checkpointed
      val members = core.select(col("id_a").as("u"))
        .unionAll(core.select(col("id_b").as("u"))).distinct()
      if (members.isEmpty) done = true
      else {
        levels = materialize(levels
          .join(members.withColumn("_in", lit(1)).hint("merge"), Seq("u"), "left")
          .select(col("u"),
            when(col("_in").isNotNull, lit(k.toLong)).otherwise(col("c")).as("c")))
        cur = core
        k += 1
      }
    }
    levels.select(col("u").as("id"), col("c").as("coreness"))
  }
}
