package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared append-batch join discipline for the persisted-index
  * family. Index appends probe the corpus-scale index with
  * batch-derived sides; those probes want a BROADCAST (the index
  * never shuffles) — but only while the batch is actually
  * batch-sized. An unconditional broadcast hint is the by-hint twin
  * of the stats-estimate broadcast that killed q_linkage at the
  * round-15 sf10 sweep: a bulk replay or bootstrap misuse pushes the
  * whole corpus through the "batch" side and the driver dies at the
  * broadcast build, late and uninformatively. The guard counts the
  * batch once (callers count off the batch's own cache) and past
  * [[MaxBroadcastRows]] degrades every probe to a sort-merge join
  * with a loud one-line advisory pointing at the corpus-scale build
  * path instead.
  */
object IndexAppend {

  /** 4 M ids ≈ 32 MB of longs in the broadcast — comfortably inside
    * executor memory at default sizing while an order of magnitude
    * above any sane micro-batch.
    */
  val MaxBroadcastRows: Long = 4L * 1000 * 1000

  /** The per-append join-side wrapper: broadcast below the cap, loud
    * merge fallback above it. `what`/`path` only label the advisory.
    */
  def probeHint(batchRows: Long, what: String, path: String)
      : DataFrame => DataFrame =
    if (batchRows <= MaxBroadcastRows) broadcast
    else {
      System.err.println(
        s"[index-append] batch of $batchRows rows exceeds the " +
          s"$MaxBroadcastRows-row broadcast cap for the $what at $path — " +
          "probing with shuffle joins instead; corpus-scale inputs " +
          "belong in writeIndex (build), not appendIndex")
      _.hint("merge")
    }
}
