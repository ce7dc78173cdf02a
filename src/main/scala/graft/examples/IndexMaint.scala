package graft.examples

/** Fleet-maintenance CLI: `runMain graft.examples.IndexMaint
  * <root>[,<root>...] [maxDeltas] [maxDeltaBytes]` — prints one
  * report line per index root and folds the ones past threshold via
  * [[graft.functions.IndexMaintenance.maintain]]. The cron-job shape:
  * point it at the deployment's index roots on a cadence and every
  * family stays shallow without per-family scripts.
  */
object IndexMaint {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IndexMaint <root>[,<root>...] [maxDeltas] [maxDeltaBytes]")
    val roots = args(0).split(",").toSeq.filter(_.nonEmpty)
    val maxDeltas = if (args.length > 1) args(1).toInt else 8
    val maxBytes = if (args.length > 2) args(2).toLong else 256L * 1024 * 1024
    val spark = graft.Sessions.local()
    try {
      graft.functions.IndexMaintenance
        .maintain(spark, roots, maxDeltas, maxBytes)
        .foreach { r =>
          val s = r.status
          println(f"[index-maint] ${s.family}%-10s deltas=${s.deltas}%-4d " +
            f"deltaMB=${s.deltaBytes / 1e6}%.1f baseMB=${s.baseBytes / 1e6}%.1f " +
            s"${r.compactedTo.map(v => s"FOLDED -> $v").getOrElse("ok")} " +
            s"(${s.root})")
        }
    } finally spark.stop()
  }
}
