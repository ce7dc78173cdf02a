package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the maintenance operator every
  * continuously-ingested parquet corpus needs: streaming sinks and
  * incremental appends (e.g. [[graft.streaming.Streams.dedupIngest]])
  * produce one-file-per-micro-batch layouts whose per-file overhead
  * (footer reads, task scheduling, open/close) eventually dominates
  * scans. Compaction rewrites a directory into ~`targetBytes` files.
  *
  * Scale design: file count is computed from the directory's ACTUAL
  * byte size (not a row-count guess, which mis-sizes wide/narrow
  * schemas); the rewrite is one coalesce-free `repartition(n)` — a
  * round-robin shuffle that also heals skewed file sizes, where
  * `coalesce` would merely concatenate neighbors and keep hotspots.
  * The write lands in a temp dir first and swaps in atomically-enough
  * for a single-writer maintenance window (concurrent readers of the
  * old listing finish against deleted-file errors — at cluster scale
  * run compaction through a table format's transaction log instead;
  * this operator is the format-free core).
  */
object Compact {

  /** Bytes of all files under `path` (recursive, via the Hadoop FS of
    * the session — works on any configured filesystem).
    */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Number of parquet part-files under `path`. */
  def fileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /** Rewrite `path` into ceil(bytes / targetBytes) files. Returns
    * (filesBefore, filesAfter).
    *
    * The swap is defensive: the tmp dir is a SIBLING of the target
    * (never inside it — a trailing slash must not place it under the
    * directory being replaced), the rewrite is verified row-count
    * complete BEFORE the original is touched, and every delete/rename
    * return value is checked — a swap step that fails throws with the
    * rewritten data still on disk in the tmp dir, it never silently
    * drops the table.
    */
  def parquetDir(spark: SparkSession, path: String,
                 targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val target = new org.apache.hadoop.fs.Path(path) // normalizes trailing '/'
    val tmp = new org.apache.hadoop.fs.Path(
      target.getParent, target.getName + "-compact-tmp")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fileCount(spark, target.toString)
    val bytes = dirBytes(spark, target.toString)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df: DataFrame = spark.read.parquet(target.toString)
    val nRows = df.count()
    df.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    val rewritten = spark.read.parquet(tmp.toString).count()
    if (rewritten != nRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction rewrite row mismatch: $rewritten != $nRows (original untouched)")
    }
    if (!fs.delete(target, true))
      throw new java.io.IOException(
        s"could not delete $target (rewrite preserved at $tmp)")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(
        s"rename $tmp -> $target failed (rewrite preserved at $tmp)")
    (before, fileCount(spark, target.toString))
  }
}
