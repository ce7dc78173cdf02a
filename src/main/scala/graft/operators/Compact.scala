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
  * Hive-partitioned layouts (`col=value` dirs, e.g. an IVF index's
  * cell-partitioned tables) are detected and compacted PER LEAF
  * PARTITION: the dir structure — and therefore partition pruning —
  * survives, each partition's output file count is sized from its own
  * bytes (a skewed giant partition compacts to many files without
  * gating the rest of the table), and partitions too large to ever
  * need co-residence never meet in one shuffle.
  *
  * Two table layouts:
  *  - **In-place** ([[parquetDir]]): the plain directory every
  *    existing dataset already has. The swap renames the original
  *    aside, promotes the rewrite, then drops the original — every
  *    crash state leaves the table recoverable by a rename, but
  *    readers mid-swap can still catch a missing path, so it is for
  *    single-writer maintenance windows.
  *  - **Versioned** ([[parquetDirVersioned]] + [[read]]/
  *    [[writeVersioned]]): the table is a [[Versioned]] root; each
  *    compaction commits a NEW version and readers resolving through
  *    the pointer only ever see complete versions — safe under
  *    concurrent readers without a table format (readers slower than
  *    one full rebuild cycle still need a real transaction log).
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

  /** The hive-style partition columns of the layout under `path`
    * (e.g. `Seq("ivf_cell")` for a `partitionBy("ivf_cell")` table),
    * empty for a flat directory — detected from the `col=value` dir
    * names, one level per column, by walking the first child chain.
    */
  def partitionColumns(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    @annotation.tailrec
    def walk(dir: org.apache.hadoop.fs.Path, acc: List[String]): List[String] = {
      val partDirs = fs.listStatus(dir).filter(s =>
        s.isDirectory && s.getPath.getName.contains("=") &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      if (partDirs.isEmpty) acc.reverse
      else walk(partDirs.head.getPath,
        partDirs.head.getPath.getName.split("=", 2)(0) :: acc)
    }
    walk(root, Nil)
  }

  /** The leaf partition directories of a hive-partitioned layout,
    * `depth` levels below `path`, as (absolute path, path relative to
    * root) — the units [[parquetDir]] compacts independently.
    */
  private def leafPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
                                root: org.apache.hadoop.fs.Path,
                                depth: Int): Seq[(org.apache.hadoop.fs.Path, String)] = {
    def go(dir: org.apache.hadoop.fs.Path, rel: String, d: Int): Seq[(org.apache.hadoop.fs.Path, String)] =
      if (d == 0) Seq((dir, rel))
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("=") &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .flatMap(s => go(s.getPath,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}", d - 1))
    go(root, "", depth)
  }

  /** Rewrite every leaf partition of `src` into `dst`, preserving the
    * `col=value` dir structure (and therefore partition pruning),
    * sizing each partition's file count from its OWN bytes — one giant
    * partition compacts to many files without gating the rest of the
    * table behind a single global repartition.
    */
  private def rewritePartitioned(spark: SparkSession,
                                 fs: org.apache.hadoop.fs.FileSystem,
                                 src: org.apache.hadoop.fs.Path, dst: String,
                                 depth: Int, targetBytes: Long): Unit =
    leafPartitionDirs(fs, src, depth).foreach { case (leaf, rel) =>
      val bytes = dirBytes(spark, leaf.toString)
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      spark.read.parquet(leaf.toString)
        .repartition(nOut)
        .write.mode("overwrite").parquet(s"$dst/$rel")
    }

  /** Rewrite `path` into ceil(bytes / targetBytes) files. Returns
    * (filesBefore, filesAfter).
    *
    * The swap is defensive: the tmp dir is a SIBLING of the target
    * (never inside it — a trailing slash must not place it under the
    * directory being replaced), the rewrite is verified row-count
    * complete BEFORE the original is touched, and every rename return
    * value is checked. The original is renamed ASIDE (-compact-old)
    * before the rewrite is promoted, so every crash state leaves the
    * table resolvable by a single rename: before the first rename
    * nothing changed; between the renames both `-old` and `-tmp` are
    * complete; a failed promotion rolls the original back in place.
    */
  def parquetDir(spark: SparkSession, path: String,
                 targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val target = new org.apache.hadoop.fs.Path(path) // normalizes trailing '/'
    val tmp = new org.apache.hadoop.fs.Path(
      target.getParent, target.getName + "-compact-tmp")
    val old = new org.apache.hadoop.fs.Path(
      target.getParent, target.getName + "-compact-old")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recover the one crash state that leaves the table path missing
    // (killed between the two renames: original at -old, rewrite at
    // -tmp): roll the original back in place so the run proceeds
    // normally instead of dying in fileCount with a bare
    // FileNotFoundException an operator must decode by hand
    if (!fs.exists(target) && fs.exists(old)) {
      if (!fs.rename(old, target))
        throw new java.io.IOException(
          s"crash recovery: could not restore $old -> $target")
    }
    val before = fileCount(spark, target.toString)
    val nRows = spark.read.parquet(target.toString).count()
    val partCols = partitionColumns(spark, target.toString)
    if (partCols.isEmpty) {
      val bytes = dirBytes(spark, target.toString)
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      spark.read.parquet(target.toString)
        .repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    } else
      // partitioned layout: compact each `col=value` leaf on its own —
      // the rewrite keeps the dir structure (pruning survives) and a
      // flat repartition would have destroyed it (reading the root
      // folds partition dirs into data columns; writing flat drops them)
      rewritePartitioned(spark, fs, target, tmp.toString, partCols.size, targetBytes)
    val rewritten = spark.read.parquet(tmp.toString).count()
    if (rewritten != nRows) {
      fs.delete(tmp, true)
      throw new IllegalStateException(
        s"compaction rewrite row mismatch: $rewritten != $nRows (original untouched)")
    }
    // leftover -old from a crashed PREVIOUS run: with the entry guard
    // above, reaching here with both target and -old present means
    // that run's promotion succeeded (the unpromoted crash state was
    // already rolled back at entry), so -old is safe to reclaim
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(
        s"could not reclaim stale $old (original untouched)")
    if (!fs.rename(target, old))
      throw new java.io.IOException(
        s"rename $target -> $old failed (original untouched)")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll the original back in place
      throw new java.io.IOException(
        s"promote $tmp -> $target failed (original restored)")
    }
    fs.delete(old, true) // best-effort; stale -old is reclaimed next run
    (before, fileCount(spark, target.toString))
  }

  /** Create/replace a versioned table at `path`: the frame lands as a
    * new committed [[Versioned]] version that [[read]] resolves.
    */
  def writeVersioned(df: DataFrame, path: String): Unit =
    Versioned.commitNew(df.sparkSession, path) { v =>
      df.write.mode("overwrite").parquet(v)
    }

  /** The current committed version of a versioned table. */
  def read(spark: SparkSession, path: String): DataFrame =
    Versioned.resolve(spark, path) match {
      case Some(v) => spark.read.parquet(v)
      case None => throw new java.io.FileNotFoundException(
        s"no committed version at $path")
    }

  /** [[parquetDir]] for a versioned table: compacts the current
    * version into a NEW committed version — concurrent [[read]]ers
    * keep resolving the old (still on disk) version until the commit,
    * and never observe a partial listing. Returns
    * (filesBefore, filesAfter).
    */
  def parquetDirVersioned(spark: SparkSession, path: String,
                          targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val cur = Versioned.resolve(spark, path).getOrElse(
      throw new java.io.FileNotFoundException(s"no committed version at $path"))
    val before = fileCount(spark, cur)
    val nRows = spark.read.parquet(cur).count()
    val partCols = partitionColumns(spark, cur)
    Versioned.commitNew(spark, path) { v =>
      if (partCols.isEmpty) {
        val bytes = dirBytes(spark, cur)
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        spark.read.parquet(cur).repartition(nOut).write.mode("overwrite").parquet(v)
      } else {
        val curP = new org.apache.hadoop.fs.Path(cur)
        val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        rewritePartitioned(spark, fs, curP, v, partCols.size, targetBytes)
      }
      val rewritten = spark.read.parquet(v).count()
      if (rewritten != nRows)
        // aborting here leaves an uncommitted orphan — readers never
        // resolve it, and the next commit reclaims it
        throw new IllegalStateException(
          s"compaction rewrite row mismatch: $rewritten != $nRows " +
            "(current version untouched)")
    }
    (before, fileCount(spark, Versioned.resolve(spark, path).get))
  }
}
