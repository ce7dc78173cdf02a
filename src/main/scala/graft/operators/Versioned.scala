package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Versioned directory layout for multi-file artifacts (indexes,
  * compacted tables) that must stay readable while being rebuilt.
  *
  * A writer materializes everything under `path/_v=N` (N = latest+1),
  * drops a `_COMMITTED` marker inside it, then atomically renames a
  * pointer file `path/_latest.tmp` → `path/_latest` containing N.
  * Readers resolve through the pointer (falling back to the highest
  * committed version if the pointer is mid-swap), so they only ever
  * see a COMPLETE version:
  *
  *  - a crash before `_COMMITTED` leaves an orphan dir that is never
  *    resolved and is reclaimed by the next writer's [[prune]];
  *  - a crash between marker and pointer leaves the pointer stale but
  *    the fallback scan still finds the newer committed version;
  *  - concurrent readers of version N keep reading N while N+1 is
  *    written — [[prune]] keeps the previous version for exactly this
  *    window (readers slower than one full rebuild cycle need a real
  *    table format with snapshot isolation, e.g. Iceberg/Delta).
  *
  * Rename is atomic on local filesystems and HDFS; object stores
  * without atomic rename get last-writer-wins on the tiny pointer,
  * which still never exposes a partial version (the pointed-to dir is
  * complete before the pointer moves).
  */
object Versioned {
  private val Marker = "_COMMITTED"
  private val Pointer = "_latest"

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionOf(name: String): Option[Int] =
    if (name.startsWith("_v=")) name.stripPrefix("_v=").toIntOption else None

  private def committedVersions(f: FileSystem, root: Path): Seq[Int] =
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => versionOf(s.getPath.getName))
      .filter(v => f.exists(new Path(root, s"_v=$v/$Marker")))

  private def pointerVersion(f: FileSystem, root: Path): Option[Int] = {
    val p = new Path(root, Pointer)
    // open unconditionally and treat a missing file as None: an
    // exists() pre-check would race commitNew's delete+rename swap and
    // crash a concurrent reader — the exact failure this layout exists
    // to prevent (resolve() then falls back to the committed-dir scan)
    try {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toIntOption
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** The current committed version's directory, if any. Trusts the
    * pointer when it names a committed version; otherwise falls back
    * to the highest committed version on disk.
    */
  def resolve(spark: SparkSession, path: String): Option[String] = {
    val root = new Path(path)
    val f = fs(spark, root)
    val ptr = pointerVersion(f, root)
      .filter(v => f.exists(new Path(root, s"_v=$v/$Marker")))
    ptr.orElse(committedVersions(f, root).maxOption)
      .map(v => new Path(root, s"_v=$v").toString)
  }

  /** Write a new version: `write` receives the fresh `path/_v=N` dir
    * to fill; on success the version is marked committed and the
    * pointer swaps to it. Returns the committed version dir. Old
    * versions beyond the previous one are pruned (never the one a
    * concurrent reader just resolved).
    */
  def commitNew(spark: SparkSession, path: String)(write: String => Unit): String = {
    val root = new Path(path)
    val f = fs(spark, root)
    f.mkdirs(root)
    val next = (pointerVersion(f, root).toSeq ++ committedVersions(f, root))
      .maxOption.getOrElse(0) + 1
    val vdir = new Path(root, s"_v=$next")
    // a half-written orphan from a crashed previous attempt at this N
    // would otherwise merge with ours
    if (f.exists(vdir)) f.delete(vdir, true)
    write(vdir.toString)
    f.create(new Path(vdir, Marker), true).close()
    val tmp = new Path(root, Pointer + ".tmp")
    val out = f.create(tmp, true)
    out.write(next.toString.getBytes("UTF-8"))
    out.close()
    f.delete(new Path(root, Pointer), false)
    f.rename(tmp, new Path(root, Pointer))
    prune(spark, path, keep = 2)
    vdir.toString
  }

  /** Delete all but the newest `keep` committed versions plus any
    * uncommitted orphans older than the newest committed one.
    */
  def prune(spark: SparkSession, path: String, keep: Int = 2): Unit = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (!f.exists(root)) return
    val committed = committedVersions(f, root).sorted
    val keepSet = committed.takeRight(keep).toSet
    val newest = committed.maxOption.getOrElse(Int.MaxValue)
    f.listStatus(root).foreach { s =>
      versionOf(s.getPath.getName).foreach { v =>
        val isCommitted = committed.contains(v)
        if ((isCommitted && !keepSet(v)) || (!isCommitted && v < newest))
          f.delete(s.getPath, true)
      }
    }
  }
}
