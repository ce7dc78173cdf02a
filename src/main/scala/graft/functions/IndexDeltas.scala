package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared delta plumbing for the *tabular* signature-index families
  * (MinhashIndex, SimhashIndex): a committed version dir holding N
  * named parquet tables, deltas carrying the same tables, streaming
  * tags as `_TAG_<qid>_b<batch>` marker files.
  *
  * Extracted (round 18) from MinhashIndex verbatim so the simhash
  * family reuses the compaction/tag-replay logic MinhashIndexSpec
  * already pins, instead of a second copy drifting on its own.
  */
private[functions] object IndexDeltas {

  /** Deltas of `versionDir`, minus those tagged `excludeTag` —
    * streaming replay must score against the PRE-append view of the
    * index (the Dedup.readHashIndex convention): deltas committed by
    * an earlier run of the SAME micro-batch are excluded so a crash
    * between append and checkpoint commit re-scores identically
    * instead of matching the batch's own signatures.
    */
  def liveDeltas(spark: SparkSession, versionDir: String,
                 excludeTag: Option[String]): Seq[String] = {
    val all = graft.operators.Versioned.listDeltas(spark, versionDir)
    excludeTag match {
      case None => all
      case Some(t) =>
        val conf = spark.sessionState.newHadoopConf()
        all.filterNot { d =>
          val p = new org.apache.hadoop.fs.Path(d, s"_TAG_$t")
          p.getFileSystem(conf).exists(p)
        }
    }
  }

  /** Table `sub` of a committed version: base + live deltas. */
  def fold(spark: SparkSession, versionDir: String, sub: String,
           excludeTag: Option[String]): DataFrame =
    liveDeltas(spark, versionDir, excludeTag)
      .foldLeft(spark.read.parquet(s"$versionDir/$sub")) { (acc, d) =>
        acc.unionByName(spark.read.parquet(s"$d/$sub"))
      }

  /** Drop the `_TAG_<tag>` marker file into a delta dir. */
  def writeTag(spark: SparkSession, deltaDir: String, tag: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(deltaDir, s"_TAG_$tag")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(p, true).close()
  }

  /** Fold deltas into a fresh base version. Replay safety follows
    * [[Dedup.compactHashIndex]]: for each streaming query id, the
    * HIGHEST-batch tagged delta is the only one that can still
    * replay — it carries over verbatim (tables + tag files); every
    * other delta folds. Untagged (batch-append) deltas always fold.
    * Runs under commitNew's lock; returns the new version dir.
    */
  def compactTabular(spark: SparkSession, indexPath: String,
                     subs: Seq[String], what: String): String =
    graft.operators.Versioned.commitNew(spark, indexPath) { nv =>
      val vdir = graft.operators.Versioned.resolve(spark, indexPath)
        .getOrElse(sys.error(s"no committed $what index at $indexPath"))
      val conf = spark.sessionState.newHadoopConf()
      def tagsOf(d: String): Seq[String] = {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(conf).listStatus(p).toSeq
          .map(_.getPath.getName).filter(_.startsWith("_TAG_"))
      }
      def parsed(tags: Seq[String]): Seq[(String, Long)] =
        tags.flatMap { t =>
          val body = t.stripPrefix("_TAG_")
          val i = body.lastIndexOf("_b")
          if (i < 0) None
          else body.drop(i + 2).toLongOption.map(b => (body.take(i), b))
        }
      val deltas = graft.operators.Versioned.listDeltas(spark, vdir)
        .map(d => d -> tagsOf(d))
      val maxBatch = deltas.flatMap(d => parsed(d._2))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val (carry, foldAway) = deltas.partition { case (_, tags) =>
        parsed(tags).exists { case (qid, b) => maxBatch(qid) == b }
      }
      subs.foreach { sub =>
        foldAway.map(_._1)
          .foldLeft(spark.read.parquet(s"$vdir/$sub")) { (acc, d) =>
            acc.unionByName(spark.read.parquet(s"$d/$sub"))
          }
          .write.parquet(s"$nv/$sub")
      }
      carry.zipWithIndex.foreach { case ((d, tags), i) =>
        val nd = s"$nv/delta_$i"
        subs.foreach { sub =>
          spark.read.parquet(s"$d/$sub").write.parquet(s"$nd/$sub")
        }
        val fs = new org.apache.hadoop.fs.Path(nd).getFileSystem(conf)
        tags.foreach { t =>
          fs.create(new org.apache.hadoop.fs.Path(nd, t), true).close()
        }
      }
    }
}
