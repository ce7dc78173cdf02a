package graft.operators

import graft.plans.ZOrderCode.z_order
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout clustering for scan pruning — the write-side half of
  * "filters reach the scan". Columnar readers skip files and row
  * groups whose min/max stats exclude a predicate; those stats are
  * only tight if the write CLUSTERED the data. At 100 TB the
  * difference between a clustered and an arrival-ordered corpus is
  * routinely 100× scan volume on selective queries.
  */
object Layout {

  /** Cluster by the Z-curve of two numeric columns: range-partition on
    * the interleaved code, sort within partitions, ready to write.
    * Downstream box predicates on EITHER column prune; a plain
    * (a, b) lexicographic cluster only prunes on `a`.
    */
  def clusterByZ(df: DataFrame, colA: String, colB: String,
                 partitions: Int = 0): DataFrame = {
    val z = z_order(col(colA), col(colB))
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(parts, z).sortWithinPartitions(z)
  }

  /** Plain single-dimension clustering (range partition + local sort)
    * — right when queries filter one column only.
    */
  def clusterBy(df: DataFrame, c: String, partitions: Int = 0): DataFrame = {
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(parts, col(c)).sortWithinPartitions(col(c))
  }
}
