package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with graft's recommended defaults: AQE on
  * (runtime re-planning, skew-join splitting, partition coalescing),
  * shuffle partitions sized to the local core count rather than the
  * 200 default, UTC session time, and graft's SQL functions
  * registered. On a real cluster the same builder applies — only
  * `master` and the shuffle-partition count (≈ 2-3× total cores)
  * change.
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.plans.GraftExtensions.register(spark)
    graft.plans.ScaleGuard.register(spark) // plan lint, warn mode
    spark
  }
}
