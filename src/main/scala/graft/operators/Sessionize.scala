package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time sessionization (gap-based session windows).
  *
  * Batch form uses Spark's native `session_window` — a single
  * groupBy whose window merges rows closer than `gap`; state never
  * materializes per event, and the shuffle is keyed by (user, window)
  * like any aggregation. The streaming form (custom state via
  * flatMapGroupsWithState) lives in [[graft.streaming.Streams]].
  */
object Sessionize {
  def batch(events: DataFrame, userCol: String, tsCol: String, valueCol: String,
            gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(valueCol), 2).as("total_value"),
        min(tsCol).as("first_ts"), max(tsCol).as("last_ts"))
      .select(col(userCol),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("last_ts"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("total_value"))
}
