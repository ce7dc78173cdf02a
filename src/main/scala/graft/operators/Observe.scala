package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** One-pass pipeline metrics via `Dataset.observe`: aggregate metrics
  * (row counts, null counts, sums, min/max) ride the SAME job as the
  * real output — no second scan, no separate count() actions.
  *
  * Why it matters at 100 TB: the naive funnel instrumentation
  * (`df.count()` after each stage) re-executes the whole upstream
  * pipeline per stage — a 4-stage funnel scans the corpus 5 times.
  * Observed metrics are accumulator-backed: they cost one aggregate
  * expression evaluation per row IN the running job and nothing else.
  * Works identically on streaming queries (metrics per micro-batch
  * via the listener), which `.count()` cannot.
  */
object Observe {

  /** Attach named metrics to `df`. Returns the instrumented frame and
    * the [[Observation]] handle — run any action on the frame, then
    * `get` (blocking) yields the metric values for that action.
    *
    * Metric columns must be aggregate expressions (count/sum/min/...),
    * same rule as `Dataset.observe`.
    */
  def withMetrics(df: DataFrame, name: String,
                  first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }

  /** The streaming form: metrics attach by NAME (the [[Observation]]
    * handle is batch-only) and surface per micro-batch in each
    * `StreamingQueryProgress.observedMetrics` — an always-on funnel
    * gauge for ingest pipelines, at the same ride-the-job cost.
    */
  def onStream(df: DataFrame, name: String,
               first: Column, rest: Column*): DataFrame =
    df.observe(name, first, rest: _*)
}
