package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Reference-parity input logging without the extra jobs.
  *
  * Every reference job eagerly counts each input before transforming
  * it (`01_sales_revenue_etl.py:50` and siblings log `df.count()` per
  * table) — at scale that is one full extra scan per input per run.
  * `observe` attaches the same row count (plus a null-key tally, the
  * thing those logs exist to catch) as accumulator-style metrics
  * computed DURING the pipeline's own action: identical information,
  * zero additional jobs.
  */
object InputMetrics {

  /** Wrap an input with a named observation. Read `obs.get` after the
    * first action over the returned frame. */
  def observed(df: DataFrame, name: String,
               keyCol: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val wrapped = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("null_keys"))
    (wrapped, obs)
  }
}
