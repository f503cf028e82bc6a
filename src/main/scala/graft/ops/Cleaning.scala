package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cleaning operators P3–P10 (SURVEY.md §2.2): null rejection,
  * key-subset dedup, timestamp parsing.
  */
object Cleaning {

  /** P3/P4: reject rows where any of `cols` is null (01:54-60, 03:77). */
  def requireNonNull(df: DataFrame, cols: String*): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** P10 faithful form: reference `dropDuplicates(keys)` (01:53, 04:48).
    * Survivor is nondeterministic under parallelism — fine for pipelines
    * whose inputs are unique on `keys`, NOT for oracle-checked paths
    * with real duplicates (SURVEY §7.4.2).
    */
  def dedupByKey(df: DataFrame, keys: String*): DataFrame =
    df.dropDuplicates(keys)

  /** P10 deterministic form: keep the row with the smallest `tieBreak`
    * per key group (row_number over an explicit total order). Used in
    * every oracle-verified path; semantically a deterministic refinement
    * of dropDuplicates.
    *
    * Scale note: one shuffle on `keys` (same as dropDuplicates); the
    * window is per-key and AQE handles skewed keys.
    */
  def dedupByKeyDeterministic(df: DataFrame, keys: Seq[String], tieBreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** F1: `to_timestamp` with the reference's default-format semantics
    * (01:55, 03:78); format pinned where oracle parity demands. */
  def parseTs(c: Column): Column = to_timestamp(c)
}
