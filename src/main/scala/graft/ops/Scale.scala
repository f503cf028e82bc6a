package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for skew and co-location (SURVEY §4.4):
  *
  *   - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *     (keys + salt) spreads a hot key over `salts` reducers, then the
  *     final aggregate combines the partials. Identical results to a
  *     direct groupBy for decomposable aggregates (sum/count/min/max).
  *   - [[saltedJoin]]: skew-safe equi-join — the large (skewed) side is
  *     salted with a deterministic hash of its whole row; the small
  *     side is replicated across all salt values, so a hot key's rows
  *     land on `salts` tasks instead of one. AQE's skew-join handles
  *     moderate skew automatically; this is the explicit fallback for
  *     pathological keys.
  *   - [[bucketedTable]]: write-side bucketing — co-locates future
  *     joins/aggregations on the bucket key with NO exchange at read
  *     time (the 100 TB answer to repeated joins on the same key).
  */
object Scale {

  /** Deterministic salt in [0, salts) from a hash of `cols`. */
  def saltCol(salts: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Two-phase (salted) sum+count aggregation over `keys`.
    *
    * The salt hashes only (keys + valueCol), not the whole row: any
    * deterministic per-row spread works for decomposable aggregates,
    * and at 100 TB a full-width hash makes salt cost scale with scan
    * width for no extra spread. (Determinism matters: a rand() salt
    * can double-count rows under shuffle-fetch retry, SPARK-23207.
    * Caveat: a hot key whose values are ALSO constant defeats this
    * spread — add another cheap column to `saltCol` in that case.) */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      saltCol(salts, (keys :+ valueCol).map(col)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Skew-safe inner equi-join of a large skewed side with a small
    * side on `key`: large gets a row-hash salt, small is replicated
    * `salts` times. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      saltCol(salts, large.columns.map(col).toSeq))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed table; subsequent joins or
    * aggregations on `bucketCol` between tables bucketed the same way
    * need no shuffle (plans show SortMergeJoin with no Exchange). */
  def bucketedTable(df: DataFrame, name: String, buckets: Int,
                    bucketCol: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(name)
}
