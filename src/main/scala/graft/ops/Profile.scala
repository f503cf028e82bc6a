package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{count, lit}
import graft.io.Tables
import graft.llm.Gen._

/** One-pass table profiling: per-column null counts, exact distinct
  * counts, and min/max over an order proxy (the raw value for numeric
  * columns, epoch seconds for timestamps, string length for varchar —
  * chosen so every emitted stat is a DOUBLE with engine-exact
  * formatting, never a dialect-dependent value-to-string cast).
  *
  * The data-quality summary every ingestion run computes before
  * promoting a batch: all 44 statistics (11 columns × 4) come from ONE
  * scan — a single hash-less global aggregate — then a `stack` unpivot
  * reshapes the 1×45 row into the (column, stats) long form. The
  * unpivot touches one row, so the operator's cost IS the scan.
  *
  * Scale note: multiple exact `count(DISTINCT)`s in one aggregate make
  * Catalyst plan an Expand (one duplicated stream per distinct column
  * — 11× the scan rows into the partial aggregate). That is the
  * standard price of exact one-pass profiling; at 100 TB swap
  * `count(DISTINCT c)` for `approx_count_distinct(c)` (HLL, no
  * Expand), the same trade [[graft.curated.Aggregations]] documents
  * for its `_approx` variant. Everything else is a plain partial agg.
  */
object Profile {

  /** (column, kind) — kind picks the order proxy: num → value,
    * ts → epoch seconds, str → length. */
  private val cols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
    "l_linenumber" -> "num", "l_quantity" -> "num",
    "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
    "l_returnflag" -> "str", "l_linestatus" -> "str",
    "l_shipdate" -> "ts")

  private def basis(kind: String): String = kind match {
    case "num" => "value"
    case "ts"  => "epoch"
    case _     => "length"
  }

  private def ordExpr(c: String, kind: String, d: Dialect): String =
    (kind, d) match {
      case ("num", _)     => s"CAST($c AS DOUBLE)"
      case ("ts", SparkD) => s"CAST(unix_timestamp($c) AS DOUBLE)"
      case ("ts", DuckD)  => s"date_part('epoch', $c)"
      case (_, _)         => s"CAST(length($c) AS DOUBLE)"
    }

  private def aggExprs(d: Dialect): Seq[String] =
    Seq("CAST(count(*) AS BIGINT) AS n_rows") ++
      cols.zipWithIndex.flatMap { case ((c, kind), i) =>
        val ord = ordExpr(c, kind, d)
        Seq(
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$i",
          s"CAST(count(DISTINCT $c) AS BIGINT) AS nd_$i",
          s"min($ord) AS mn_$i", s"max($ord) AS mx_$i")
      }

  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val stackArgs = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"'$c', '${basis(kind)}', nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    Tables.lineitem(spark, dir)
      .selectExpr(aggExprs(SparkD): _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, basis, n_null, n_distinct, min_ord, max_ord)")
      .select("column_name", "basis", "n_rows", "n_null", "n_distinct",
        "min_ord", "max_ord")
      .orderBy("column_name")
  }

  /** Join-key skew summary for the lineitem order key — the diagnostic
    * read before choosing salting ([[Scale.saltedJoin]]) or AQE skew
    * thresholds: rows, distinct keys, the heaviest key's row count,
    * the uniform-expected mean, and their ratio. Two hash aggs (key
    * count then single-row summary), both map-side combined; the
    * max/mean ratio is the number that says whether the shuffle's
    * largest partition is a straggler. */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("per_key"))
      .selectExpr(
        "CAST(sum(per_key) AS BIGINT) AS n_rows",
        "CAST(count(*) AS BIGINT) AS n_keys",
        "CAST(max(per_key) AS BIGINT) AS max_per_key")
      .selectExpr("n_rows", "n_keys", "max_per_key",
        "n_rows / CAST(n_keys AS DOUBLE) AS mean_per_key",
        "max_per_key / (n_rows / CAST(n_keys AS DOUBLE)) AS skew_ratio")

  val keySkewOracle: String =
    """WITH g AS (SELECT l_orderkey, count(*) AS per_key
          FROM lineitem GROUP BY l_orderkey),
        s AS (SELECT CAST(sum(per_key) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(max(per_key) AS BIGINT) AS max_per_key FROM g)
        SELECT n_rows, n_keys, max_per_key,
          n_rows / CAST(n_keys AS DOUBLE) AS mean_per_key,
          max_per_key / (n_rows / CAST(n_keys AS DOUBLE)) AS skew_ratio
        FROM s"""

  /** The three fixed-decimal columns the correlation pass quantizes
    * (column → scale): quantity has 2 decimals, discount/tax 4. */
  private val corrCols: Seq[(String, Int)] =
    Seq("l_quantity" -> 100, "l_discount" -> 10000, "l_tax" -> 10000)

  /** Pairwise Pearson correlations from exact integer moments — the
    * decomposable-statistics pattern for covariance/correlation at
    * scale: quantize each fixed-decimal column to integers, sum the
    * first and second moments in ONE map-side-combined pass (sums of
    * BIGINTs are order-independent, so re-partitioning can never
    * change a bit), then assemble each correlation with the textbook
    * n·Sxy − Sx·Sy formula as a fixed arithmetic tree over DOUBLE
    * casts of those exact sums — the same IEEE ops in both engines.
    * Quantization scales cancel in Pearson r, so no unscaling step.
    * Contrast with naive corr()/covar_samp(): float accumulation
    * order there depends on partitioning, which is exactly what a
    * 1000-executor run cannot keep stable. */
  def momentCorr(spark: SparkSession, dir: String): DataFrame = {
    val moments = momentExprs
    Tables.lineitem(spark, dir)
      .selectExpr(corrCols.map { case (c, s) =>
        s"CAST(round($c * $s) AS BIGINT) AS q_$c" }: _*)
      .selectExpr(moments: _*)
      .selectExpr(corrExprs: _*)
  }

  private def momentExprs: Seq[String] =
    Seq("CAST(count(*) AS BIGINT) AS n") ++
      corrCols.flatMap { case (c, _) =>
        Seq(s"CAST(sum(q_$c) AS BIGINT) AS s_$c",
          s"CAST(sum(q_$c * q_$c) AS BIGINT) AS ss_$c")
      } ++
      corrCols.combinations(2).map { case Seq((a, _), (b, _)) =>
        s"CAST(sum(q_$a * q_$b) AS BIGINT) AS sp_${a}_$b"
      }.toSeq

  private def corrExprs: Seq[String] =
    Seq("n") ++ corrCols.combinations(2).map { case Seq((a, _), (b, _)) =>
      val (n, sa, sb, ssa, ssb, sp) =
        ("CAST(n AS DOUBLE)", s"CAST(s_$a AS DOUBLE)", s"CAST(s_$b AS DOUBLE)",
          s"CAST(ss_$a AS DOUBLE)", s"CAST(ss_$b AS DOUBLE)",
          s"CAST(sp_${a}_$b AS DOUBLE)")
      s"($n * $sp - $sa * $sb) / (sqrt($n * $ssa - $sa * $sa) " +
        s"* sqrt($n * $ssb - $sb * $sb)) AS corr_${a.drop(2)}_${b.drop(2)}"
    }.toSeq

  val momentCorrOracle: String =
    s"""WITH q AS (SELECT ${corrCols.map { case (c, s) =>
          s"CAST(round($c * $s) AS BIGINT) AS q_$c" }.mkString(", ")}
          FROM lineitem),
        m AS (SELECT ${momentExprs.mkString(", ")} FROM q)
        SELECT ${corrExprs.mkString(", ")} FROM m"""

  val tableProfileOracle: String = {
    val rows = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"""SELECT '$c' AS column_name, '${basis(kind)}' AS basis, n_rows,
            nn_$i AS n_null, nd_$i AS n_distinct,
            mn_$i AS min_ord, mx_$i AS max_ord FROM p"""
    }.mkString(" UNION ALL ")
    s"""WITH p AS (SELECT ${aggExprs(DuckD).mkString(", ")} FROM lineitem)
        $rows ORDER BY column_name"""
  }
}
