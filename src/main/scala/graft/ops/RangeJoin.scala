package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.io.Tables

/** Interval range join — `facts.point BETWEEN intervals.start AND
  * intervals.end` — rewritten as a bin-bucketed EQUI-join.
  *
  * Spark has no native range-join operator: a non-equi join plans as
  * BroadcastNestedLoopJoin when one side fits the broadcast limit and
  * as a cartesian product when neither does — O(|facts|·|intervals|)
  * comparisons, the classic 100 TB scale-killer. The standard rewrite
  * (the same bin-bucketing idea published for Databricks' range-join
  * optimization and in the interval-join literature) makes it an
  * equi-join:
  *
  *   - pick `binWidth` ≈ the maximum interval width;
  *   - each interval emits one row per bin it overlaps
  *     (`floor(start/w) .. floor(end/w)` — ≤ width/w + 1 rows, so ~2
  *     when binWidth is chosen right);
  *   - each fact joins on its single bin `floor(point/w)`;
  *   - a residual `point BETWEEN start AND end` filters the bin-mates
  *     that don't actually overlap.
  *
  * Every qualifying (fact, interval) pair appears EXACTLY once — the
  * fact's bin is covered by the interval (start ≤ point ≤ end implies
  * floor(start/w) ≤ floor(point/w) ≤ floor(end/w)) and an interval
  * lists each covered bin once — so no dedup pass is needed. The plan
  * is a plain shuffle (or broadcast, if the planner sees the expanded
  * interval side is small) hash join on the bin key: it survives any
  * fact volume and any interval count, with skew handled by AQE like
  * any other equi-join. `PlanContractSpec` pins cartesian-freedom
  * under forced-low broadcast thresholds.
  */
object RangeJoin {

  /** Exact floor division for integer SQL columns (Spark's `DIV`
    * truncates toward zero, which would mis-bin negative points). */
  private def floorDiv(x: String, w: Int): String =
    s"(($x DIV $w) - (CASE WHEN $x % $w < 0 THEN 1 ELSE 0 END))"

  /** Generic binned range join. `pointCol` (on `facts`) and
    * `startCol`/`endCol` (on `intervals`) must be integer-typed
    * columns with `start <= end`; all three survive into the output
    * alongside every other column of both inputs. Choose `binWidth`
    * close to the maximum interval width: wider bins put more
    * non-overlapping bin-mates through the residual filter, narrower
    * bins replicate each interval into more rows. */
  def binned(facts: DataFrame, pointCol: String, intervals: DataFrame,
             startCol: String, endCol: String, binWidth: Int): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedIntervals = intervals.withColumn("__bin",
      explode(expr(s"sequence(${floorDiv(startCol, binWidth)}, ${floorDiv(endCol, binWidth)})")))
    facts.withColumn("__bin", expr(floorDiv(pointCol, binWidth)))
      .join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  private val qtyC   = "CAST(round(l_quantity * 100) AS BIGINT)"
  private val priceC = "CAST(round(l_extendedprice * 100) AS BIGINT)"

  /** Promo-window uplift: the 12 busiest order days (by order count,
    * date tie-break) define ±3-day promo windows; every lineitem whose
    * ship date falls inside a window is attributed to it and rolled up
    * to per-window volume/revenue. Windows OVERLAP (busy days
    * cluster), so this is a genuine range join — an item can belong to
    * several windows — not an as-of/nearest match.
    *
    * Scale shape: the promo relation derives from a full-scan
    * aggregate but is top-k-bounded (12 rows — TakeOrderedAndProject,
    * never a global sort); the range join runs through [[binned]] with
    * binWidth = the 7-day window width, so the fact side joins on one
    * integer bin key. At 100 TB the same plan holds with millions of
    * intervals: the bin join shuffles instead of broadcasting, and
    * nothing is ever O(facts × intervals). Dates are quantized to
    * epoch days (integers) before any arithmetic; money stays in
    * BIGINT cents — bit-exact across engines. */
  def promoUplift(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.orders(spark, dir)
      .selectExpr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS de")
      .groupBy("de").agg(count(lit(1)).as("n_orders"))
    val promos = days
      .orderBy(desc("n_orders"), asc("de")).limit(12)
      .withColumn("promo_id",
        row_number().over(Window.orderBy(desc("n_orders"), asc("de"))))
      .selectExpr("promo_id", "de AS promo_day_e", "n_orders",
        "de - 3 AS start_e", "de + 3 AS end_e")
    val li = Tables.lineitem(spark, dir).selectExpr(
      "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS se",
      s"$qtyC AS qty_c", s"$priceC AS price_c")
    binned(li, "se", promos, "start_e", "end_e", binWidth = 7)
      .groupBy("promo_id", "promo_day_e", "n_orders")
      .agg(count(lit(1)).as("n_items"),
        sum("qty_c").as("sum_qty_c"),
        sum("price_c").as("revenue_cents"))
      .selectExpr("promo_id", "promo_day_e", "n_orders",
        "CAST(n_items AS BIGINT) AS n_items",
        "CAST(sum_qty_c AS BIGINT) AS sum_qty_c",
        "CAST(revenue_cents AS BIGINT) AS revenue_cents")
      .orderBy("promo_id")
  }

  /** Oracle runs the naive non-equi join — DuckDB's IEJoin handles it
    * fine at fixture scale; the Spark side must match it exactly
    * through the bin rewrite. */
  val promoUpliftOracle: String =
    s"""WITH days AS (SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS de,
              count(*) AS n_orders
            FROM orders GROUP BY 1),
        top AS (SELECT de, n_orders FROM days ORDER BY n_orders DESC, de LIMIT 12),
        promos AS (SELECT row_number() OVER (ORDER BY n_orders DESC, de) AS promo_id,
              de AS promo_day_e, n_orders, de - 3 AS start_e, de + 3 AS end_e
            FROM top),
        li AS (SELECT CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS se,
              $qtyC AS qty_c, $priceC AS price_c
            FROM lineitem),
        j AS (SELECT promo_id, promo_day_e, n_orders, qty_c, price_c
              FROM li JOIN promos ON se BETWEEN start_e AND end_e)
        SELECT promo_id, promo_day_e, n_orders,
          count(*) AS n_items,
          CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
          CAST(sum(price_c) AS BIGINT) AS revenue_cents
        FROM j GROUP BY 1, 2, 3 ORDER BY promo_id"""
}
