package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.llm.Gen
import graft.llm.Gen.{Dialect, DuckD, SparkD}

/** Classic decision-support queries — the TPC-H shapes (Q1, Q3, Q6, Q7,
  * Q8, Q10, Q13, Q14, Q15, Q17, Q18, Q19, Q22) re-expressed over the
  * reduced fixture star schema (no partsupp / commit-receipt dates /
  * phone, so Q2/Q4/Q12/Q16/Q20/Q21 have no faithful form here; Q7's
  * nation pair widens to a region pair and Q22's "no orders at all"
  * becomes "no orders since 1999" so every query is non-empty at
  * sf0.001). These are the reference workload every warehouse engine
  * is judged against: each is the canonical instance of a plan shape —
  * scan-heavy agg (Q1), selective-filter agg (Q6), mid-join top-k
  * (Q3/Q10/Q18), two-fact chain with broadcast dims (Q5 already in
  * [[Extras.revenueByNation]], Q7/Q8 here), join with disjunctive
  * residual (Q19), correlated-aggregate decorrelation (Q17/Q22), and
  * left-join histogram (Q13).
  *
  * Exactness: money is quantized to integer cents, discount/tax to
  * integer ten-thousandths, BEFORE any arithmetic; sums are over exact
  * integers and every emitted double is produced by ONE fixed-order
  * IEEE expression from those integers, so Spark and DuckDB agree
  * bit-for-bit at every scale factor (the [[Extras.revenueByNation]]
  * discipline). Q1's charge product needs ~2^51 per row and overflows
  * a BIGINT sum at scale, so the per-row product stays BIGINT (exact,
  * ≤ ~2.7e15) and only the SUM widens — DECIMAL(38,0) in Spark,
  * HUGEINT in DuckDB, the one dialect divergence in this file.
  */
object Classics {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.table(s, dir, n)

  // Canonical quantized sub-expressions — identical SQL text in both
  // engines, so oracle queries are the same string wherever possible.
  private val qtyC   = "CAST(round(l_quantity * 100) AS BIGINT)"
  private val priceC = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val discT  = "CAST(round(l_discount * 10000) AS BIGINT)"
  private val taxT   = "CAST(round(l_tax * 10000) AS BIGINT)"
  /** Discounted revenue in cents·1e-4 units: divide a sum by 1e6 for
    * money. Max ~2.6e11 per row — a BIGINT sum holds ~3.5e7 rows per
    * group headroom at sf1 and beyond; at 100 TB widen to DECIMAL like
    * Q1's charge. */
  private val revU   = s"($priceC * (10000 - $discT))"
  private val shipD  = "CAST(l_shipdate AS DATE)"
  private val ordD   = "CAST(o_orderdate AS DATE)"

  // ---------------------------------------------------------------- Q1

  /** Q1 pricing summary: one scan, one hash agg onto the 6-row
    * (returnflag, linestatus) grid — everything dies in the map-side
    * partial aggregate; the exchange carries 6 rows per task. The
    * charge sum is the overflow-aware tier (see object doc). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val chargeU = s"$priceC * (10000 - $discT) * (10000 + $taxT)"
    t(spark, dir, "lineitem")
      .filter(s"$shipD <= DATE '1998-09-02'")
      .selectExpr("l_returnflag", "l_linestatus",
        s"$qtyC AS qty_c", s"$priceC AS price_c", s"$discT AS disc_t",
        s"$revU AS rev_u", s"CAST($chargeU AS DECIMAL(38,0)) AS charge_w")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        expr("CAST(sum(qty_c) AS DOUBLE) / 100.0").as("sum_qty"),
        expr("CAST(sum(price_c) AS DOUBLE) / 100.0").as("sum_base_price"),
        expr("CAST(sum(rev_u) AS DOUBLE) / 1000000.0").as("sum_disc_price"),
        expr("CAST(sum(charge_w) AS DOUBLE) / 10000000000.0").as("sum_charge"),
        expr("CAST(sum(qty_c) AS DOUBLE) / (100.0 * count(*))").as("avg_qty"),
        expr("CAST(sum(price_c) AS DOUBLE) / (100.0 * count(*))").as("avg_price"),
        expr("CAST(sum(disc_t) AS DOUBLE) / (10000.0 * count(*))").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  def pricingSummaryOracle(d: Dialect = DuckD): String = {
    val wide = d match {
      case SparkD => "DECIMAL(38,0)"
      case DuckD  => "HUGEINT"
    }
    s"""WITH q AS (SELECT l_returnflag, l_linestatus,
          $qtyC AS qty_c, $priceC AS price_c, $discT AS disc_t,
          $revU AS rev_u,
          CAST($priceC * (10000 - $discT) * (10000 + $taxT) AS $wide) AS charge_w
          FROM lineitem WHERE $shipD <= DATE '1998-09-02')
        SELECT l_returnflag, l_linestatus,
          CAST(sum(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
          CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
          CAST(sum(rev_u) AS DOUBLE) / 1000000.0 AS sum_disc_price,
          CAST(sum(charge_w) AS DOUBLE) / 10000000000.0 AS sum_charge,
          CAST(sum(qty_c) AS DOUBLE) / (100.0 * count(*)) AS avg_qty,
          CAST(sum(price_c) AS DOUBLE) / (100.0 * count(*)) AS avg_price,
          CAST(sum(disc_t) AS DOUBLE) / (10000.0 * count(*)) AS avg_disc,
          count(*) AS count_order
        FROM q GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""
  }

  // ---------------------------------------------------------------- Q3

  /** Q3 shipping priority: segment-filtered customer dim broadcasts
    * onto orders, the filtered orders shuffle-join lineitem on
    * orderkey, and the top-10 is TakeOrderedAndProject (never a global
    * sort — each partition keeps 10 candidates, the driver merges). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(s"$shipD > DATE '1997-06-15'")
      .selectExpr("l_orderkey", s"$revU AS rev_u")
      .join(t(spark, dir, "orders")
          .filter(s"$ordD < DATE '1997-06-15'")
          .selectExpr("o_orderkey", "o_custkey",
            s"CAST($ordD AS STRING) AS order_date"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer")
          .filter("c_mktsegment = 'BUILDING'").select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "order_date")
      .agg(sum("rev_u").as("rev_u"))
      .selectExpr("l_orderkey", "order_date",
        "CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue")
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)

  val shippingPriorityOracle: String =
    s"""WITH j AS (SELECT l.l_orderkey, CAST($ordD AS VARCHAR) AS order_date,
          ($priceC * (10000 - $discT)) AS rev_u
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_mktsegment = 'BUILDING'
            AND $ordD < DATE '1997-06-15'
            AND $shipD > DATE '1997-06-15'),
        g AS (SELECT l_orderkey, order_date, sum(rev_u) AS rev_u
              FROM j GROUP BY l_orderkey, order_date)
        SELECT l_orderkey, order_date,
          CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue
        FROM g ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // ---------------------------------------------------------------- Q6

  /** Q6 forecast revenue change: a pure filter-and-sum — the query
    * whose entire cost is the scan, and whose filters (date range,
    * discount band, quantity cap) must all reach the parquet reader as
    * pushed predicates; the aggregate is one global sum of exact
    * integer products (price_c × disc_t, ≤ ~7e9 per row). */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      // The exact band predicates sit on round()-quantized expressions,
      // which the parquet reader cannot push. The raw-column guards are
      // deliberately REDUNDANT supersets of the exact bands (conjunction
      // preserves semantics exactly) and DO push — at 100 TB they are
      // what lets row groups outside the band be skipped via min/max.
      .filter("l_discount >= 0.0499 AND l_discount <= 0.0701 AND l_quantity < 24.01")
      .filter(s"$shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'" +
        s" AND $discT BETWEEN 500 AND 700 AND $qtyC < 2400")
      .selectExpr(s"$priceC * $discT AS gain_u")
      .agg(expr("CAST(coalesce(sum(gain_u), 0) AS DOUBLE) / 1000000.0")
        .as("revenue_gain"))

  val forecastRevenueOracle: String =
    s"""SELECT CAST(coalesce(sum($priceC * $discT), 0) AS DOUBLE) / 1000000.0
          AS revenue_gain
        FROM lineitem
        WHERE $shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'
          AND $discT BETWEEN 500 AND 700 AND $qtyC < 2400"""

  // ---------------------------------------------------------------- Q7

  /** Q7 bilateral trade volume (region-pair form): lineitem joins its
    * supplier-side geography and its customer-side geography (via
    * orders), keeps ASIA↔EUROPE flows in either direction, and rolls
    * up by (supp_region, cust_region, year). Plan shape: two fact
    * shuffles (lineitem⋈orders); supplier, customer, nation, region
    * all broadcast — geography never moves the fact table. */
  def bilateralTrade(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        s"CAST(extract(year FROM $shipD) AS BIGINT) AS trade_year", s"$revU AS rev_u")
      .filter("trade_year IN (1997, 1998)")
      .join(broadcast(t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(t(spark, dir, "nation").select("n_nationkey", "n_regionkey"),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(spark, dir, "region").select("r_regionkey", "r_name"),
            col("n_regionkey") === col("r_regionkey"))
          .selectExpr("s_suppkey AS l_suppkey", "r_name AS supp_region")),
        Seq("l_suppkey"))
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer").select("c_custkey", "c_nationkey")
          .join(t(spark, dir, "nation").select("n_nationkey", "n_regionkey"),
            col("c_nationkey") === col("n_nationkey"))
          .join(t(spark, dir, "region").select("r_regionkey", "r_name"),
            col("n_regionkey") === col("r_regionkey"))
          .selectExpr("c_custkey", "r_name AS cust_region")),
        col("o_custkey") === col("c_custkey"))
      .filter("(supp_region = 'ASIA' AND cust_region = 'EUROPE') OR " +
        "(supp_region = 'EUROPE' AND cust_region = 'ASIA')")
      .groupBy("supp_region", "cust_region", "trade_year")
      .agg(count(lit(1)).as("n_lines"), sum("rev_u").as("rev_u"))
      .selectExpr("supp_region", "cust_region", "trade_year", "n_lines",
        "CAST(rev_u AS DOUBLE) / 1000000.0 AS volume")
      .orderBy("supp_region", "cust_region", "trade_year")

  val bilateralTradeOracle: String =
    s"""WITH j AS (SELECT
          r1.r_name AS supp_region, r2.r_name AS cust_region,
          CAST(extract(year FROM $shipD) AS BIGINT) AS trade_year, $revU AS rev_u
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE extract(year FROM $shipD) IN (1997, 1998)
            AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
              OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))),
        g AS (SELECT supp_region, cust_region, trade_year,
                count(*) AS n_lines, sum(rev_u) AS rev_u
              FROM j GROUP BY supp_region, cust_region, trade_year)
        SELECT supp_region, cust_region, trade_year, n_lines,
          CAST(rev_u AS DOUBLE) / 1000000.0 AS volume
        FROM g ORDER BY supp_region, cust_region, trade_year"""

  // ---------------------------------------------------------------- Q8

  /** Q8 national market share: within the ASIA customer market for
    * STANDARD parts over 1997–98, the share of revenue supplied by
    * NATION_2, per order year. The share is a ratio of two exact
    * integer sums computed in the SAME aggregate (a conditional sum —
    * no second pass, no join of two aggregates). */
  def marketShare(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "l_suppkey", s"$revU AS rev_u")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_type = 'STANDARD'").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders")
          .selectExpr("o_orderkey", "o_custkey",
            s"CAST(extract(year FROM $ordD) AS BIGINT) AS order_year")
          .filter("order_year IN (1997, 1998)"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer").select("c_custkey", "c_nationkey")
          .join(t(spark, dir, "nation").select("n_nationkey", "n_regionkey"),
            col("c_nationkey") === col("n_nationkey"))
          .join(t(spark, dir, "region").filter("r_name = 'ASIA'")
            .select("r_regionkey"),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(t(spark, dir, "nation")
            .selectExpr("n_nationkey AS sn_key", "n_name AS supp_nation"),
            col("s_nationkey") === col("sn_key"))
          .select("s_suppkey", "supp_nation")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("order_year")
      .agg(
        expr("sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_u ELSE 0 END)")
          .as("nation_u"),
        sum("rev_u").as("total_u"))
      .selectExpr("order_year",
        "CAST(nation_u AS DOUBLE) / 1000000.0 AS nation_revenue",
        "CAST(total_u AS DOUBLE) / 1000000.0 AS total_revenue",
        "CAST(nation_u AS DOUBLE) / CAST(total_u AS DOUBLE) AS mkt_share")
      .orderBy("order_year")

  val marketShareOracle: String =
    s"""WITH j AS (SELECT CAST(extract(year FROM $ordD) AS BIGINT) AS order_year,
          n1.n_name AS supp_nation, $revU AS rev_u
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          WHERE p.p_type = 'STANDARD' AND r2.r_name = 'ASIA'
            AND extract(year FROM $ordD) IN (1997, 1998)),
        g AS (SELECT order_year,
                sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_u ELSE 0 END)
                  AS nation_u,
                sum(rev_u) AS total_u
              FROM j GROUP BY order_year)
        SELECT order_year,
          CAST(nation_u AS DOUBLE) / 1000000.0 AS nation_revenue,
          CAST(total_u AS DOUBLE) / 1000000.0 AS total_revenue,
          CAST(nation_u AS DOUBLE) / CAST(total_u AS DOUBLE) AS mkt_share
        FROM g ORDER BY order_year"""

  // --------------------------------------------------------------- Q10

  /** Q10 returned-item reporting: which customers returned the most
    * revenue in 1997-Q3. Fact-side filters (returnflag, the quarter)
    * shrink both fact tables BEFORE their shuffle join; the customer
    * and nation dims broadcast onto the aggregate. Top-20 with a full
    * key tiebreak is TakeOrderedAndProject. */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter("l_returnflag = 'R'")
      .selectExpr("l_orderkey", s"$revU AS rev_u")
      .join(t(spark, dir, "orders")
          .filter(s"$ordD >= DATE '1997-07-01' AND $ordD < DATE '1997-10-01'")
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("rev_u").as("rev_u"))
      .join(broadcast(t(spark, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation").select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .selectExpr("c_custkey", "c_name", "c_acctbal", "n_name AS nation",
        "CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue")
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)

  val returnedRevenueOracle: String =
    s"""WITH g AS (SELECT o.o_custkey, sum($revU) AS rev_u
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE l.l_returnflag = 'R'
            AND $ordD >= DATE '1997-07-01' AND $ordD < DATE '1997-10-01'
          GROUP BY o.o_custkey)
        SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
          CAST(g.rev_u AS DOUBLE) / 1000000.0 AS revenue
        FROM g
        JOIN customer c ON g.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        ORDER BY revenue DESC, c.c_custkey LIMIT 20"""

  // --------------------------------------------------------------- Q13

  /** Q13 customer order-count distribution: LEFT join so zero-order
    * customers appear (count of a right-side key counts only matches),
    * per-customer count, then the frequency-of-frequencies rollup. Two
    * hash aggs; the first is the only exchange that sees data. */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select("c_custkey")
      .join(t(spark, dir, "orders")
          .filter("o_orderpriority <> '4-NOT SPECIFIED'")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  val customerOrderDistributionOracle: String =
    """WITH per AS (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM per GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC"""

  // --------------------------------------------------------------- Q14

  /** Q14 promotion effect: promo share of 1997 revenue. Part broadcast
    * onto the date-pruned lineitem scan; both sums come out of ONE
    * aggregate; the percentage is (100.0 · promo) / total with fixed
    * parenthesization so both engines emit the identical double. */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(s"$shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'")
      .selectExpr("l_partkey", s"$revU AS rev_u")
      .join(broadcast(t(spark, dir, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        expr("sum(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END)")
          .as("promo_u"),
        sum("rev_u").as("total_u"))
      .selectExpr(
        "CAST(promo_u AS DOUBLE) / 1000000.0 AS promo_revenue",
        "CAST(total_u AS DOUBLE) / 1000000.0 AS total_revenue",
        "(100.0 * CAST(promo_u AS DOUBLE)) / CAST(total_u AS DOUBLE) AS promo_pct")

  val promoRevenueShareOracle: String =
    s"""WITH g AS (SELECT
          sum(CASE WHEN p.p_type = 'PROMO' THEN $revU ELSE 0 END) AS promo_u,
          sum($revU) AS total_u
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE $shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01')
        SELECT CAST(promo_u AS DOUBLE) / 1000000.0 AS promo_revenue,
          CAST(total_u AS DOUBLE) / 1000000.0 AS total_revenue,
          (100.0 * CAST(promo_u AS DOUBLE)) / CAST(total_u AS DOUBLE) AS promo_pct
        FROM g"""

  // --------------------------------------------------------------- Q15

  /** Q15 top supplier(s) for 1997-Q1: per-supplier revenue, then keep
    * the rows equal to the global max. The max arrives as a
    * broadcast single-row join (the scalar-subquery plan) and the
    * equality is tested on the EXACT integer sum — never the derived
    * double — so ties are real ties, not float accidents. */
  def topSupplierByRevenue(spark: SparkSession, dir: String): DataFrame = {
    val perSupp = t(spark, dir, "lineitem")
      .filter(s"$shipD >= DATE '1997-01-01' AND $shipD < DATE '1997-04-01'")
      .selectExpr("l_suppkey", s"$revU AS rev_u")
      .groupBy("l_suppkey").agg(sum("rev_u").as("rev_u"))
    perSupp
      .join(broadcast(perSupp.agg(max("rev_u").as("max_u"))))
      .filter(col("rev_u") === col("max_u"))
      .join(broadcast(t(spark, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .selectExpr("s_suppkey", "s_name",
        "CAST(rev_u AS DOUBLE) / 1000000.0 AS total_revenue")
      .orderBy("s_suppkey")
  }

  val topSupplierByRevenueOracle: String =
    s"""WITH per AS (SELECT l_suppkey, sum($revU) AS rev_u
          FROM lineitem
          WHERE $shipD >= DATE '1997-01-01' AND $shipD < DATE '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey, s.s_name,
          CAST(per.rev_u AS DOUBLE) / 1000000.0 AS total_revenue
        FROM per
        JOIN supplier s ON per.l_suppkey = s.s_suppkey
        WHERE per.rev_u = (SELECT max(rev_u) FROM per)
        ORDER BY s.s_suppkey"""

  // --------------------------------------------------------------- Q17

  /** Q17 small-quantity-order revenue: lines of one brand whose
    * quantity is below 20% of their part's average. The correlated
    * average decorrelates to a per-part aggregate joined back onto the
    * same (brand-pruned) line set, and the 0.2·avg comparison
    * cross-multiplies to exact integers: qty < sum/(5n) ⇔
    * 5·qty_c·n < sum_qty_c. The brand filter broadcasts through part
    * FIRST, so both the agg and the join see only that brand's lines. */
  def smallOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brandLines = t(spark, dir, "lineitem")
      .selectExpr("l_partkey", s"$qtyC AS qty_c", s"$priceC AS price_c")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_brand = 'Brand#23'").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLines.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_lines"), sum("qty_c").as("sum_qty_c"))
    brandLines
      .join(perPart.select(col("l_partkey").as("pk"), col("n_lines"),
        col("sum_qty_c")), col("l_partkey") === col("pk"))
      .filter("5 * qty_c * n_lines < sum_qty_c")
      .agg(expr("CAST(coalesce(sum(price_c), 0) AS DOUBLE) / 700.0")
        .as("avg_yearly"))
  }

  val smallOrderRevenueOracle: String =
    s"""WITH b AS (SELECT l.l_partkey, $qtyC AS qty_c, $priceC AS price_c
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#23'),
        per AS (SELECT l_partkey, count(*) AS n_lines,
                  sum(qty_c) AS sum_qty_c
                FROM b GROUP BY l_partkey)
        SELECT CAST(coalesce(sum(b.price_c), 0) AS DOUBLE) / 700.0 AS avg_yearly
        FROM b
        JOIN per ON b.l_partkey = per.l_partkey
        WHERE 5 * b.qty_c * per.n_lines < per.sum_qty_c"""

  // --------------------------------------------------------------- Q18

  /** Q18 large-quantity orders: orders whose total quantity exceeds
    * 250 units. The HAVING aggregate runs on lineitem alone (map-side
    * combined on orderkey), and only the few surviving orderkeys join
    * orders + customer — the classic agg-then-join inversion that
    * keeps the join input tiny. */
  def largeQuantityOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .selectExpr("l_orderkey", s"$qtyC AS qty_c")
      .groupBy("l_orderkey").agg(sum("qty_c").as("sum_qty_c"))
      .filter("sum_qty_c > 25000")
      .join(t(spark, dir, "orders")
          .selectExpr("o_orderkey", "o_custkey", "o_totalprice",
            s"CAST($ordD AS STRING) AS order_date"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer").select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .selectExpr("c_custkey", "c_name", "o_orderkey", "order_date",
        "o_totalprice", "CAST(sum_qty_c AS DOUBLE) / 100.0 AS total_qty")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))

  val largeQuantityOrdersOracle: String =
    s"""WITH big AS (SELECT l_orderkey, sum($qtyC) AS sum_qty_c
          FROM lineitem GROUP BY l_orderkey HAVING sum($qtyC) > 25000)
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
          CAST($ordD AS VARCHAR) AS order_date,
          o.o_totalprice, CAST(big.sum_qty_c AS DOUBLE) / 100.0 AS total_qty
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey"""

  // --------------------------------------------------------------- Q19

  /** Q19 disjunctive band revenue: an equi-join on partkey whose
    * residual is a three-way OR over (brand, size, quantity) bands —
    * the shape that stresses predicate handling because none of the
    * disjuncts can prune the scan alone. Catalyst keeps partkey as the
    * join key (broadcast hash join on the part dim) and evaluates the
    * disjunction as a post-join filter; at 100 TB the win is that the
    * fact side still moves ZERO bytes (broadcast), and the OR runs
    * codegen'd per row. */
  def disjunctiveBandRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .selectExpr("l_partkey", s"$qtyC AS qty_c", s"$revU AS rev_u")
      .join(broadcast(t(spark, dir, "part")
          .select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND qty_c BETWEEN 100 AND 2000) OR " +
        "(p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND qty_c BETWEEN 1000 AND 3000) OR " +
        "(p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50 AND qty_c BETWEEN 2000 AND 5000)")
      .agg(count(lit(1)).as("n_lines"),
        expr("CAST(coalesce(sum(rev_u), 0) AS DOUBLE) / 1000000.0")
          .as("revenue"))

  val disjunctiveBandRevenueOracle: String =
    s"""SELECT count(*) AS n_lines,
          CAST(coalesce(sum($revU), 0) AS DOUBLE) / 1000000.0 AS revenue
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                AND $qtyC BETWEEN 100 AND 2000)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
                AND $qtyC BETWEEN 1000 AND 3000)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
                AND $qtyC BETWEEN 2000 AND 5000)"""

  // --------------------------------------------------------------- Q22

  /** Q22 global sales opportunity (lapsed form): customers whose
    * balance beats the positive-balance average but who placed no
    * order since 1999, rolled up by nation. The scalar average arrives
    * as a broadcast single-row join and the comparison
    * cross-multiplies to exact integers (bal_c · n > sum_c ⇔
    * bal > avg); the "no recent order" is a left_anti against the
    * date-pruned orders projection. */
  def lapsedRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val bal = t(spark, dir, "customer")
      .selectExpr("c_custkey", "c_nationkey",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c")
    val avgPos = bal.filter("bal_c > 0")
      .agg(sum("bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
    bal
      .join(broadcast(avgPos))
      .filter("bal_c * n_pos > sum_c")
      .join(t(spark, dir, "orders")
          .filter(s"$ordD >= DATE '1999-01-01'")
          .selectExpr("o_custkey AS c_custkey"),
        Seq("c_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"), sum("bal_c").as("bal_c"))
      .selectExpr("c_nationkey", "n_customers",
        "CAST(bal_c AS DOUBLE) / 100.0 AS total_balance")
      .orderBy("c_nationkey")
  }

  val lapsedRichCustomersOracle: String =
    s"""WITH bal AS (SELECT c_custkey, c_nationkey,
          CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c FROM customer),
        avgpos AS (SELECT sum(bal_c) AS sum_c, count(*) AS n_pos
                   FROM bal WHERE bal_c > 0),
        rich AS (SELECT bal.* FROM bal, avgpos
                 WHERE bal.bal_c * avgpos.n_pos > avgpos.sum_c
                   AND NOT EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = bal.c_custkey
                       AND $ordD >= DATE '1999-01-01'))
        SELECT c_nationkey, count(*) AS n_customers,
          CAST(sum(bal_c) AS DOUBLE) / 100.0 AS total_balance
        FROM rich GROUP BY c_nationkey ORDER BY c_nationkey"""

  // ================================================================
  // Round-8 completion tier: the nine shapes the fixture schema kept
  // out of the original battery (no partsupp / commit-receipt dates /
  // shipmode / comments), adapted the same way Q7/Q22 already were —
  // each preserves its query's CANONICAL PLAN SHAPE (the thing a
  // warehouse engine is actually graded on) with fixture-expressible
  // semantics, documented per query. Q5's shape already lives in
  // [[Extras]]; the eight below close the 22-query battery.
  // ================================================================

  // ---------------------------------------------------------------- Q2

  /** Q2 minimum-cost supplier (adapted): partsupp.ps_supplycost does
    * not exist, so a supplier's "offer" for a part is its best
    * observed unit price from lineitem — min((price·10^6) DIV qty_c),
    * an exact non-negative integer in 10^-4 dollars (floor division
    * agrees between engines on non-negative operands, the
    * [[graft.llm.Gen.intDiv]] contract). The shape is Q2's: a
    * correlated per-part MIN decorrelates to an aggregate joined back
    * on (partkey, exact-min equality), with the part filter and the
    * supplier→nation→region reduction broadcast in front of both the
    * aggregate and the rejoin. Ties at the min are REAL ties (integer
    * equality), all kept, made total by the (partkey, suppkey)
    * tie-break. At 100 TB the per-(part,supp) agg is map-side
    * combined on the scan and the rejoin carries one row per part. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val offerU = Gen.intDiv(s"($priceC * 10000)", qtyC, SparkD)
    val euroSupp = broadcast(
      t(spark, dir, "supplier")
        .join(broadcast(t(spark, dir, "nation")
            .join(broadcast(t(spark, dir, "region")
                .filter("r_name = 'EUROPE'").select("r_regionkey")),
              col("n_regionkey") === col("r_regionkey"))
            .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    val offers = t(spark, dir, "lineitem")
      .selectExpr("l_partkey", "l_suppkey", s"$offerU AS offer_u")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'")
          .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
      .agg(min("offer_u").as("cost_u"))
    val perPart = offers.groupBy("p_partkey").agg(min("cost_u").as("min_u"))
      .withColumnRenamed("p_partkey", "mk")
    offers
      .join(perPart, col("p_partkey") === col("mk"))
      .filter("cost_u = min_u")
      .selectExpr("s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey",
        "CAST(cost_u AS DOUBLE) / 10000.0 AS unit_cost")
      .orderBy(desc("s_acctbal"), asc("p_partkey"), asc("s_suppkey"))
      .limit(100)
  }

  val minCostSupplierOracle: String = {
    val offerU = Gen.intDiv(s"($priceC * 10000)", qtyC, DuckD)
    s"""WITH offers AS (
          SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
                 min($offerU) AS cost_u
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
            AND r.r_name = 'EUROPE'
          GROUP BY 1, 2, 3, 4, 5)
        SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey,
          CAST(cost_u AS DOUBLE) / 10000.0 AS unit_cost
        FROM offers o
        WHERE cost_u = (SELECT min(cost_u) FROM offers i
                        WHERE i.p_partkey = o.p_partkey)
        ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100"""
  }

  // ---------------------------------------------------------------- Q4

  /** Q4 order priority checking (adapted): "a line missed its commit
    * date" becomes "a line shipped more than 45 days after the order
    * date" — the fixture has no commit/receipt dates, the ship lag is
    * the same lateness signal. The shape is Q4's EXISTS: a LEFT SEMI
    * join from the date-pruned orders onto lineitem whose condition
    * carries the correlated date inequality alongside the orderkey
    * equi-pair — Catalyst keeps orderkey as the shuffle key and
    * evaluates the lag residual inside the join, so an order is
    * emitted at most once no matter how many late lines it has. */
  def lateOrderPriority(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(s"$ordD >= DATE '1997-01-01' AND $ordD < DATE '1997-07-01'")
      .selectExpr("o_orderkey", "o_orderpriority", s"$ordD AS od")
      .join(t(spark, dir, "lineitem")
          .selectExpr("l_orderkey", s"$shipD AS sd"),
        col("o_orderkey") === col("l_orderkey") &&
          col("sd") > expr("date_add(od, 45)"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  val lateOrderPriorityOracle: String =
    s"""SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE $ordD >= DATE '1997-01-01' AND $ordD < DATE '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND $shipD > $ordD + 45)
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------- Q9

  /** Q9 product-type profit (adapted): ps_supplycost does not exist,
    * so cost is a fixed 60% of the part's retail price — the profit
    * formula keeps Q9's structure (revenue minus quantity·cost) and
    * the plan keeps Q9's shape: the name-filtered part dim and the
    * supplier→nation dim both broadcast onto one lineitem scan, and
    * the (nation, year) rollup is map-side combined. Units: rev_u and
    * qty_c·retail_c·60 are both dollars·10^6, exact BIGINTs (max
    * ~1e11/row — a BIGINT group sum holds ~9e7 rows headroom; at
    * 100 TB widen the SUM to DECIMAL(38,0) like Q1's charge). */
  def productTypeProfit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .selectExpr("l_partkey", "l_suppkey", s"$qtyC AS qty_c",
        s"$revU AS rev_u", s"year($shipD) AS o_year")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_name LIKE '%widget%'")
          .selectExpr("p_partkey",
            "CAST(round(p_retailprice * 100) AS BIGINT) AS retail_c")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(spark, dir, "supplier")
          .join(broadcast(t(spark, dir, "nation")
              .select("n_nationkey", "n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name")),
        col("l_suppkey") === col("s_suppkey"))
      .selectExpr("n_name AS nation", "o_year",
        "rev_u - qty_c * retail_c * 60 AS profit_u")
      .groupBy("nation", "o_year")
      .agg(sum("profit_u").as("profit_u"))
      .selectExpr("nation", "o_year",
        "CAST(profit_u AS DOUBLE) / 1000000.0 AS sum_profit")
      .orderBy(asc("nation"), desc("o_year"))

  val productTypeProfitOracle: String =
    s"""WITH j AS (SELECT n.n_name AS nation, year($shipD) AS o_year,
          $revU - $qtyC * CAST(round(p.p_retailprice * 100) AS BIGINT) * 60
            AS profit_u
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%widget%')
        SELECT nation, o_year,
          CAST(sum(profit_u) AS DOUBLE) / 1000000.0 AS sum_profit
        FROM j GROUP BY nation, o_year
        ORDER BY nation, o_year DESC"""

  // --------------------------------------------------------------- Q11

  /** Q11 important stock (adapted): partsupp availability does not
    * exist, so a part's "held value" from one region's suppliers is
    * its discounted shipped revenue (a region, not a nation — the
    * sf0.001 fixture has nations with ZERO suppliers, and the query
    * must be non-empty at every scale). The threshold is relative to
    * the MEAN part value (> 2×), not a fixed corpus fraction —
    * TPC-H's own 0.0001/SF scaling lesson: a fixed share empties as
    * the part count grows. The shape is Q11's scalar-subquery
    * HAVING: the same aggregate computed twice — per part and
    * globally — with the global (total, count) arriving as a
    * broadcast one-row join and the mean comparison tested by exact
    * integer cross-multiplication (val·n > 2·total ⇔ val > 2·mean),
    * never a float share. */
  def importantPartValue(spark: SparkSession, dir: String): DataFrame = {
    val ameriSupp = broadcast(t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
          .join(broadcast(t(spark, dir, "region")
              .filter("r_name = 'AMERICA'").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey"))
    val perPart = t(spark, dir, "lineitem")
      .selectExpr("l_partkey", "l_suppkey", s"$revU AS val_u")
      .join(ameriSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey").agg(sum("val_u").as("val_u"))
    perPart
      .join(broadcast(perPart.agg(sum("val_u").as("total_u"),
        count(lit(1)).as("n_parts"))))
      .filter("val_u * n_parts > 2 * total_u")
      .selectExpr("l_partkey AS p_partkey",
        "CAST(val_u AS DOUBLE) / 1000000.0 AS part_value")
      .orderBy(desc("part_value"), asc("p_partkey"))
  }

  val importantPartValueOracle: String =
    s"""WITH v AS (SELECT l.l_partkey, sum($revU) AS val_u
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'AMERICA'
          GROUP BY l.l_partkey)
        SELECT l_partkey AS p_partkey,
          CAST(val_u AS DOUBLE) / 1000000.0 AS part_value
        FROM v
        WHERE val_u * (SELECT count(*) FROM v) >
              2 * (SELECT sum(val_u) FROM v)
        ORDER BY part_value DESC, p_partkey"""

  // --------------------------------------------------------------- Q12

  /** Q12 shipmode priority (adapted): l_shipmode does not exist, so
    * the two "modes" are ship-lag bands — FAST (≤ 7 days from order
    * to ship) and SLOW (≥ 60 days) — which keeps Q12's IN-list-of-two
    * selection and its signature conditional two-way count (urgent
    * vs other priorities per mode). The orders↔lineitem join is the
    * one genuine fact-fact shuffle in the battery; both sides are
    * date/band-pruned before the exchange. */
  def shipLagPriority(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(s"$shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'")
      .selectExpr("l_orderkey", s"$shipD AS sd")
      .join(t(spark, dir, "orders")
          .selectExpr("o_orderkey", "o_orderpriority", s"$ordD AS od"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority",
        """CASE WHEN datediff(sd, od) >= 60 THEN 'SLOW'
                WHEN datediff(sd, od) <= 7 THEN 'FAST' END AS lag_band""")
      .filter("lag_band IS NOT NULL")
      .groupBy("lag_band")
      .agg(
        sum(expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
          "THEN 1 ELSE 0 END")).as("high_line_count"),
        sum(expr("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
          "THEN 0 ELSE 1 END")).as("low_line_count"))
      .orderBy("lag_band")

  val shipLagPriorityOracle: String =
    s"""WITH j AS (SELECT o.o_orderpriority,
          CASE WHEN datediff('day', $ordD, $shipD) >= 60 THEN 'SLOW'
               WHEN datediff('day', $ordD, $shipD) <= 7 THEN 'FAST'
          END AS lag_band
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE $shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01')
        SELECT lag_band,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM j WHERE lag_band IS NOT NULL
        GROUP BY lag_band ORDER BY lag_band"""

  // --------------------------------------------------------------- Q16

  /** Q16 part/supplier relationship (adapted): the part-supplier link
    * comes from observed lineitem trade instead of partsupp, and the
    * "customer complaints" supplier exclusion becomes negative account
    * balance — preserving Q16's NOT IN anti-join against a filtered
    * supplier subquery (none of the keys are nullable, so NOT IN and
    * LEFT ANTI coincide; the exclusion list broadcasts). The distinct
    * supplier count per (brand, type, size) dies in partial
    * aggregation on the (attrs, suppkey) grain before the exchange. */
  def supplierPartCounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_partkey", "l_suppkey")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_brand <> 'Brand#45' AND p_type <> 'PROMO' " +
            "AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)")
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t(spark, dir, "supplier")
          .filter("s_acctbal < 0").select("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
        asc("p_size"))

  val supplierPartCountsOracle: String =
    s"""SELECT p.p_brand, p.p_type, p.p_size,
          count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
          AND l.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // --------------------------------------------------------------- Q20

  /** Q20 excess-supply promotion (adapted): availqty does not exist,
    * so the threshold inverts — a supplier qualifies when its 1997
    * shipped quantity of a name-prefixed part exceeds HALF that
    * part's total 1997 volume (dominant-supplier detection; same
    * correlated-aggregate-vs-correlated-aggregate comparison, tested
    * as 2·ps_qty > total on exact integers). The shape is Q20's
    * nested IN: the qualifying suppkey set semi-joins the
    * region-filtered supplier dim. The per-part total derives from
    * the per-(part,supp) aggregate, so lineitem is scanned once. */
  def dominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perPS = t(spark, dir, "lineitem")
      .filter(s"$shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'")
      .selectExpr("l_partkey", "l_suppkey", s"$qtyC AS qty_c")
      .join(broadcast(t(spark, dir, "part")
          .filter("p_name LIKE 'small%'").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("qty_c").as("ps_qty"))
    val perP = perPS.groupBy("l_partkey").agg(sum("ps_qty").as("total_qty"))
      .withColumnRenamed("l_partkey", "pk")
    val qualifying = perPS
      .join(perP, col("l_partkey") === col("pk"))
      .filter("2 * ps_qty > total_qty")
      .select("l_suppkey").distinct()
    t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")
          .join(broadcast(t(spark, dir, "region")
              .filter("r_name = 'ASIA'").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "n_name")
      .orderBy("s_suppkey")
  }

  val dominantSupplierOracle: String =
    s"""WITH l97 AS (SELECT l.l_partkey, l.l_suppkey, $qtyC AS qty_c
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_name LIKE 'small%'
            AND $shipD >= DATE '1997-01-01' AND $shipD < DATE '1998-01-01'),
        ps AS (SELECT l_partkey, l_suppkey, sum(qty_c) AS ps_qty
               FROM l97 GROUP BY 1, 2),
        tot AS (SELECT l_partkey, sum(ps_qty) AS total_qty
                FROM ps GROUP BY 1)
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND s.s_suppkey IN
            (SELECT ps.l_suppkey FROM ps
             JOIN tot ON ps.l_partkey = tot.l_partkey
             WHERE 2 * ps.ps_qty > tot.total_qty)
        ORDER BY s.s_suppkey"""

  // --------------------------------------------------------------- Q21

  /** Q21 suppliers who kept orders waiting (adapted): lateness is
    * shipping more than 60 days after the order date (no
    * commit/receipt dates). The reference shape is the battery's
    * hardest — a correlated EXISTS (another supplier contributed to
    * the order) AND NOT EXISTS (no OTHER supplier was late) — and the
    * ORACLE keeps exactly that doubly-correlated form, while the
    * Spark plan is its decorrelation: aggregate lineitem to the
    * (order, supplier, any-late) grain, roll up per order to
    * (n_supp, n_late), and a waiting supplier is a late one on a
    * multi-supplier order where it was the ONLY late one. The
    * hash-match between the two is the decorrelation-correctness
    * proof. Per-order supplier counts are bounded by order width, so
    * nothing in the plan exceeds the (order, supplier) grain. */
  def waitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val perOS = t(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey", s"$shipD AS sd")
      .join(t(spark, dir, "orders")
          .filter("o_orderstatus = 'F'")
          .selectExpr("o_orderkey", s"$ordD AS od"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(expr("CASE WHEN sd > date_add(od, 60) THEN 1 ELSE 0 END"))
        .as("late"))
    val perO = perOS.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      .withColumnRenamed("l_orderkey", "ok")
    perOS.filter("late = 1")
      .join(perO, col("l_orderkey") === col("ok"))
      .filter("n_supp >= 2 AND n_late = 1")
      .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(spark, dir, "supplier")
          .select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(100)
  }

  val waitingSupplierOracle: String =
    s"""WITH f AS (SELECT o_orderkey, $ordD AS od FROM orders
          WHERE o_orderstatus = 'F')
        SELECT s.s_suppkey, s.s_name,
          count(DISTINCT l1.l_orderkey) AS numwait
        FROM lineitem l1
        JOIN f ON l1.l_orderkey = f.o_orderkey
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        WHERE CAST(l1.l_shipdate AS DATE) > f.od + 60
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND CAST(l3.l_shipdate AS DATE) > f.od + 60)
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, s_suppkey LIMIT 100"""

  // ---- supplier concentration (Herfindahl-Hirschman index) ----

  /** `nation_supplier_hhi`: supplier revenue concentration per nation
    * by the Herfindahl–Hirschman index, HHI = Σ share² — the antitrust
    * screen (DOJ/FTC 2010 guidelines: > 0.25 highly concentrated,
    * > 0.15 moderately). The index itself is the only float, computed
    * as ΣC²/S² from exact BIGINT cent sums, and the CLASS cuts never
    * touch it: HHI > 0.25 ⟺ 4·ΣC² > S² and HHI > 0.15 ⟺
    * 20·ΣC² > 3·S², pure integer cross-multiplication (the ABC-XYZ
    * discipline). Supplier dim broadcasts; two hash aggs; nation-grain
    * output. The share unit is WHOLE DOLLARS (cents DIV 100 after the
    * per-supplier sum): shares are scale-invariant, and cent-squared
    * sums overflow Long already at sf0.001 (3.1e9² > 2^63) — found by
    * the oracle's own overflow error, which is the integer-exactness
    * discipline working as intended: loud, never wrapped. Dollar
    * squares stay in range past sf100. */
  def nationSupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val bySup = t(spark, dir, "lineitem")
      .selectExpr("l_suppkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents")
      .join(broadcast(t(spark, dir, "supplier")
        .selectExpr("s_suppkey AS l_suppkey", "CAST(s_nationkey AS BIGINT) AS nk")),
        "l_suppkey")
      .groupBy("nk", "l_suppkey")
      .agg(expr("sum(cents) DIV 100").as("c"))
    bySup.groupBy("nk")
      .agg(count(lit(1)).as("n_suppliers"),
        sum("c").as("s_tot"),
        sum(expr("c * c")).as("c2"))
      .join(broadcast(t(spark, dir, "nation")
        .selectExpr("CAST(n_nationkey AS BIGINT) AS nk", "n_name")), "nk")
      .selectExpr("n_name", "CAST(n_suppliers AS BIGINT) AS n_suppliers",
        "CAST(s_tot AS BIGINT) AS s_tot", "CAST(c2 AS BIGINT) AS c2")
      .selectExpr("n_name", "n_suppliers",
        "CAST(c2 AS DOUBLE) / (CAST(s_tot AS DOUBLE) * s_tot) AS hhi",
        """CASE WHEN 4 * c2 > s_tot * s_tot THEN 'concentrated'
                WHEN 20 * c2 > 3 * (s_tot * s_tot) THEN 'moderate'
                ELSE 'competitive' END AS market_class""")
      .orderBy("n_name")
  }

  val nationSupplierHhiOracle: String =
    """WITH by_sup AS (SELECT s.s_nationkey AS nk, l.l_suppkey,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT)) // 100 AS BIGINT) AS c
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        by_nat AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_suppliers,
            CAST(sum(c) AS BIGINT) AS s_tot,
            CAST(sum(c * c) AS BIGINT) AS c2
          FROM by_sup GROUP BY nk)
        SELECT n.n_name, b.n_suppliers,
          CAST(c2 AS DOUBLE) / (CAST(s_tot AS DOUBLE) * s_tot) AS hhi,
          CASE WHEN 4 * c2 > s_tot * s_tot THEN 'concentrated'
               WHEN 20 * c2 > 3 * (s_tot * s_tot) THEN 'moderate'
               ELSE 'competitive' END AS market_class
        FROM by_nat b JOIN nation n ON b.nk = n.n_nationkey
        ORDER BY n_name"""
}
