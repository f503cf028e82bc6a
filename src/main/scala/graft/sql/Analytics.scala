package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Customer/product analytics classics the reference's curated layer
  * stops short of: RFM segmentation, skyline (Pareto-front) extraction,
  * and revenue-concentration (Lorenz/Gini) auditing. All follow the
  * corpus-wide cent/integer quantization discipline so every oracle is
  * bit-exact: ranks, tiles, cumulative sums, and dominance tests run on
  * BIGINTs; doubles appear only as final exact-integer divisions.
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Tables.table(spark, dir, name)

  /** RFM segmentation — the classic CRM decomposition: per customer,
    * Recency (days since last order, anchored to the dataset's max
    * date so the query is reproducible), Frequency (order count), and
    * Monetary (lifetime cents), each scored into quintiles with
    * ntile(5), then bucketed into named segments. Determinism: ntile
    * ties are broken arbitrarily unless the window order is total, so
    * every ORDER BY carries the custkey tiebreak — without it the two
    * engines would tile tied customers differently and the hash
    * compare would flap. Tile polarity is "5 = best" on all three
    * axes (recency DESC puts stale customers in tile 1).
    *
    * Scale: the expensive input (orders) collapses to customer grain
    * in one map-side-combined hash aggregate; only that much smaller
    * grain enters the three global ntile sorts, which each move all
    * rows to ONE partition (WindowExec with empty PARTITION BY). At
    * 100 TB with ~1e9 customers, replace ntile with a quantile-
    * boundary broadcast join (compute 4 cut points per axis, then a
    * per-row CASE) — same output, no global sort; the events_user_
    * deciles query documents that rewrite. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "orders")
      .selectExpr("o_custkey", "o_orderdate",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"),
        max("o_orderdate").as("last_order"))
      .withColumn("anchor", max(col("last_order")).over())
      .selectExpr("o_custkey", "frequency", "monetary_cents",
        "datediff(anchor, last_order) AS recency_days")
    val scored = cust
      .withColumn("r_tile", expr(
        "ntile(5) OVER (ORDER BY recency_days DESC, o_custkey)"))
      .withColumn("f_tile", expr(
        "ntile(5) OVER (ORDER BY frequency ASC, o_custkey)"))
      .withColumn("m_tile", expr(
        "ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey)"))
      .withColumn("segment", expr(
        """CASE
             WHEN r_tile >= 4 AND f_tile >= 4 AND m_tile >= 4 THEN 'champions'
             WHEN r_tile >= 4 AND f_tile <= 2 THEN 'new_customers'
             WHEN r_tile <= 2 AND f_tile >= 4 THEN 'at_risk'
             WHEN r_tile <= 2 AND f_tile <= 2 THEN 'hibernating'
             ELSE 'core'
           END"""))
    scored.groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum("monetary_cents").as("mon_cents"),
        sum("frequency").as("n_orders"),
        sum("recency_days").as("rec_days"))
      .selectExpr("segment", "n_customers", "n_orders",
        "mon_cents / CAST(100 AS DOUBLE) AS total_monetary",
        "CAST(n_orders AS DOUBLE) / CAST(n_customers AS DOUBLE) AS avg_frequency",
        "CAST(rec_days AS DOUBLE) / CAST(n_customers AS DOUBLE) AS avg_recency_days")
      .orderBy("segment")
  }

  val rfmSegmentsOracle: String =
    """WITH cust AS (
         SELECT o_custkey, count(*) AS frequency,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents,
           max(o_orderdate) AS last_order
         FROM orders GROUP BY o_custkey),
       anchored AS (
         SELECT o_custkey, frequency, monetary_cents,
           date_diff('day', last_order, max(last_order) OVER ()) AS recency_days
         FROM cust),
       scored AS (
         SELECT *,
           ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_tile,
           ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_tile,
           ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey) AS m_tile
         FROM anchored),
       seg AS (
         SELECT CASE
             WHEN r_tile >= 4 AND f_tile >= 4 AND m_tile >= 4 THEN 'champions'
             WHEN r_tile >= 4 AND f_tile <= 2 THEN 'new_customers'
             WHEN r_tile <= 2 AND f_tile >= 4 THEN 'at_risk'
             WHEN r_tile <= 2 AND f_tile <= 2 THEN 'hibernating'
             ELSE 'core' END AS segment,
           frequency, monetary_cents, recency_days
         FROM scored)
       SELECT segment, count(*) AS n_customers,
         sum(frequency) AS n_orders,
         sum(monetary_cents) / CAST(100 AS DOUBLE) AS total_monetary,
         CAST(sum(frequency) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_frequency,
         CAST(sum(recency_days) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_recency_days
       FROM seg GROUP BY segment ORDER BY segment"""

  /** 2-D skyline (Pareto front) of the part catalog, minimizing
    * (retail price, size): a part-point survives iff no other point is
    * ≤ on both axes and < on at least one — "no cheaper part is also
    * smaller". Computed on the DISTINCT (price, size) grain (duplicate
    * points collapse with a count, sidestepping the tie-vs-duplicate
    * dominance ambiguity), then a single ordered pass: sorted by
    * (price, size), a point is dominated exactly when some earlier row
    * has size ≤ its own — so `min(size) OVER (... ROWS … 1 PRECEDING)`
    * is the whole dominance test. That turns the textbook O(n²)
    * all-pairs filter into one sort, the standard sweep-line skyline.
    *
    * Scale: the global ordered window is one-partition, but it runs on
    * the distinct-point grain (bounded by the price×size domain, not
    * row count). For genuinely huge domains, skylines are
    * distributive: take per-partition local skylines (mapPartitions or
    * a bucketed pre-pass), union, re-sweep — the merge input is tiny
    * because each local front is already thin. */
  def partsSkyline(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents",
        "p_size")
      .groupBy("price_cents", "p_size")
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("prior_min_size", expr(
        """min(p_size) OVER (ORDER BY price_cents, p_size
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"""))
      .filter("prior_min_size IS NULL OR p_size < prior_min_size")
      .selectExpr("price_cents", "p_size", "n_parts",
        "price_cents / CAST(100 AS DOUBLE) AS price")
      .orderBy("price_cents")

  val partsSkylineOracle: String =
    """WITH pts AS (
         SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
           p_size, count(*) AS n_parts
         FROM part GROUP BY 1, 2),
       swept AS (
         SELECT price_cents, p_size, n_parts,
           min(p_size) OVER (ORDER BY price_cents, p_size
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_min_size
         FROM pts)
       SELECT price_cents, p_size, n_parts,
         price_cents / CAST(100 AS DOUBLE) AS price
       FROM swept
       WHERE prior_min_size IS NULL OR p_size < prior_min_size
       ORDER BY price_cents"""

  /** Revenue concentration across customer nations: the Lorenz curve
    * (nations ordered poorest-first, cumulative revenue share) plus
    * the Gini coefficient from the exact rank formula
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ ascending — the
    * standard inequality audit for "is one market carrying the book?".
    * Every term is BIGINT (cents × small ranks), so both engines reach
    * the identical integers and the two final divisions are exact
    * int→double IEEE operations. The row_number order carries the
    * nation-name tiebreak so tied revenues rank identically on both
    * engines.
    *
    * Scale: the fact scan collapses to nation grain (25 rows) in one
    * hash aggregate; all window work happens on that grain. The same
    * shape audits any grouping whose cardinality fits a single
    * partition after aggregation — for high-cardinality grains (e.g.
    * per-customer Gini) the Σi·xᵢ term distributes as sum(rank·x)
    * with ranks from a two-phase zipWithIndex-style global order. */
  def nationRevenueLorenz(spark: SparkSession, dir: String): DataFrame = {
    val byNation = t(spark, dir, "lineitem")
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents")
      .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer").select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation").selectExpr("n_nationkey", "n_name AS nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(sum("rev_cents").as("rev_cents"))
    byNation
      .withColumn("lorenz_rank", expr(
        "row_number() OVER (ORDER BY rev_cents, nation)"))
      .withColumn("cum_cents", expr(
        """sum(rev_cents) OVER (ORDER BY rev_cents, nation
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))
      .withColumn("n_nations", expr("count(*) OVER ()"))
      .withColumn("total_cents", expr("sum(rev_cents) OVER ()"))
      .withColumn("weighted", expr("sum(lorenz_rank * rev_cents) OVER ()"))
      .selectExpr("lorenz_rank", "nation", "rev_cents", "cum_cents",
        "CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS cum_share",
        "CAST(2 * weighted - (n_nations + 1) * total_cents AS DOUBLE)" +
          " / CAST(n_nations * total_cents AS DOUBLE) AS gini")
      .orderBy("lorenz_rank")
  }

  val nationRevenueLorenzOracle: String =
    """WITH l AS (SELECT l_orderkey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents
         FROM lineitem),
       by_nation AS (
         SELECT n.n_name AS nation, sum(l.rev_cents) AS rev_cents
         FROM l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name),
       ranked AS (
         SELECT nation, rev_cents,
           row_number() OVER (ORDER BY rev_cents, nation) AS lorenz_rank,
           sum(rev_cents) OVER (ORDER BY rev_cents, nation
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents,
           count(*) OVER () AS n_nations,
           sum(rev_cents) OVER () AS total_cents
         FROM by_nation),
       g AS (SELECT *,
           sum(lorenz_rank * rev_cents) OVER () AS weighted
         FROM ranked)
       SELECT lorenz_rank, nation, rev_cents, cum_cents,
         CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS cum_share,
         CAST(2 * weighted - (n_nations + 1) * total_cents AS DOUBLE)
           / CAST(n_nations * total_cents AS DOUBLE) AS gini
       FROM g ORDER BY lorenz_rank"""
}
