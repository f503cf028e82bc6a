package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Entities

/** Polish operators beyond the reference surface (SURVEY §2.6 / §2.8 /
  * S5): window-function ranking, set union, and source-file
  * provenance.
  */
object Extras {

  /** §2.8 — window functions over the campaign summary (the natural
    * fit the reference imports but never uses): row_number / rank /
    * dense_rank + running sum per channel. Dialect-common text, run
    * via spark.sql over the curated view and verbatim in DuckDB. */
  val campaignRankSql: String =
    """SELECT campaign_id, campaign_name, channel, total_revenue,
         row_number() OVER w AS revenue_rank,
         rank() OVER w AS revenue_rank_with_ties,
         dense_rank() OVER w AS revenue_dense_rank,
         sum(total_revenue) OVER (PARTITION BY channel
           ORDER BY total_revenue DESC, campaign_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_channel_revenue
       FROM curated_campaign_performance_summary
       WINDOW w AS (PARTITION BY channel ORDER BY total_revenue DESC, campaign_id)
       ORDER BY channel, revenue_rank"""

  /** §2.8 breadth — distribution/navigation window functions over the
    * campaign summary: quartile bucket, percent_rank, cume_dist, and
    * lead/lag of revenue within a channel. Dialect-common text (run
    * verbatim on both engines); the window order is total (revenue
    * desc, campaign_id), so every function is deterministic. The
    * rank-based functions are integer-ratio arithmetic — identical
    * IEEE-754 on both engines. */
  val campaignDistributionSql: String =
    """SELECT campaign_id, channel, total_revenue,
         ntile(4) OVER w AS revenue_quartile,
         percent_rank() OVER w AS revenue_pct_rank,
         cume_dist() OVER w AS revenue_cume_dist,
         lead(campaign_id, 1) OVER w AS next_campaign,
         lag(campaign_id, 1) OVER w AS prev_campaign
       FROM curated_campaign_performance_summary
       WINDOW w AS (PARTITION BY channel ORDER BY total_revenue DESC, campaign_id)
       ORDER BY channel, revenue_pct_rank, campaign_id"""

  /** §2.6 — union of the two inventory generations + per-product
    * rollup (sums of ints: exact). */
  def inventoryUnion(spark: SparkSession, dir: String): DataFrame =
    Entities.inventoryOld(spark, dir)
      .unionByName(Entities.inventoryNew(spark, dir))
      .groupBy("product_id")
      .agg(count(lit(1)).as("n_records"),
        sum(col("stock_received")).as("total_stock"),
        sum(col("damaged_stock")).as("total_damaged"))
      .orderBy("product_id")

  val inventoryUnionOracle: String = OracleSql.withCtes(
    """SELECT product_id, count(*) AS n_records,
         CAST(sum(stock_received) AS BIGINT) AS total_stock,
         CAST(sum(damaged_stock) AS BIGINT) AS total_damaged
       FROM (SELECT * FROM inv_old_e UNION ALL SELECT * FROM inv_new_e)
       GROUP BY product_id ORDER BY product_id""")

  /** Multi-level rollup of sales revenue over (category, year) —
    * grouping-sets breadth beyond the reference surface. NULLS FIRST is
    * pinned explicitly: Spark defaults ascending nulls first, DuckDB
    * nulls last. Cent-quantized sums keep the totals exact. */
  /** One dialect-common text; the Spark side registers the pipeline as
    * a view named like the oracle CTE (the DataFrame `.rollup` API
    * resolves the duplicated grouping attributes ambiguously when
    * sorted, so the SQL form is both cleaner and shared).
    * The divisor is CAST(100 AS DOUBLE), not the literal 100.0: Spark
    * SQL parses a bare decimal literal as DECIMAL(4,1) (→ decimal(27,6)
    * output) while DuckDB's `/` is always float division. */
  private val salesRollupSql: String =
    """SELECT category, year,
         CAST(sum(CAST(round(line_total * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS total_revenue,
         count(*) AS n_lines
       FROM sales_tx GROUP BY ROLLUP (category, year)
       ORDER BY category ASC NULLS FIRST, year ASC NULLS FIRST"""

  /** Shared (bench-cacheable) sales-transactions prefix — same cache
    * key as SparkEntry's, so report sessions build it once. */
  private def salesTx(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "sales", dir) {
      graft.pipelines.SalesRevenue.run(
        Entities.orders(spark, dir), Entities.orderItems(spark, dir),
        Entities.products(spark, dir))
    }

  def salesRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(salesRollupSql)
  }

  val salesRollupOracle: String = OracleSql.withCtes(salesRollupSql)

  /** GROUPING SETS breadth beyond ROLLUP: the three explicit sets
    * (category), (year), () — disjoint marginals, not the rollup
    * hierarchy. Same dialect-common text and quantization rules as
    * [[salesRollupSql]]. */
  private val salesGroupingSetsSql: String =
    """SELECT category, year,
         CAST(sum(CAST(round(line_total * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS total_revenue,
         count(*) AS n_lines
       FROM sales_tx GROUP BY GROUPING SETS ((category), (year), ())
       ORDER BY category ASC NULLS FIRST, year ASC NULLS FIRST"""

  def salesGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(salesGroupingSetsSql)
  }

  val salesGroupingSetsOracle: String = OracleSql.withCtes(salesGroupingSetsSql)

  /** CUBE completes the grouping trio (ROLLUP hierarchy, explicit
    * GROUPING SETS marginals, full cross of subsets): all four sets
    * (category, year), (category), (year), (). Output rows are unique
    * on (category, year) — neither column is NULL in the data — so the
    * NULLS FIRST sort is total. Same dialect-common text and
    * quantization rules as [[salesRollupSql]]. */
  private val salesCubeSql: String =
    """SELECT category, year,
         CAST(sum(CAST(round(line_total * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS total_revenue,
         count(*) AS n_lines
       FROM sales_tx GROUP BY CUBE (category, year)
       ORDER BY category ASC NULLS FIRST, year ASC NULLS FIRST"""

  def salesCube(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(salesCubeSql)
  }

  val salesCubeOracle: String = OracleSql.withCtes(salesCubeSql)

  /** Exact quartiles of order quantity per category. Function names
    * differ (Spark `percentile` vs DuckDB `quantile_cont`) but both
    * interpolate linearly, and at ¼-multiples over integral values
    * every intermediate is an exact dyadic rational — bit-equal
    * doubles despite the different formula shapes. Exact percentile
    * is a full-sort aggregate; at 100 TB prefer `approx_percentile`
    * (t-digest) unless exactness is contractual. */
  def categoryQuantityQuartiles(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(
      """SELECT category,
           percentile(quantity, 0.25) AS q1,
           percentile(quantity, 0.5) AS median,
           percentile(quantity, 0.75) AS q3,
           count(*) AS n_lines
         FROM sales_tx GROUP BY category ORDER BY category""")
  }

  val categoryQuantityQuartilesOracle: String = OracleSql.withCtes(
    """SELECT category,
         quantile_cont(quantity, 0.25) AS q1,
         quantile_cont(quantity, 0.5) AS median,
         quantile_cont(quantity, 0.75) AS q3,
         count(*) AS n_lines
       FROM sales_tx GROUP BY category ORDER BY category""")

  /** The DISCRETE twin of [[categoryQuantityQuartiles]]:
    * percentile_disc returns an actual data value (the smallest value
    * whose cumulative distribution reaches p) instead of
    * interpolating between neighbors — the right choice when the
    * statistic must be a value that EXISTS (a real order quantity,
    * a real latency) rather than a synthetic midpoint. Both engines'
    * discrete quantile definitions agree exactly (no interpolation →
    * no float arithmetic at all), making this the strictest
    * cross-engine quantile pairing in the corpus; the WITHIN GROUP
    * syntax is the ANSI form Spark added alongside the classic
    * `percentile` call. Same exact-sort cost note as the continuous
    * form: full sort per group, approx_percentile at 100 TB. */
  def categoryQuantityQuartilesDisc(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(
      """SELECT category,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY quantity) AS q1,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY quantity) AS median,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY quantity) AS q3,
           count(*) AS n_lines
         FROM sales_tx GROUP BY category ORDER BY category""")
  }

  val categoryQuantityQuartilesDiscOracle: String = OracleSql.withCtes(
    """SELECT category,
         quantile_disc(quantity, 0.25) AS q1,
         quantile_disc(quantity, 0.5) AS median,
         quantile_disc(quantity, 0.75) AS q3,
         count(*) AS n_lines
       FROM sales_tx GROUP BY category ORDER BY category""")

  /** Benford first-significant-digit audit — the data-forensics
    * screen for fabricated or unit-mangled money columns: natural
    * multi-magnitude amounts follow log10(1+1/d), so a flat or spiky
    * digit histogram is the cheapest fraud/ETL-bug tripwire there is.
    * The first digit comes from the CENTS INTEGER rendered as text
    * (no float log arithmetic to diverge between engines); expected
    * shares are fixed literals, and the deviation is |observed −
    * expected| summed in one pass. One scan, a 9-row agg. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.orders(spark, dir)
      .selectExpr(
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT) AS digit")
      .filter("digit BETWEEN 1 AND 9")
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      .selectExpr("digit", "n_orders",
        "CAST(n_orders AS DOUBLE) / CAST(sum(n_orders) OVER () AS DOUBLE) AS observed_share",
        "log10(1.0 + 1.0 / digit) AS benford_share")
      .orderBy("digit")

  val benfordDigitsOracle: String =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
            AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
          FROM orders),
        g AS (SELECT digit, count(*) AS n_orders FROM d
              WHERE digit BETWEEN 1 AND 9 GROUP BY digit)
        SELECT digit, n_orders,
          CAST(n_orders AS DOUBLE)
            / CAST(sum(n_orders) OVER () AS DOUBLE) AS observed_share,
          log10(1.0 + 1.0 / digit) AS benford_share
        FROM g ORDER BY digit"""

  /** Market-basket co-purchase pairs: brand pairs appearing in the
    * same order, counted and top-k'd — the self-join primitive under
    * every "customers also bought" feature. The self-join is keyed on
    * the order (equi-shuffle) and its fan-out is bounded by
    * lines-per-order SQUARED (≤ 7² here, and small everywhere —
    * basket size, not corpus size, bounds the blowup; the brand<brand
    * guard halves it and drops self-pairs). The distinct-per-order
    * step collapses multi-line same-brand orders BEFORE the join —
    * the pre-aggregation that keeps the pair stream minimal. */
  /** The distinct (order, brand) basket relation shared by
    * [[brandCopurchase]] and [[Analytics.brandAssociationRules]] —
    * built once per session under the PlanCache prefix contract (the
    * self-join + three statistics passes would otherwise rescan and
    * re-shuffle it per consumer). */
  private[sql] def orderBrands(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "order_brands", dir) {
      graft.io.Tables.lineitem(spark, dir)
        .join(broadcast(graft.io.Tables.table(spark, dir, "part")
            .select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
        .distinct()
    }

  /** Per-order SORTED distinct-brand array — the shared base the
    * basket-analysis queries (copurchase, association rules, triples)
    * derive their pair streams from. One shuffle builds it; pair
    * generation becomes an array-combination EXPLODE instead of an
    * ob⋈ob self-join (two shuffles + a sort-merge per query). The
    * array is strictly increasing (orderBrands is distinct), so
    * i<j combinations ARE the a<b pairs. Bounded: a basket holds at
    * most |brand domain| entries, the same bound the self-join's
    * per-key fan-out already had. */
  private[sql] def orderBrandSets(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "order_brand_sets", dir) {
      orderBrands(spark, dir).groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("p_brand"))).as("bs"))
    }

  /** (l_orderkey, a, b) with a < b — the undirected pair stream, one
    * explode over [[orderBrandSets]]. */
  private[sql] def orderBrandPairs(spark: SparkSession, dir: String): DataFrame =
    orderBrandSets(spark, dir)
      .selectExpr("l_orderkey",
        """explode(flatten(transform(bs, (x, i) ->
             transform(slice(bs, i + 2, size(bs)), y ->
               named_struct('a', x, 'b', y))))) AS p""")
      .selectExpr("l_orderkey", "p.a AS a", "p.b AS b")

  def brandCopurchase(spark: SparkSession, dir: String): DataFrame =
    orderBrandPairs(spark, dir)
      .selectExpr("a AS brand_a", "b AS brand_b")
      .groupBy("brand_a", "brand_b")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), asc("brand_a"), asc("brand_b"))
      .limit(20)

  val brandCopurchaseOracle: String =
    """WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
          FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
            AND a.p_brand < b.p_brand)
        SELECT brand_a, brand_b, count(*) AS n_orders
        FROM pairs GROUP BY brand_a, brand_b
        ORDER BY n_orders DESC, brand_a, brand_b LIMIT 20"""

  // ---- Apriori frequent triples ----

  /** Frequent brand TRIPLES by the genuine Apriori shape (Agrawal &
    * Srikant 1994), not a blind 3-way self-join: L₂ (frequent pairs at
    * min support) is computed first, candidate triples C₃ come from
    * joining L₂ with itself on the shared first item and PRUNING any
    * candidate whose (b, c) sub-pair is not itself frequent (the
    * downward-closure property), and only then does the fact relation
    * expand to triples — each expansion step is semi-joined against
    * the (broadcast, tiny) frequent-set keys, so the widest join never
    * materializes infrequent combinations. That pruning IS why Apriori
    * scales: on a 100 TB basket table the candidate relations stay
    * itemset-domain-sized while the data makes exactly one pass per
    * level. Min support is relative (≥ max(5, orders/200)) so the
    * operator is scale-invariant. */
  def brandTriples(spark: SparkSession, dir: String): DataFrame = {
    val ob = orderBrands(spark, dir)
    // n_total = distinct orders = one row per basket in the sets
    // relation (same value as the old ob-distinct-count, one agg over
    // the cached sets instead of a re-distinct of ob)
    val tot = orderBrandSets(spark, dir)
      .agg(count(lit(1)).as("n_total"))
      .selectExpr("n_total", "greatest(CAST(5 AS BIGINT), n_total DIV 200) AS min_sup")
    // checkpoint: the pair stream feeds BOTH the L2 count and the
    // triple expansion — without it the pair explode runs twice
    val pairsRaw = orderBrandPairs(spark, dir)
      .transform(graft.ops.Checkpoints.cut)
    val l2 = pairsRaw.groupBy("a", "b").agg(count(lit(1)).as("n_pair"))
      .crossJoin(broadcast(tot)).filter(col("n_pair") >= col("min_sup"))
      .select("a", "b")
    // C3 = join L2 on the shared first item + downward-closure prune
    val c3 = l2.selectExpr("a", "b")
      .join(l2.selectExpr("a AS a2", "b AS c"),
        col("a") === col("a2") && col("b") < col("c"))
      .select("a", "b", "c")
      .join(l2.selectExpr("a AS b", "b AS c"), Seq("b", "c"), "left_semi")
    val p2 = pairsRaw.join(broadcast(l2), Seq("a", "b"), "left_semi")
    val t3 = p2
      .join(ob.selectExpr("l_orderkey AS ok3", "p_brand AS c"),
        col("l_orderkey") === col("ok3") && col("b") < col("c"))
      .select("l_orderkey", "a", "b", "c")
      .join(broadcast(c3), Seq("a", "b", "c"), "left_semi")
    t3.groupBy("a", "b", "c").agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot)).filter(col("n_orders") >= col("min_sup"))
      .selectExpr("a AS brand_a", "b AS brand_b", "c AS brand_c", "n_orders",
        "CAST(n_orders AS DOUBLE) / n_total AS support")
      .orderBy(desc("n_orders"), asc("brand_a"), asc("brand_b"), asc("brand_c"))
      .limit(20)
  }

  val brandTriplesOracle: String =
    """WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        tot AS (SELECT count(DISTINCT l_orderkey) AS n_total,
            greatest(CAST(5 AS BIGINT), count(DISTINCT l_orderkey) // 200) AS min_sup
          FROM ob),
        praw AS (SELECT x.l_orderkey, x.p_brand AS a, y.p_brand AS b
          FROM ob x JOIN ob y ON x.l_orderkey = y.l_orderkey
            AND x.p_brand < y.p_brand),
        l2 AS (SELECT a, b FROM praw CROSS JOIN tot
          GROUP BY a, b, min_sup HAVING count(*) >= min_sup),
        c3 AS (SELECT p.a, p.b, q.b AS c
          FROM l2 p JOIN l2 q ON p.a = q.a AND p.b < q.b
          WHERE EXISTS (SELECT 1 FROM l2 r WHERE r.a = p.b AND r.b = q.b)),
        p2 AS (SELECT praw.* FROM praw
          WHERE EXISTS (SELECT 1 FROM l2 WHERE l2.a = praw.a AND l2.b = praw.b)),
        t3 AS (SELECT p2.l_orderkey, p2.a, p2.b, z.p_brand AS c
          FROM p2 JOIN ob z ON p2.l_orderkey = z.l_orderkey
            AND p2.b < z.p_brand
          WHERE EXISTS (SELECT 1 FROM c3
            WHERE c3.a = p2.a AND c3.b = p2.b AND c3.c = z.p_brand)),
        cnt AS (SELECT a, b, c, count(*) AS n_orders
          FROM t3 GROUP BY a, b, c)
        SELECT a AS brand_a, b AS brand_b, c AS brand_c, n_orders,
          CAST(n_orders AS DOUBLE) / n_total AS support
        FROM cnt CROSS JOIN tot WHERE n_orders >= min_sup
        ORDER BY n_orders DESC, brand_a, brand_b, brand_c LIMIT 20"""

  /** Correlated LATERAL subquery: for each sampled order, its single
    * most expensive line item — the "top-1 per key, but written as a
    * dependent subquery" SQL surface. Catalyst decorrelates the LIMIT
    * subquery into a rank-window join (same physical shape as the
    * explicit window form, so the declarative convenience costs
    * nothing at scale); the identical text runs on DuckDB, which
    * executes LATERAL natively. Values are copied verbatim (no
    * arithmetic), ordering total on the unique order key. */
  def topLineLateral(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "tll_o", graft.io.Tables.orders(spark, dir))
    graft.io.Views.register(dir, "tll_l", graft.io.Tables.lineitem(spark, dir))
    spark.sql(topLineLateralSql("tll_o", "tll_l"))
  }

  private def topLineLateralSql(o: String, l: String): String =
    s"""SELECT o.o_orderkey, t.l_partkey, t.l_extendedprice
        FROM $o o, LATERAL (
          SELECT l_partkey, l_extendedprice FROM $l l
          WHERE l.l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_partkey LIMIT 1) t
        WHERE o.o_orderkey % 10 = 0
        ORDER BY o.o_orderkey"""

  val topLineLateralOracle: String = topLineLateralSql("orders", "lineitem")

  /** ABC classification over a (l_partkey, cents) part-revenue
    * relation: cumulative revenue share in (cents DESC, partkey)
    * order, A = first 80%, B = next 15%, C = tail. Class boundaries
    * are integer cross-multiplications (`cum·100 ≤ total·80`), so no
    * division ever decides a boundary row; ties on revenue are broken
    * by part key for a total order.
    *
    * The cumulative sum and the grand total both ride
    * [[graft.ops.Scale.orderedPrefixSum]] — the two-phase prefix whose
    * only global window runs over the revenue-range BUCKET grain, so
    * the part dimension never sorts (or totals) in one partition the
    * way the old `Window.orderBy(...)` / `sum().over(partitionBy())`
    * pair did. Shared by [[partsAbcAnalysis]] and [[partsAbcXyz]]. */
  private[graft] def abcClasses(perPart: DataFrame): DataFrame =
    graft.ops.Scale.orderedPrefixSum(perPart,
        Seq(expr("(-cents) DIV 1048576")),
        Seq(desc("cents"), asc("l_partkey")),
        col("cents"), "cum_cents", totalOut = Some("total_cents"))
      .selectExpr("l_partkey", "cents",
        """CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                ELSE 'C' END AS abc_class""")

  /** ABC / Pareto analysis over part revenue — [[abcClasses]] over the
    * map-side-combined part-revenue rollup, summarized per class. */
  def partsAbcAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val perPart = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents")
      .groupBy("l_partkey").agg(sum("cents").as("cents"))
    abcClasses(perPart)
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("cents"))
      .selectExpr("abc_class", "n_parts",
        "cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("abc_class")
  }

  val partsAbcAnalysisOracle: String =
    """WITH p AS (SELECT l_partkey,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
              AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem GROUP BY 1),
        r AS (SELECT *,
            CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_cents,
            CAST(sum(cents) OVER () AS BIGINT) AS total_cents
          FROM p),
        c AS (SELECT l_partkey, cents,
            CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                 WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                 ELSE 'C' END AS abc_class
          FROM r)
        SELECT abc_class, count(*) AS n_parts,
          CAST(sum(cents) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
        FROM c GROUP BY 1 ORDER BY 1"""

  /** Per-segment customer balance quartiles — the exact
    * percentile↔quantile_cont pairing over cent-quantized balances
    * (interpolation over integers is binary-fraction arithmetic, so
    * the doubles are cross-engine exact; the established
    * category-quartiles argument applied to the customer dim). */
  def customerBalanceQuartiles(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.customer(spark, dir)
      .selectExpr("c_mktsegment",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        expr("percentile(bal_cents, 0.25) / 100 AS q1"),
        expr("percentile(bal_cents, 0.5) / 100 AS median"),
        expr("percentile(bal_cents, 0.75) / 100 AS q3"))
      .orderBy("c_mktsegment")

  val customerBalanceQuartilesOracle: String =
    """WITH q AS (SELECT c_mktsegment,
            CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM customer)
        SELECT c_mktsegment, count(*) AS n_customers,
          quantile_cont(bal_cents, 0.25) / 100 AS q1,
          quantile_cont(bal_cents, 0.5) / 100 AS median,
          quantile_cont(bal_cents, 0.75) / 100 AS q3
        FROM q GROUP BY 1 ORDER BY 1"""

  /** Part-dimension profile: per brand, counts, distinct types/sizes,
    * and cent-exact retail price stats — dimension-table QA. */
  def partsBrandSummary(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.part(spark, dir)
      .selectExpr("p_brand", "p_type", "p_size",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        countDistinct(col("p_size")).as("n_sizes"),
        min("price_cents").as("min_cents"),
        max("price_cents").as("max_cents"),
        sum("price_cents").as("sum_cents"))
      .selectExpr("p_brand", "n_parts",
        "CAST(n_types AS BIGINT) AS n_types",
        "CAST(n_sizes AS BIGINT) AS n_sizes",
        "min_cents / CAST(100 AS DOUBLE) AS min_price",
        "max_cents / CAST(100 AS DOUBLE) AS max_price",
        "sum_cents / CAST(100 AS DOUBLE) / n_parts AS mean_price")
      .orderBy("p_brand")

  val partsBrandSummaryOracle: String =
    """WITH p AS (SELECT p_brand, p_type, p_size,
            CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
          FROM part)
        SELECT p_brand, count(*) AS n_parts,
          CAST(count(DISTINCT p_type) AS BIGINT) AS n_types,
          CAST(count(DISTINCT p_size) AS BIGINT) AS n_sizes,
          min(price_cents) / CAST(100 AS DOUBLE) AS min_price,
          max(price_cents) / CAST(100 AS DOUBLE) AS max_price,
          CAST(sum(price_cents) AS BIGINT) / CAST(100 AS DOUBLE) / count(*)
            AS mean_price
        FROM p GROUP BY 1 ORDER BY 1"""

  /** Share-of-parent hierarchy over the Q5 lineage: each nation's
    * revenue as a share of its region and of the world — two window
    * levels over the (region, nation) aggregate (25 rows: the window
    * sorts a dimension-sized relation, not data). Exact integer
    * ratios in fixed double trees. */
  def revenueShareOfParent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    revenueByNation(spark, dir)
      .selectExpr("region", "nation",
        "CAST(round(revenue * 100) AS BIGINT) AS cents")
      .withColumn("region_cents",
        sum(col("cents")).over(Window.partitionBy("region")))
      .withColumn("world_cents",
        sum(col("cents")).over(Window.partitionBy()))
      .selectExpr("region", "nation",
        "cents / CAST(100 AS DOUBLE) AS revenue",
        "cents / CAST(region_cents AS DOUBLE) AS share_of_region",
        "cents / CAST(world_cents AS DOUBLE) AS share_of_world")
      .orderBy("region", "nation")
  }

  // lazy: revenueByNationOracle is declared later in this object, and
  // a strict val here would capture null at initialization order
  lazy val revenueShareOfParentOracle: String = {
    val inner = revenueByNationOracle
    s"""WITH rn AS ($inner),
        w AS (SELECT region, nation,
            CAST(round(revenue * 100) AS BIGINT) AS cents FROM rn),
        s AS (SELECT *,
            CAST(sum(cents) OVER (PARTITION BY region) AS BIGINT)
              AS region_cents,
            CAST(sum(cents) OVER () AS BIGINT) AS world_cents
          FROM w)
        SELECT region, nation, cents / CAST(100 AS DOUBLE) AS revenue,
          cents / CAST(region_cents AS DOUBLE) AS share_of_region,
          cents / CAST(world_cents AS DOUBLE) AS share_of_world
        FROM s ORDER BY region, nation"""
  }

  /** Weekday seasonality: order volume and cent-exact revenue by ISO
    * day-of-week. Date-part extraction is the dialect trap here —
    * Spark's `weekday` is Monday=0, DuckDB's `dayofweek` is Sunday=0;
    * the one alignment both express exactly is ISO (Monday=1), via
    * weekday+1 on the Spark side and `isodow` on the DuckDB side.
    * One map-side-combined agg onto a 7-row grid. */
  def weekdaySeasonality(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.orders(spark, dir)
      .selectExpr("weekday(CAST(o_orderdate AS DATE)) + 1 AS isodow",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .groupBy("isodow")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents"))
      .selectExpr("CAST(isodow AS INTEGER) AS isodow", "n_orders",
        "cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("isodow")

  val weekdaySeasonalityOracle: String =
    """SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INTEGER) AS isodow,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           / CAST(100 AS DOUBLE) AS revenue
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** Order-to-ship latency profile per priority class: integer
    * date-diff days aggregated exactly (min/max/count and a mean from
    * the exact day sum). The join is the lineitem⋈orders fact shuffle
    * every Q5-shaped query pays; everything after dies in a 5-row
    * grid. The negative-delay count is the data-quality tripwire
    * (shipments before their order date). */
  def shipDelayByPriority(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS sd")
      .join(graft.io.Tables.orders(spark, dir)
        .selectExpr("o_orderkey", "o_orderpriority",
          "CAST(o_orderdate AS DATE) AS od"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderpriority", "datediff(sd, od) AS delay_days")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        min("delay_days").as("min_days"), max("delay_days").as("max_days"),
        sum(col("delay_days").cast("long")).as("sum_days"),
        sum(when(col("delay_days") < 0, 1L).otherwise(0L)).as("n_negative"))
      .selectExpr("o_orderpriority", "n_lines",
        "CAST(min_days AS INTEGER) AS min_days",
        "CAST(max_days AS INTEGER) AS max_days",
        "sum_days / CAST(n_lines AS DOUBLE) AS mean_days",
        "CAST(n_negative AS BIGINT) AS n_negative")
      .orderBy("o_orderpriority")

  val shipDelayByPriorityOracle: String =
    """WITH j AS (SELECT o.o_orderpriority,
            datediff('day', CAST(o.o_orderdate AS DATE),
              CAST(l.l_shipdate AS DATE)) AS delay_days
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        g AS (SELECT o_orderpriority, count(*) AS n_lines,
            min(delay_days) AS min_days, max(delay_days) AS max_days,
            CAST(sum(delay_days) AS BIGINT) AS sum_days,
            CAST(sum(CASE WHEN delay_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_negative
          FROM j GROUP BY 1)
        SELECT o_orderpriority, n_lines,
          CAST(min_days AS INTEGER) AS min_days,
          CAST(max_days AS INTEGER) AS max_days,
          sum_days / CAST(n_lines AS DOUBLE) AS mean_days,
          n_negative
        FROM g ORDER BY o_orderpriority"""

  /** Orders above their own customer's average — the correlated
    * -aggregate pattern, done as one window pass instead of the
    * textbook self-join-on-aggregate (same answer, half the scans).
    * The comparison is the interesting part: "price > avg" compares a
    * value against a ratio, and a float division boundary is exactly
    * where engines could disagree — so the predicate cross-multiplies
    * in integer cents (`price·n > sum`), which is EXACT: no division
    * ever happens, and the boundary case (price == mean) resolves
    * identically everywhere. */
  def ordersAboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy("o_custkey")
    graft.io.Tables.orders(spark, dir)
      .selectExpr("o_custkey", "o_orderkey", "o_orderpriority",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .withColumn("n_cust", count(lit(1)).over(byCust))
      .withColumn("sum_cust", sum(col("cents")).over(byCust))
      .filter(col("cents") * col("n_cust") > col("sum_cust"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_above"))
      .orderBy("o_orderpriority")
  }

  val ordersAboveCustomerAvgOracle: String =
    """WITH o AS (SELECT o_custkey, o_orderpriority,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        w AS (SELECT *, count(*) OVER (PARTITION BY o_custkey) AS n_cust,
            CAST(sum(cents) OVER (PARTITION BY o_custkey) AS BIGINT)
              AS sum_cust
          FROM o)
        SELECT o_orderpriority, count(*) AS n_above
        FROM w WHERE cents * n_cust > sum_cust
        GROUP BY 1 ORDER BY 1"""

  /** Top-3 suppliers by account balance within each nation — the
    * per-group top-k via rank window (contrast with the heap aggregate
    * [[graft.functions.TopKAgg]]: the window form shuffles every row
    * but yields the full carrying row, not just the ranked value — the
    * right tool when the payload matters and groups are dimension
    * -sized). Balance is cent-quantized for the exact total order;
    * s_suppkey breaks ties totally. */
  def topSuppliersByNation(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("n_name")
      .orderBy(desc("bal_cents"), asc("s_suppkey"))
    graft.io.Tables.supplier(spark, dir)
      .selectExpr("s_suppkey", "s_name", "s_nationkey",
        "CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents")
      .join(broadcast(graft.io.Tables.nation(spark, dir)
        .selectExpr("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .selectExpr("n_name", "CAST(rank AS INTEGER) AS rank", "s_suppkey",
        "s_name", "bal_cents / CAST(100 AS DOUBLE) AS acctbal")
      .orderBy("n_name", "rank")
  }

  val topSuppliersByNationOracle: String =
    """WITH s AS (SELECT s_suppkey, s_name, s_nationkey,
            CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
          FROM supplier),
        r AS (SELECT n.n_name, s.s_suppkey, s.s_name, s.bal_cents,
            row_number() OVER (PARTITION BY n.n_name
              ORDER BY s.bal_cents DESC, s.s_suppkey) AS rank
          FROM s JOIN nation n ON s.s_nationkey = n.n_nationkey)
        SELECT n_name, CAST(rank AS INTEGER) AS rank, s_suppkey, s_name,
          bal_cents / CAST(100 AS DOUBLE) AS acctbal
        FROM r WHERE rank <= 3 ORDER BY n_name, rank"""

  /** DecimalType-exact revenue: the engine's default money discipline
    * is integer cents (scaled BIGINTs), but Spark's DECIMAL(p,s) is
    * the type-system-native alternative — exact scaled-integer
    * arithmetic with widths tracked through multiplication
    * (DECIMAL(12,2) × DECIMAL(13,4) → exact product, no float error
    * to quantize away). Sums of decimals are order-independent, so the
    * aggregate is partitioning-stable like the cent sums. The final
    * projection converts the exact decimal to DOUBLE (one nearest-even
    * conversion of the same rational in both engines) purely for
    * output-schema parity with the rest of the corpus. */
  def decimalRevenue(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag",
        "CAST(l_extendedprice AS DECIMAL(12,2)) AS p",
        "CAST(l_discount AS DECIMAL(12,4)) AS d")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("p")).as("gross_dec"),
        sum(expr("p * (CAST(1 AS DECIMAL(5,4)) - d)")).as("net_dec"))
      .selectExpr("l_returnflag", "n_lines",
        "CAST(gross_dec AS DOUBLE) AS gross",
        "CAST(net_dec AS DOUBLE) AS net")
      .orderBy("l_returnflag")

  val decimalRevenueOracle: String =
    """WITH q AS (SELECT l_returnflag,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
            CAST(l_discount AS DECIMAL(12,4)) AS d
          FROM lineitem)
        SELECT l_returnflag, count(*) AS n_lines,
          CAST(sum(p) AS DOUBLE) AS gross,
          CAST(sum(p * (CAST(1 AS DECIMAL(5,4)) - d)) AS DOUBLE) AS net
        FROM q GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** 100 TB variant of [[categoryQuantityQuartiles]]: GK-sketch
    * `approx_percentile` (accuracy 10000) instead of exact
    * `percentile`. The exact form sorts every group's values; the
    * sketch is a bounded-memory mergeable summary — the documented
    * swap when groups stop fitting a sort buffer. Approximate by
    * construction → no DuckDB oracle (driver records rows-only);
    * `ApproxQuartilesSpec` bounds the rank error against the exact
    * result instead, mirroring the HLL `_approx` precedent. */
  def categoryQuantityQuartilesApprox(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(
      """SELECT category,
           approx_percentile(quantity, 0.25, 10000) AS q1,
           approx_percentile(quantity, 0.5, 10000) AS median,
           approx_percentile(quantity, 0.75, 10000) AS q3,
           count(*) AS n_lines
         FROM sales_tx GROUP BY category ORDER BY category""")
  }

  /** Relational bounds audit for [[categoryQuantityQuartilesApprox]]
    * — same pattern as Aggregations.revenueByCategoryApproxAudit: the
    * GK-sketch value can't hash-match an exact oracle, so the audit
    * outputs exact DISC order statistics at p ± 0.02 as the bound
    * window plus a within-window FLAG per quartile. The oracle emits
    * the same exact bounds and literal-1 flags; a sketch drifting past
    * a 2-percentile rank error (200× the accuracy-10000 guarantee)
    * flips a flag to 0 and fails the hash compare. Bounds and flags
    * are deterministic: percentile_disc is exact, and the flag is
    * robust to any within-guarantee sketch wobble. */
  def categoryQuantityQuartilesApproxAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "sales_tx", salesTx(spark, dir))
    spark.sql(
      """WITH a AS (SELECT category,
             approx_percentile(quantity, 0.25, 10000) AS q1a,
             approx_percentile(quantity, 0.5, 10000) AS meda,
             approx_percentile(quantity, 0.75, 10000) AS q3a,
             count(*) AS n_lines
           FROM sales_tx GROUP BY category),
         b AS (SELECT category,
             percentile_disc(0.23) WITHIN GROUP (ORDER BY quantity) AS lo_q1,
             percentile_disc(0.27) WITHIN GROUP (ORDER BY quantity) AS hi_q1,
             percentile_disc(0.48) WITHIN GROUP (ORDER BY quantity) AS lo_median,
             percentile_disc(0.52) WITHIN GROUP (ORDER BY quantity) AS hi_median,
             percentile_disc(0.73) WITHIN GROUP (ORDER BY quantity) AS lo_q3,
             percentile_disc(0.77) WITHIN GROUP (ORDER BY quantity) AS hi_q3
           FROM sales_tx GROUP BY category)
         SELECT a.category, n_lines,
           lo_q1, hi_q1, lo_median, hi_median, lo_q3, hi_q3,
           CAST(q1a BETWEEN lo_q1 AND hi_q1 AS INT) AS q1_within,
           CAST(meda BETWEEN lo_median AND hi_median AS INT) AS median_within,
           CAST(q3a BETWEEN lo_q3 AND hi_q3 AS INT) AS q3_within
         FROM a JOIN b ON a.category = b.category
         ORDER BY a.category""")
  }

  val categoryQuantityQuartilesApproxAuditOracle: String = OracleSql.withCtes(
    """SELECT category, count(*) AS n_lines,
         quantile_disc(quantity, 0.23) AS lo_q1,
         quantile_disc(quantity, 0.27) AS hi_q1,
         quantile_disc(quantity, 0.48) AS lo_median,
         quantile_disc(quantity, 0.52) AS hi_median,
         quantile_disc(quantity, 0.73) AS lo_q3,
         quantile_disc(quantity, 0.77) AS hi_q3,
         1 AS q1_within, 1 AS median_within, 1 AS q3_within
       FROM sales_tx GROUP BY category ORDER BY category""")

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    * match each other instead of vanishing — the semantics MERGE keys
    * need when "unknown" is itself a join value. Spark still plans a
    * hash join (null hashes as a regular key under null-safe
    * equality), so the scale shape is unchanged; the query reports,
    * per market segment, how many joined rows came through real keys
    * vs the NULL↔NULL channel. NULL keys are made deliberately rare
    * (≡0 mod 1000 / mod 997) because null-safe join cross-multiplies
    * the null groups — the same hot-key hazard as any skewed value,
    * and the reason production merges salt or pre-split the NULL
    * channel. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.io.Tables.orders(spark, dir)
      .selectExpr(
        "CASE WHEN o_orderkey % 1000 = 0 THEN NULL ELSE o_custkey END AS k")
    val c = graft.io.Tables.customer(spark, dir)
      .selectExpr(
        "CASE WHEN c_custkey % 997 = 0 THEN NULL ELSE c_custkey END AS k",
        "c_mktsegment")
    o.join(c, o("k") <=> c("k"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_joined"),
        sum(when(o("k").isNull, 1L).otherwise(0L)).as("n_null_channel"))
      .selectExpr("c_mktsegment", "n_joined",
        "CAST(n_null_channel AS BIGINT) AS n_null_channel")
      .orderBy("c_mktsegment")
  }

  val nullSafeJoinOracle: String =
    """WITH o AS (SELECT CASE WHEN o_orderkey % 1000 = 0 THEN NULL
            ELSE o_custkey END AS k FROM orders),
        c AS (SELECT CASE WHEN c_custkey % 997 = 0 THEN NULL
            ELSE c_custkey END AS k, c_mktsegment FROM customer),
        j AS (SELECT o.k AS ok, c.c_mktsegment
              FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k)
        SELECT c_mktsegment, count(*) AS n_joined,
          CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_channel
        FROM j GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** §2.3+ — semi/anti join breadth (absent in the reference, core
    * DataFrame API surface): anti = customers that never ordered;
    * semi = per-segment count of customers that did. Both keep the
    * build side to the single join column, so the broadcast/shuffle
    * side is as narrow as the operator allows. */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Entities.customers(spark, dir)
      .join(Entities.orders(spark, dir).select("customer_id"),
        Seq("customer_id"), "left_anti")
      .select("customer_id", "area", "customer_segment")
      .orderBy("customer_id")

  val customersWithoutOrdersOracle: String = OracleSql.withCtes(
    """SELECT customer_id, area, customer_segment FROM cust_e c
       WHERE NOT EXISTS (SELECT 1 FROM ord_e o WHERE o.customer_id = c.customer_id)
       ORDER BY customer_id""")

  def customersWithOrdersBySegment(spark: SparkSession, dir: String): DataFrame =
    Entities.customers(spark, dir)
      .join(Entities.orders(spark, dir).select("customer_id"),
        Seq("customer_id"), "left_semi")
      .groupBy("customer_segment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("customer_segment")

  val customersWithOrdersBySegmentOracle: String = OracleSql.withCtes(
    """SELECT customer_segment, count(*) AS n_customers FROM cust_e c
       WHERE EXISTS (SELECT 1 FROM ord_e o WHERE o.customer_id = c.customer_id)
       GROUP BY customer_segment ORDER BY customer_segment""")

  /** Pivot of sales revenue by delivery status — wide conditional
    * aggregation (Spark `.pivot()`, mirrored as conditional sums). */
  def salesPivotByStatus(spark: SparkSession, dir: String): DataFrame =
    salesTx(spark, dir)
      .join(Entities.orders(spark, dir).select("order_id", "delivery_status"),
        Seq("order_id"))
      .groupBy("category")
      .pivot("delivery_status", Seq("F", "O", "P"))
      .agg((sum(round(col("line_total") * 100).cast("long")) / 100.0))
      .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o", "P" -> "rev_p"))
      .orderBy("category")

  val salesPivotByStatusOracle: String = OracleSql.withCtes(
    """SELECT s.category,
         CAST(sum(CASE WHEN o.delivery_status = 'F' THEN CAST(round(s.line_total * 100) AS BIGINT) ELSE NULL END) AS BIGINT) / 100.0 AS rev_f,
         CAST(sum(CASE WHEN o.delivery_status = 'O' THEN CAST(round(s.line_total * 100) AS BIGINT) ELSE NULL END) AS BIGINT) / 100.0 AS rev_o,
         CAST(sum(CASE WHEN o.delivery_status = 'P' THEN CAST(round(s.line_total * 100) AS BIGINT) ELSE NULL END) AS BIGINT) / 100.0 AS rev_p
       FROM sales_tx s JOIN ord_e o ON s.order_id = o.order_id
       GROUP BY s.category ORDER BY s.category""")

  /** The inverse reshape (§2.4+ breadth): melt the pivoted per-status
    * revenue columns back to (category, status_col, revenue) rows with
    * the Dataset `unpivot` operator. Spark's unpivot EXCLUDES rows
    * whose value is NULL (a category with no orders in a status), so
    * the oracle filters `revenue IS NOT NULL` to pin the same
    * semantics. Reshape is metadata-only at scale — one projection per
    * value column, no shuffle beyond the pivoted input's own. */
  def salesUnpivot(spark: SparkSession, dir: String): DataFrame =
    salesPivotByStatus(spark, dir)
      .unpivot(Array(col("category")),
        Array(col("rev_f"), col("rev_o"), col("rev_p")),
        "status_col", "revenue")
      .orderBy("category", "status_col")

  val salesUnpivotOracle: String = {
    val pivot = salesPivotByStatusOracle
    s"""WITH pvt AS ($pivot)
        SELECT * FROM (
          SELECT category, 'rev_f' AS status_col, rev_f AS revenue FROM pvt
          UNION ALL
          SELECT category, 'rev_o', rev_o FROM pvt
          UNION ALL
          SELECT category, 'rev_p', rev_p FROM pvt)
        WHERE revenue IS NOT NULL
        ORDER BY category, status_col"""
  }

  /** Cohort retention — the classic warehouse report: customers are
    * grouped by first-order month (their cohort) and every later
    * order month becomes a (cohort, month) cell with distinct-customer
    * and revenue totals. Plan shape: one window min keyed by
    * customer_id (one shuffle), then a hash agg on the small
    * (cohort_month, order_month) grid; the single count(DISTINCT) is
    * rewritten to a two-phase agg, no Expand. Revenue is summed
    * cent-quantized (the repo's centSum rule) so the double is
    * order-independent and bit-exact vs the oracle. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ymNum = (m: String) =>
      s"(CAST(substring($m, 1, 4) AS INT) * 12 + CAST(substring($m, 6, 2) AS INT))"
    val o = graft.io.Tables.orders(spark, dir).selectExpr(
      "o_custkey AS customer_id",
      "date_format(o_orderdate, 'yyyy-MM') AS order_month",
      "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    o.withColumn("cohort_month",
        min(col("order_month")).over(Window.partitionBy("customer_id")))
      .groupBy("cohort_month", "order_month")
      .agg(countDistinct("customer_id").as("n_customers"),
        count(lit(1)).as("n_orders"), sum("cents").as("cents"))
      .selectExpr("cohort_month", "order_month",
        s"CAST(${ymNum("order_month")} - ${ymNum("cohort_month")} AS INTEGER) AS months_since",
        "n_customers", "n_orders", "cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("cohort_month", "order_month")
  }

  val retentionCohortsOracle: String = {
    val ymNum = (m: String) =>
      s"(CAST(substring($m, 1, 4) AS INT) * 12 + CAST(substring($m, 6, 2) AS INT))"
    s"""WITH o AS (SELECT o_custkey AS customer_id,
            strftime(o_orderdate, '%Y-%m') AS order_month,
            CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        c AS (SELECT *, min(order_month) OVER (PARTITION BY customer_id)
                AS cohort_month FROM o),
        g AS (SELECT cohort_month, order_month,
                count(DISTINCT customer_id) AS n_customers,
                count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS cents
              FROM c GROUP BY cohort_month, order_month)
        SELECT cohort_month, order_month,
          CAST(${ymNum("order_month")} - ${ymNum("cohort_month")} AS INTEGER) AS months_since,
          n_customers, n_orders, cents / CAST(100 AS DOUBLE) AS revenue
        FROM g ORDER BY cohort_month, order_month"""
  }

  /** Deep join-chain revenue rollup: lineitem → orders → customer →
    * nation → region with cent-quantized discounted revenue per
    * (region, nation) — the TPC-H-Q5-shaped stress of the join
    * planner. Plan shape at scale: the two fact relations shuffle-join
    * on their keys; customer/nation/region are classic broadcast dims
    * (Catalyst picks BroadcastHashJoin under the default threshold),
    * so the chain collapses to two big exchanges + three broadcasts,
    * and the revenue quantization keeps the sum partition-independent. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val t = (n: String) => graft.io.Tables.table(spark, dir, n)
    t("lineitem")
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents")
      .join(t("orders").selectExpr("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t("customer").selectExpr("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(t("nation").selectExpr("n_nationkey", "n_name", "n_regionkey"),
        col("c_nationkey") === col("n_nationkey"))
      .join(t("region").selectExpr("r_regionkey", "r_name"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"), sum("rev_cents").as("rev_cents"))
      .selectExpr("region", "nation", "n_lines",
        "rev_cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("region", "nation")
  }

  val revenueByNationOracle: String =
    """WITH l AS (SELECT l_orderkey,
            CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents
          FROM lineitem),
        j AS (SELECT r.r_name AS region, n.n_name AS nation, l.rev_cents
              FROM l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey),
        g AS (SELECT region, nation, count(*) AS n_lines,
                CAST(sum(rev_cents) AS BIGINT) AS rev_cents
              FROM j GROUP BY region, nation)
        SELECT region, nation, n_lines,
          rev_cents / CAST(100 AS DOUBLE) AS revenue
        FROM g ORDER BY region, nation"""

  /** The ship-date boundary splitting "already aggregated" history from
    * the newly arrived delta for [[incrementalRefresh]]. */
  private val refreshSplitDate = "1998-06-01"

  /** Incremental aggregate maintenance — the materialized-view /
    * streaming-state pattern: the standing aggregate over historical
    * data is NOT recomputed when a delta arrives; instead the delta is
    * aggregated alone and MERGED into the stored state. Every emitted
    * statistic is kept in its decomposable form (counts, integer-cent
    * sums, min/max — all commutative monoids), so
    * merge(agg(base), agg(delta)) is bit-identical to agg(base ∪ delta)
    * under any partitioning; the non-decomposable mean is derived from
    * the merged (sum, count) pair at the end. The oracle IS the full
    * recompute — the equality this query verifies is the one that makes
    * incremental refresh safe at 100 TB, where re-reading history per
    * batch is the thing you cannot afford. Plan shape: two
    * map-side-combined hash aggs onto the tiny (returnflag, linestatus)
    * grid and one broadcast-sized full-outer merge. */
  def incrementalRefresh(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.io.Tables.lineitem(spark, dir)
    def aggSlice(pred: Column): DataFrame =
      li.filter(pred)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("price_cents"),
          min(to_date(col("l_shipdate"))).as("first_ship"),
          max(to_date(col("l_shipdate"))).as("last_ship"))
    val base = aggSlice(col("l_shipdate") < lit(refreshSplitDate))
    val delta = aggSlice(col("l_shipdate") >= lit(refreshSplitDate))
    val b = base.columns.filterNot(Seq("l_returnflag", "l_linestatus").contains)
      .foldLeft(base) { (d, c) => d.withColumnRenamed(c, s"b_$c") }
    val d = delta.columns.filterNot(Seq("l_returnflag", "l_linestatus").contains)
      .foldLeft(delta) { (df2, c) => df2.withColumnRenamed(c, s"d_$c") }
    b.join(d, Seq("l_returnflag", "l_linestatus"), "full_outer")
      .selectExpr("l_returnflag", "l_linestatus",
        "CAST(coalesce(b_n, 0) + coalesce(d_n, 0) AS BIGINT) AS n_rows",
        "CAST(coalesce(b_qty_cents, 0) + coalesce(d_qty_cents, 0) AS BIGINT) AS qty_cents",
        "CAST(coalesce(b_price_cents, 0) + coalesce(d_price_cents, 0) AS BIGINT) AS price_cents",
        "least(coalesce(b_first_ship, d_first_ship), coalesce(d_first_ship, b_first_ship)) AS first_ship",
        "greatest(coalesce(b_last_ship, d_last_ship), coalesce(d_last_ship, b_last_ship)) AS last_ship")
      .selectExpr("l_returnflag", "l_linestatus", "n_rows",
        "qty_cents / CAST(100 AS DOUBLE) AS sum_qty",
        "price_cents / CAST(100 AS DOUBLE) AS sum_price",
        "(price_cents / CAST(100 AS DOUBLE)) / n_rows AS avg_price",
        "CAST(first_ship AS STRING) AS first_ship",
        "CAST(last_ship AS STRING) AS last_ship")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Oracle = direct full recompute (no base/delta split): passing
    * means the merge path and the monolithic path agree bit-for-bit. */
  val incrementalRefreshOracle: String =
    """WITH g AS (SELECT l_returnflag, l_linestatus,
            count(*) AS n_rows,
            CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
            min(CAST(l_shipdate AS DATE)) AS first_ship,
            max(CAST(l_shipdate AS DATE)) AS last_ship
          FROM lineitem GROUP BY 1, 2)
        SELECT l_returnflag, l_linestatus, CAST(n_rows AS BIGINT) AS n_rows,
          qty_cents / CAST(100 AS DOUBLE) AS sum_qty,
          price_cents / CAST(100 AS DOUBLE) AS sum_price,
          (price_cents / CAST(100 AS DOUBLE)) / n_rows AS avg_price,
          CAST(first_ship AS VARCHAR) AS first_ship,
          CAST(last_ship AS VARCHAR) AS last_ship
        FROM g ORDER BY l_returnflag, l_linestatus"""

  /** CDC merge-apply — the row-level twin of [[incrementalRefresh]]:
    * a base snapshot plus a changelog of upserts/deletes/inserts
    * produces the next snapshot WITHOUT rewriting untouched rows'
    * content. The changelog here is synthesized deterministically from
    * the orders table (keys ≡ 0 mod 7 are updated or, when also ≡ 0
    * mod 3, deleted; keys ≡ 0 mod 11 insert under a shifted key), so
    * all three operation kinds are exercised non-trivially at every
    * scale factor. Plan shape: the changelog is a small fraction of
    * the base, so the touched-keys anti-join broadcasts and the apply
    * is one scan + union — the merge pattern a lakehouse MERGE INTO
    * compiles to when the delta is dimension-sized. Money stays in
    * integer cents until the final projection. */
  /** The quantized orders snapshot the CDC fixtures run on. */
  private def ordersSnapshot(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents")

  /** The deterministic changelog shared by [[cdcApply]] and
    * [[tableDiff]]: keys ≡ 0 mod 7 update (or, when also ≡ 0 mod 3,
    * delete); keys ≡ 0 mod 11 insert under a shifted key. */
  private def ordersChangelog(o: DataFrame): DataFrame =
    o.filter("o_orderkey % 7 = 0")
      .selectExpr("o_orderkey AS key",
        "CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op",
        "o_custkey", "o_orderstatus",
        "price_cents + 10000 AS price_cents")
      .unionByName(o.filter("o_orderkey % 11 = 0")
        .selectExpr("o_orderkey + 1000000000 AS key", "'I' AS op",
          "o_custkey", "o_orderstatus", "price_cents"))

  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = ordersSnapshot(spark, dir)
    applyChanges(o, ordersChangelog(o))
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "price_cents / CAST(100 AS DOUBLE) AS total_price")
      .orderBy("o_orderkey")
  }

  /** One CDC application step: drop base rows whose key is touched,
    * then union the upserted/inserted versions. Public so the
    * streaming fold spec can prove the micro-batch decomposition —
    * applying a changelog in key-disjoint batches, state-to-state,
    * lands on the same snapshot as one bulk apply (the property that
    * makes a `foreachBatch` CDC sink correct). */
  def applyChanges(base: DataFrame, changes: DataFrame): DataFrame = {
    val touched = changes.filter("op IN ('U', 'D')").select("key")
    val kept = base.join(broadcast(touched),
      base("o_orderkey") === touched("key"), "left_anti")
    val applied = changes.filter("op <> 'D'")
      .selectExpr("key AS o_orderkey", "o_custkey", "o_orderstatus",
        "price_cents")
    kept.unionByName(applied)
  }

  val cdcApplyOracle: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
            CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders),
        changes AS (
          SELECT o_orderkey AS key,
            CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
            o_custkey, o_orderstatus, price_cents + 10000 AS price_cents
          FROM o WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, 'I', o_custkey, o_orderstatus,
            price_cents
          FROM o WHERE o_orderkey % 11 = 0),
        kept AS (SELECT * FROM o WHERE o_orderkey NOT IN
          (SELECT key FROM changes WHERE op IN ('U', 'D'))),
        applied AS (SELECT key AS o_orderkey, o_custkey, o_orderstatus,
            price_cents FROM changes WHERE op <> 'D')
        SELECT o_orderkey, o_custkey, o_orderstatus,
          price_cents / CAST(100 AS DOUBLE) AS total_price
        FROM (SELECT * FROM kept UNION ALL SELECT * FROM applied)
        ORDER BY o_orderkey"""

  /** Price-tier band join: lineitem rows matched to a 3-row tier
    * dimension on `lo <= price < hi` — the non-equi BAND JOIN class
    * (vs the equi/interval joins elsewhere). Spark plans a
    * BroadcastNestedLoopJoin: each row tests against 3 broadcast tier
    * rows, linear cost with a tiny constant — the CORRECT plan when
    * the band table is dimension-sized (the alternative, a CASE
    * binning projection like [[graft.ops.Profile.priceHistogram]], is
    * faster but hardcodes the bands at plan time; the join form keeps
    * them data). A band dim with many rows would instead want bucketed
    * pre-binning — documented trade, not applicable at 3 rows. */
  def priceTierJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("budget", 0.0, 20000.0),
      ("mid", 20000.0, 60000.0),
      ("premium", 60000.0, 120000.0))
      .toDF("tier", "lo", "hi")
    val li = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_extendedprice AS price",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents")
    li.join(broadcast(tiers),
        li("price") >= tiers("lo") && li("price") < tiers("hi"))
      .groupBy("tier", "lo", "hi")
      .agg(count(lit(1)).as("n_rows"), sum("price_cents").as("cents"))
      .selectExpr("tier", "lo", "hi", "n_rows",
        "cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("lo")
  }

  val priceTierJoinOracle: String =
    """WITH tiers(tier, lo, hi) AS (VALUES
          ('budget', CAST(0 AS DOUBLE), CAST(20000 AS DOUBLE)),
          ('mid', CAST(20000 AS DOUBLE), CAST(60000 AS DOUBLE)),
          ('premium', CAST(60000 AS DOUBLE), CAST(120000 AS DOUBLE))),
        j AS (SELECT t.tier, t.lo, t.hi, l.l_extendedprice,
                CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_cents
              FROM lineitem l JOIN tiers t
                ON l.l_extendedprice >= t.lo AND l.l_extendedprice < t.hi)
        SELECT tier, lo, hi, count(*) AS n_rows,
          CAST(sum(price_cents) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
        FROM j GROUP BY tier, lo, hi ORDER BY lo"""

  /** Relational division: customers ALL of whose orders are high
    * priority (1-URGENT / 2-HIGH — wide enough that every scale factor
    * has a non-empty, non-trivial answer) —
    * the "for-all" query shape (÷ in relational algebra) that trips up
    * naive join thinking because joins express "exists", not "every".
    * Implemented as one aggregate over the orders scan: per customer,
    * total orders and violating orders; division = violators == 0 with
    * at least one order. That beats the textbook double-NOT-EXISTS at
    * scale — one map-side-combined hash agg on the child table, no
    * correlated probes — while the oracle states the same predicate in
    * the classical NOT EXISTS form, so the pass proves the rewrite. */
  def customersAllUrgent(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.orders(spark, dir)
      .selectExpr("o_custkey",
        "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END AS viol")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum("viol").as("n_violations"))
      .filter("n_violations = 0")
      .selectExpr("o_custkey", "n_orders")
      .orderBy("o_custkey")

  val customersAllUrgentOracle: String =
    """SELECT o_custkey, count(*) AS n_orders
       FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM orders x
         WHERE x.o_custkey = o.o_custkey
           AND x.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
       GROUP BY o_custkey
       ORDER BY o_custkey"""

  /** Gaps-and-islands over each customer's order stream: consecutive
    * orders with the same o_orderpriority collapse into one "island"
    * (SCD-2-style validity run), via the canonical two-window
    * technique — a lag-change flag, then a running sum of flags as the
    * island id — with o_orderkey as the total-order tiebreak. Both
    * windows share ONE partitioning (user key), so the plan pays a
    * single hash-partition exchange + sort, the same shuffle
    * sessionization pays; the island collapse is a map-side-combinable
    * hash agg on (customer, island). This is the value-change twin of
    * time-gap sessionization ([[graft.streaming.Sessionize]]): runs end
    * when an ATTRIBUTE changes, not when a clock gap opens. */
  def priorityIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    graft.io.Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(byTime).isNull
          .or(lag(col("o_orderpriority"), 1).over(byTime) =!= col("o_orderpriority")), 1)
          .otherwise(0))
      .withColumn("island", sum(col("chg")).over(byTime))
      .groupBy(col("o_custkey"), col("island"))
      .agg(min(col("o_orderpriority")).as("priority"),
        count(lit(1)).as("n_orders"),
        min(col("od")).as("first_date"), max(col("od")).as("last_date"))
      .selectExpr("o_custkey", "CAST(island AS BIGINT) AS island",
        "priority", "n_orders",
        "CAST(first_date AS STRING) AS first_date",
        "CAST(last_date AS STRING) AS last_date")
      .orderBy("o_custkey", "island")
  }

  val priorityIslandsOracle: String =
    """WITH o AS (SELECT o_custkey, o_orderkey, o_orderpriority,
            CAST(o_orderdate AS DATE) AS od,
            CASE WHEN lag(o_orderpriority) OVER w IS NULL
              OR lag(o_orderpriority) OVER w <> o_orderpriority
              THEN 1 ELSE 0 END AS chg
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)),
        i AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey
            ORDER BY od, o_orderkey) AS island FROM o)
        SELECT o_custkey, CAST(island AS BIGINT) AS island,
          min(o_orderpriority) AS priority,
          count(*) AS n_orders,
          CAST(min(od) AS VARCHAR) AS first_date,
          CAST(max(od) AS VARCHAR) AS last_date
        FROM i GROUP BY o_custkey, island
        ORDER BY o_custkey, island"""

  /** S5 — source-file provenance via the parquet `_metadata` column
    * (the modern form of input_file_name(), reference 05:31-45). */
  def fileProvenance(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.table(spark, dir, "lineitem") // raw scan: _metadata needs the file relation
      .select(col("_metadata.file_name").as("file_name"))
      .groupBy("file_name")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("file_name")

  /** The fixture is one file per table, so the oracle is the literal
    * file name + total count. */
  val fileProvenanceOracle: String =
    "SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows FROM lineitem"

  /** §2.6 set-op completion: INTERSECT and both EXCEPT directions over
    * the 1997-vs-1998 active-customer key sets, tagged and counted.
    * Spark plans INTERSECT as a distinct left-semi join and EXCEPT as
    * a distinct left-anti — both equi-shuffles on the key, no sort.
    * At 100 TB the distinct collapses each year's orders to its
    * customer-key set BEFORE the join, so the set op moves keys, not
    * order rows. */
  def customerYearSetOps(spark: SparkSession, dir: String): DataFrame = {
    def activeIn(year: Int) = graft.io.Tables.table(spark, dir, "orders")
      .filter(s"extract(year FROM CAST(o_orderdate AS DATE)) = $year")
      .select("o_custkey")
    val a = activeIn(1997)
    val b = activeIn(1998)
    def tag(df: DataFrame, t: String) =
      df.agg(count(lit(1)).as("n_customers")).selectExpr(s"'$t' AS cohort",
        "n_customers")
    tag(a.intersect(b), "both_years")
      .unionByName(tag(a.except(b), "only_1997"))
      .unionByName(tag(b.except(a), "only_1998"))
      .orderBy("cohort")
  }

  val customerYearSetOpsOracle: String =
    """WITH a AS (SELECT o_custkey FROM orders
          WHERE extract(year FROM CAST(o_orderdate AS DATE)) = 1997),
        b AS (SELECT o_custkey FROM orders
          WHERE extract(year FROM CAST(o_orderdate AS DATE)) = 1998)
        SELECT 'both_years' AS cohort, count(*) AS n_customers
          FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        UNION ALL
        SELECT 'only_1997', count(*)
          FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        UNION ALL
        SELECT 'only_1998', count(*)
          FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        ORDER BY cohort"""

  /** Time-hierarchy ROLLUP: (year, quarter, month) subtotals over
    * orders in one pass — the calendar drill-down every revenue
    * dashboard runs. ROLLUP plans as a single Expand (4 grouping sets)
    * into one hash agg: the fact table is read ONCE for all four
    * levels, vs four separate scans+aggs. Rolled-up levels are
    * coalesced to -1 (calendar fields are never negative) instead of
    * NULL so the final ordering is total under BOTH engines' NULL
    * placement rules. Revenue stays an exact cent sum until the one
    * final division. */
  def ordersTimeRollup(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.table(spark, dir, "orders")
      .selectExpr(
        "CAST(extract(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year",
        "CAST(extract(quarter FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_quarter",
        "CAST(extract(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_month",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .rollup("o_year", "o_quarter", "o_month")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("cents"))
      .selectExpr("coalesce(o_year, -1) AS o_year",
        "coalesce(o_quarter, -1) AS o_quarter",
        "coalesce(o_month, -1) AS o_month", "n_orders",
        "CAST(cents AS DOUBLE) / 100.0 AS revenue")
      .orderBy("o_year", "o_quarter", "o_month")

  /** Table diff — the INVERSE of [[cdcApply]]: given two versions of a
    * table, derive what changed (the changelog a CDC system would have
    * emitted). v2 here is the applied CDC snapshot, so the diff's
    * added/removed/changed census is forced to reconcile exactly with
    * the changelog that produced it — inserts appear as added, deletes
    * as removed, updates as changed with the known +100.00 delta.
    * Mechanics: one full-outer join on the key, presence classifies
    * added/removed, and surviving pairs compare content with
    * IS DISTINCT FROM (null-safe, dialect-identical). Scale shape: the
    * full-outer key shuffle is the irreducible cost of diffing two
    * unsorted 100 TB tables; the practical mitigations are comparing
    * narrow per-row checksums instead of wide rows (tableChecksum's
    * canonical string) and diffing partition-by-partition where layout
    * allows. Output is the aggregate census, exact to the cent. */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = ordersSnapshot(spark, dir)
    val v2 = applyChanges(base, ordersChangelog(base))
      .selectExpr("o_orderkey AS v2_key", "o_custkey AS v2_custkey",
        "o_orderstatus AS v2_status", "price_cents AS v2_cents")
    base.join(v2, col("o_orderkey") === col("v2_key"), "full_outer")
      .selectExpr(
        """CASE WHEN o_orderkey IS NULL THEN 'added'
               WHEN v2_key IS NULL THEN 'removed'
               WHEN o_custkey IS DISTINCT FROM v2_custkey
                 OR o_orderstatus IS DISTINCT FROM v2_status
                 OR price_cents IS DISTINCT FROM v2_cents THEN 'changed'
               ELSE 'unchanged' END AS status""",
        "coalesce(v2_cents, 0) - coalesce(price_cents, 0) AS delta_cents")
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"),
        sum("delta_cents").as("delta_cents"))
      .selectExpr("status", "n_rows",
        "delta_cents / CAST(100 AS DOUBLE) AS value_delta")
      .orderBy("status")
  }

  val tableDiffOracle: String =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus,
            CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
          FROM orders),
        changes AS (
          SELECT o_orderkey AS key,
            CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
            o_custkey, o_orderstatus, price_cents + 10000 AS price_cents
          FROM o WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey + 1000000000, 'I', o_custkey, o_orderstatus,
            price_cents
          FROM o WHERE o_orderkey % 11 = 0),
        v2 AS (
          SELECT o.o_orderkey AS v2_key, o.o_custkey AS v2_custkey,
            o.o_orderstatus AS v2_status, o.price_cents AS v2_cents
          FROM o WHERE NOT EXISTS (SELECT 1 FROM changes c
            WHERE c.op IN ('U', 'D') AND c.key = o.o_orderkey)
          UNION ALL
          SELECT key, o_custkey, o_orderstatus, price_cents
          FROM changes WHERE op <> 'D'),
        d AS (SELECT
            CASE WHEN o.o_orderkey IS NULL THEN 'added'
                 WHEN v2.v2_key IS NULL THEN 'removed'
                 WHEN o.o_custkey IS DISTINCT FROM v2.v2_custkey
                   OR o.o_orderstatus IS DISTINCT FROM v2.v2_status
                   OR o.price_cents IS DISTINCT FROM v2.v2_cents THEN 'changed'
                 ELSE 'unchanged' END AS status,
            coalesce(v2.v2_cents, 0) - coalesce(o.price_cents, 0) AS delta_cents
          FROM o FULL OUTER JOIN v2 ON o.o_orderkey = v2.v2_key)
        SELECT status, count(*) AS n_rows,
          CAST(sum(delta_cents) AS BIGINT) / CAST(100 AS DOUBLE) AS value_delta
        FROM d GROUP BY status ORDER BY status"""

  /** Schema-evolution union: two vintages of the part dim — an old
    * extract missing the size/price columns and a new one carrying
    * them — combine with `unionByName(allowMissingColumns = true)`,
    * which pads the absent columns with NULL by NAME (a positional
    * UNION would silently misalign). The census separates the
    * vintages' contributions, so a pad bug cannot hide. This is the
    * daily reality of a 100 TB lake: readers must span files written
    * before and after a column was added, and the name-based
    * resolution here is the same contract parquet schema merging
    * applies at the file level. */
  def partsUnionEvolved(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.io.Tables.table(spark, dir, "part")
    val oldV = p.filter("p_partkey % 2 = 0")
      .selectExpr("p_partkey", "p_brand", "'v1' AS vintage")
    val newV = p.filter("p_partkey % 2 = 1")
      .selectExpr("p_partkey", "p_brand", "'v2' AS vintage", "p_size",
        "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents")
    oldV.unionByName(newV, allowMissingColumns = true)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        expr("sum(CASE WHEN vintage = 'v1' THEN 1 ELSE 0 END)").as("n_v1"),
        expr("sum(CASE WHEN p_size IS NULL THEN 1 ELSE 0 END)").as("n_no_size"),
        expr("CAST(coalesce(sum(price_cents), 0) AS BIGINT)").as("cents"))
      .selectExpr("p_brand", "n_parts", "n_v1", "n_no_size",
        "cents / CAST(100 AS DOUBLE) AS priced_value")
      .orderBy("p_brand")
  }

  val partsUnionEvolvedOracle: String =
    """WITH u AS (
          SELECT p_partkey, p_brand, 'v1' AS vintage,
            NULL AS p_size, NULL AS price_cents
          FROM part WHERE p_partkey % 2 = 0
          UNION ALL
          SELECT p_partkey, p_brand, 'v2', p_size,
            CAST(round(p_retailprice * 100) AS BIGINT)
          FROM part WHERE p_partkey % 2 = 1)
        SELECT p_brand, count(*) AS n_parts,
          CAST(sum(CASE WHEN vintage = 'v1' THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
          CAST(sum(CASE WHEN p_size IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_size,
          CAST(coalesce(sum(price_cents), 0) AS BIGINT) / CAST(100 AS DOUBLE)
            AS priced_value
        FROM u GROUP BY p_brand ORDER BY p_brand"""

  /** Recursive CTE (new engine surface in Spark 4) — hierarchy
    * flattening: every part walks its synthetic ancestor chain
    * parent = key DIV 10 (a clean decimal-trie hierarchy over the key
    * space) down to root 0, and the rollup reports population and
    * distinct-ancestor counts per depth. The recursion terminates
    * because the key STRICTLY DECREASES each step — the shape to
    * insist on, since Spark's recursive CTEs are UNION ALL-only today
    * ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE], probed on 4.1.2), so a
    * cyclic walk (e.g. transitive closure of the near-dup pair graph)
    * cannot rely on the UNION-distinct fixpoint to converge and would
    * enumerate paths forever; that closure stays on
    * [[graft.llm.Dedup.dedupClusters]]'s pointer-jumping, which also
    * beats row-per-step recursion at 100 TB (log-diameter rounds, one
    * relation per round, dedup each round). Work here is bounded by
    * key width: rows = parts × ~7 levels, each iteration one
    * broadcast-free self-extension. The oracle runs the SAME text
    * modulo integer-division spelling. */
  def partsHierarchyRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.io.Views.register(dir, "ph_part",
      graft.io.Tables.table(spark, dir, "part").select("p_partkey"))
    spark.sql(partsHierarchySql(graft.llm.Gen.SparkD, "ph_part"))
  }

  private def partsHierarchySql(d: graft.llm.Gen.Dialect,
      table: String): String = {
    val step = graft.llm.Gen.intDiv("a.anc_key", "10", d)
    s"""WITH RECURSIVE anc(p_partkey, anc_key, depth) AS (
          SELECT p_partkey, CAST(p_partkey AS BIGINT), 0 FROM $table
          UNION ALL
          SELECT a.p_partkey, $step, a.depth + 1
          FROM anc a WHERE a.anc_key > 0)
        SELECT depth, count(*) AS n_nodes,
          count(DISTINCT anc_key) AS n_ancestors,
          CAST(min(anc_key) AS BIGINT) AS min_key,
          CAST(max(anc_key) AS BIGINT) AS max_key
        FROM anc GROUP BY depth ORDER BY depth"""
  }

  val partsHierarchyRollupOracle: String =
    partsHierarchySql(graft.llm.Gen.DuckD, "part")

  /** Ordered string aggregation — the report column every BI export
    * wants ("list the members, in order"). Spark has no ordered
    * string_agg, and collect_list's order is partition-dependent, so
    * the deterministic form is collect → sort_array by a TOTAL key →
    * project → join: the sort happens per GROUP on the collected
    * array (no global sort), making the result independent of
    * partitioning — the property the md5 column proves, since it
    * hashes the full ordered concatenation and must match DuckDB's
    * string_agg(... ORDER BY) byte-for-byte. Scale note: the collected
    * array lives in one aggregation buffer, so this is for
    * dimension-sized groups (suppliers per nation); an unbounded
    * event stream per group wants the TopKAgg heap instead. */
  def supplierRoster(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.table(spark, dir, "supplier")
      .join(broadcast(graft.io.Tables.table(spark, dir, "nation")
          .select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sort_array(collect_list(struct(col("s_suppkey"), col("s_name"))))
          .as("members"))
      .selectExpr("nation", "n_suppliers",
        "array_join(transform(slice(members, 1, 3), x -> x.s_name), ',') AS first3",
        "md5(array_join(transform(members, x -> x.s_name), ',')) AS roster_md5")
      .orderBy("nation")

  val supplierRosterOracle: String =
    """SELECT n.n_name AS nation, count(*) AS n_suppliers,
          string_agg(s.s_name, ',' ORDER BY s.s_suppkey, s.s_name)
            FILTER (WHERE rk <= 3) AS first3,
          md5(string_agg(s.s_name, ',' ORDER BY s.s_suppkey, s.s_name))
            AS roster_md5
        FROM (SELECT *, row_number() OVER (PARTITION BY s_nationkey
                ORDER BY s_suppkey, s_name) AS rk FROM supplier) s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name"""

  val ordersTimeRollupOracle: String =
    """WITH q AS (SELECT
          CAST(extract(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
          CAST(extract(quarter FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_quarter,
          CAST(extract(month FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_month,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders),
        g AS (SELECT o_year, o_quarter, o_month, count(*) AS n_orders,
            sum(cents) AS cents
          FROM q GROUP BY ROLLUP (o_year, o_quarter, o_month))
        SELECT coalesce(o_year, -1) AS o_year,
          coalesce(o_quarter, -1) AS o_quarter,
          coalesce(o_month, -1) AS o_month, n_orders,
          CAST(cents AS DOUBLE) / 100.0 AS revenue
        FROM g ORDER BY o_year, o_quarter, o_month"""

  // ---- CUBE with grouping id ----

  /** Full CUBE over (priority, status) with exact-cents revenue — the
    * grouping-sets surface beyond the existing ROLLUP: all four
    * aggregation grains (detail, by-priority, by-status, grand total)
    * in ONE pass, disambiguated by grouping_id (bit i set = column i
    * rolled up; Spark's first-listed column is the high bit and the
    * DuckDB twin composes GROUPING(p)*2 + GROUPING(s) to match).
    * Rolled-up keys are coalesced to '(all)' IN the query — NULL
    * group keys would otherwise hit the engines' opposite default
    * NULL sort orders, and a sentinel the data cannot contain is the
    * deterministic fix. Cube expansion is 4 rows per input row into a
    * map-side-combined agg onto a dims-bounded grid. */
  def ordersCube(spark: SparkSession, dir: String): DataFrame =
    graft.io.Tables.table(spark, dir, "orders")
      .selectExpr("o_orderpriority AS priority", "o_orderstatus AS status",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c")
      .cube("priority", "status")
      .agg(count(lit(1)).as("n_orders"), sum("price_c").as("rev_c"),
        grouping_id().as("grouping_id"))
      .selectExpr("coalesce(priority, '(all)') AS priority",
        "coalesce(status, '(all)') AS status", "grouping_id",
        "n_orders", "CAST(rev_c AS DOUBLE) / 100.0 AS revenue")
      .orderBy("grouping_id", "priority", "status")

  val ordersCubeOracle: String =
    """WITH o AS (SELECT o_orderpriority AS priority,
          o_orderstatus AS status,
          CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders)
       SELECT coalesce(priority, '(all)') AS priority,
         coalesce(status, '(all)') AS status,
         CAST(GROUPING(priority) * 2 + GROUPING(status) AS BIGINT)
           AS grouping_id,
         count(*) AS n_orders,
         CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue
       FROM o GROUP BY CUBE (priority, status)
       ORDER BY grouping_id, priority, status"""

  // ---- incremental JOIN-view maintenance (delta algebra) ----

  /** `orders_join_view_delta`: the delta-join identity that maintains
    * a materialized JOIN view incrementally — the third member of the
    * maintenance family ([[incrementalRefresh]] = aggregates,
    * [[ordersCdcApply]] = row-level upserts; this = joins):
    *
    *   (O∪ΔO) ⋈ (L∪ΔL) = O⋈L  ∪  ΔO⋈L  ∪  O⋈ΔL  ∪  ΔO⋈ΔL
    *
    * At 100 TB the first term is the standing view you must never
    * recompute; the three delta terms are each bounded by a delta-side
    * scan (and their joins broadcast the delta when it's small — the
    * streaming/CDC join shape). The query splits both fixture
    * relations by deterministic key predicates, evaluates all four
    * branches AND the direct full join, and emits per-branch
    * order-independent digests: row count, exact cent sum, and a
    * content checksum (BIGINT sum of 32-bit md5 prefixes of the join
    * keys). The `union` row sums the four branches; it must equal the
    * `full_join` row on both engines — the identity is verified by the
    * hash compare, not asserted by the code. Disjointness of the four
    * branches (what makes UNION ALL valid) is by construction:
    * old/delta predicates partition each side. */
  def ordersJoinViewDelta(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.Gen.hexPrefix32
    val o = graft.io.Tables.table(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_orderkey % 7 = 0 AS o_delta")
    val l = graft.io.Tables.table(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
        "(l_orderkey * 31 + l_linenumber) % 5 = 0 AS l_delta")
    val rowHash = hexPrefix32(
      "md5(concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING)))")
    def branch(name: String, oDelta: Boolean, lDelta: Boolean): DataFrame =
      o.filter(col("o_delta") === oDelta)
        .join(l.filter(col("l_delta") === lDelta),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum("cents"), lit(0L)).as("cents_sum"),
          coalesce(sum(expr(rowHash)), lit(0L)).as("key_checksum"))
        .selectExpr(s"'$name' AS branch", "CAST(n_rows AS BIGINT) AS n_rows",
          "CAST(cents_sum AS BIGINT) AS cents_sum",
          "CAST(key_checksum AS BIGINT) AS key_checksum")
    val branches = Seq(
      branch("1_old", oDelta = false, lDelta = false),
      branch("2_delta_orders", oDelta = true, lDelta = false),
      branch("3_delta_lines", oDelta = false, lDelta = true),
      branch("4_delta_both", oDelta = true, lDelta = true))
    val unionRow = branches.reduce(_ unionByName _)
      .agg(sum("n_rows").as("n_rows"), sum("cents_sum").as("cents_sum"),
        sum("key_checksum").as("key_checksum"))
      .selectExpr("'5_union' AS branch", "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(cents_sum AS BIGINT) AS cents_sum",
        "CAST(key_checksum AS BIGINT) AS key_checksum")
    val fullRow = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum("cents"), lit(0L)).as("cents_sum"),
        coalesce(sum(expr(rowHash)), lit(0L)).as("key_checksum"))
      .selectExpr("'6_full_join' AS branch", "CAST(n_rows AS BIGINT) AS n_rows",
        "CAST(cents_sum AS BIGINT) AS cents_sum",
        "CAST(key_checksum AS BIGINT) AS key_checksum")
    (branches :+ unionRow :+ fullRow).reduce(_ unionByName _)
      .orderBy("branch")
  }

  val ordersJoinViewDeltaOracle: String = {
    import graft.llm.Gen.hexPrefix32
    val rowHash = hexPrefix32(
      "md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR))")
    def branchSql(name: String, oPred: String, lPred: String): String =
      s"""SELECT '$name' AS branch, CAST(count(*) AS BIGINT) AS n_rows,
            CAST(coalesce(sum(l.cents), 0) AS BIGINT) AS cents_sum,
            CAST(coalesce(sum($rowHash), 0) AS BIGINT) AS key_checksum
          FROM (SELECT o_orderkey FROM orders WHERE $oPred) o
          JOIN (SELECT l_orderkey, l_linenumber,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                FROM lineitem WHERE $lPred) l
            ON o.o_orderkey = l.l_orderkey"""
    val oldO = "NOT (o_orderkey % 7 = 0)"
    val newO = "o_orderkey % 7 = 0"
    val oldL = "NOT ((l_orderkey * 31 + l_linenumber) % 5 = 0)"
    val newL = "(l_orderkey * 31 + l_linenumber) % 5 = 0"
    s"""WITH b AS (
          ${branchSql("1_old", oldO, oldL)}
          UNION ALL ${branchSql("2_delta_orders", newO, oldL)}
          UNION ALL ${branchSql("3_delta_lines", oldO, newL)}
          UNION ALL ${branchSql("4_delta_both", newO, newL)}),
        u AS (SELECT '5_union' AS branch,
            CAST(sum(n_rows) AS BIGINT) AS n_rows,
            CAST(sum(cents_sum) AS BIGINT) AS cents_sum,
            CAST(sum(key_checksum) AS BIGINT) AS key_checksum
          FROM b),
        f AS (${branchSql("6_full_join", "1 = 1", "1 = 1")})
        SELECT * FROM b
        UNION ALL SELECT * FROM u
        UNION ALL SELECT * FROM f
        ORDER BY branch"""
  }

  // ---- arc price elasticity of demand ----

  /** `parts_arc_elasticity`: per-brand arc (midpoint-formula) price
    * elasticity of demand — %Δquantity over %Δprice between the
    * brand's cheaper and dearer transaction halves, with midpoint
    * denominators so the sign convention is symmetric (Allen &
    * Lerner 1934; the log-log regression alternative needs libm, the
    * arc form needs only ratios of exact sums). The halves split at
    * the brand's exact unit-price median rank with a unique
    * (orderkey, linenumber) tiebreak; each half contributes exact
    * BIGINT quantity/price-cent sums and the elasticity is one fixed
    * IEEE tree at the end — the /2 midpoints cancel, so
    * e = ((q̄₂−q̄₁)(p̄₂+p̄₁)) / ((q̄₂+q̄₁)(p̄₂−p̄₁)). |e| > 1 reads
    * elastic. Brand-grain output; the rank window partitions by
    * brand, the documented exact-order-statistic path. */
  def partsArcElasticity(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey", "l_orderkey", "l_linenumber",
        "CAST(round(l_quantity) AS BIGINT) AS q",
        "CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS u_cents")
    val branded = li.join(
      broadcast(graft.io.Tables.part(spark, dir)
        .selectExpr("p_partkey AS l_partkey", "p_brand")), "l_partkey")
    branded
      .selectExpr("p_brand", "q", "u_cents",
        """row_number() OVER (PARTITION BY p_brand
             ORDER BY u_cents, l_orderkey, l_linenumber) AS rk""",
        "count(1) OVER (PARTITION BY p_brand) AS n")
      .selectExpr("p_brand", "q", "u_cents",
        "CASE WHEN rk <= n DIV 2 THEN 0 ELSE 1 END AS half")
      .groupBy("p_brand")
      .agg(
        sum(expr("CASE WHEN half = 0 THEN q ELSE 0 END")).as("q1"),
        sum(expr("CASE WHEN half = 0 THEN u_cents ELSE 0 END")).as("p1"),
        sum(expr("CASE WHEN half = 0 THEN 1 ELSE 0 END")).as("n1"),
        sum(expr("CASE WHEN half = 1 THEN q ELSE 0 END")).as("q2"),
        sum(expr("CASE WHEN half = 1 THEN u_cents ELSE 0 END")).as("p2"),
        sum(expr("CASE WHEN half = 1 THEN 1 ELSE 0 END")).as("n2"))
      .selectExpr("p_brand",
        "CAST(n1 AS BIGINT) AS n_low", "CAST(n2 AS BIGINT) AS n_high",
        "CAST(q1 AS DOUBLE) / n1 AS qm1", "CAST(p1 AS DOUBLE) / n1 AS pm1",
        "CAST(q2 AS DOUBLE) / n2 AS qm2", "CAST(p2 AS DOUBLE) / n2 AS pm2")
      .selectExpr("p_brand", "n_low", "n_high",
        """CASE WHEN pm2 > pm1 AND qm1 + qm2 > 0
           THEN ((qm2 - qm1) * (pm2 + pm1)) / ((qm2 + qm1) * (pm2 - pm1))
           ELSE CAST(NULL AS DOUBLE) END AS elasticity""")
      .selectExpr("p_brand", "n_low", "n_high", "elasticity",
        """CASE WHEN elasticity IS NULL THEN 'undefined'
                WHEN elasticity < -1 OR elasticity > 1 THEN 'elastic'
                ELSE 'inelastic' END AS demand_class""")
      .orderBy("p_brand")
  }

  val partsArcElasticityOracle: String =
    """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(round(l_quantity) AS BIGINT) AS q,
           CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT) AS u_cents
         FROM lineitem),
       branded AS (SELECT p.p_brand, li.q, li.u_cents, li.l_orderkey, li.l_linenumber
         FROM li JOIN part p ON li.l_partkey = p.p_partkey),
       ranked AS (SELECT p_brand, q, u_cents,
           row_number() OVER (PARTITION BY p_brand
             ORDER BY u_cents, l_orderkey, l_linenumber) AS rk,
           count(*) OVER (PARTITION BY p_brand) AS n
         FROM branded),
       halves AS (SELECT p_brand, q, u_cents,
           CASE WHEN rk <= n // 2 THEN 0 ELSE 1 END AS half
         FROM ranked),
       agg AS (SELECT p_brand,
           CAST(sum(CASE WHEN half = 0 THEN q ELSE 0 END) AS BIGINT) AS q1,
           CAST(sum(CASE WHEN half = 0 THEN u_cents ELSE 0 END) AS BIGINT) AS p1,
           CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN half = 1 THEN q ELSE 0 END) AS BIGINT) AS q2,
           CAST(sum(CASE WHEN half = 1 THEN u_cents ELSE 0 END) AS BIGINT) AS p2,
           CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2
         FROM halves GROUP BY p_brand),
       means AS (SELECT p_brand, n1 AS n_low, n2 AS n_high,
           CAST(q1 AS DOUBLE) / n1 AS qm1, CAST(p1 AS DOUBLE) / n1 AS pm1,
           CAST(q2 AS DOUBLE) / n2 AS qm2, CAST(p2 AS DOUBLE) / n2 AS pm2
         FROM agg),
       e AS (SELECT p_brand, n_low, n_high,
           CASE WHEN pm2 > pm1 AND qm1 + qm2 > 0
             THEN ((qm2 - qm1) * (pm2 + pm1)) / ((qm2 + qm1) * (pm2 - pm1))
             ELSE CAST(NULL AS DOUBLE) END AS elasticity
         FROM means)
       SELECT p_brand, n_low, n_high, elasticity,
         CASE WHEN elasticity IS NULL THEN 'undefined'
              WHEN elasticity < -1 OR elasticity > 1 THEN 'elastic'
              ELSE 'inelastic' END AS demand_class
       FROM e ORDER BY p_brand"""

  // ---- ABC-XYZ inventory classification ----

  /** `parts_abc_xyz`: the two-axis inventory matrix — value
    * concentration (ABC, cumulative revenue share 80/95) crossed with
    * demand VARIABILITY (XYZ, coefficient of variation of monthly
    * quantity at the 0.5/1.0 textbook cuts). A-X parts are forecast-
    * friendly cash cows; C-Z parts are the long tail stochastic noise.
    *
    * The XYZ boundaries never touch a float OR a square root:
    * CV ≤ c ⟺ CV² ≤ c² ⟺ M²·var ≤ c²·S², and with months-without-
    * sales counted as zero demand (the textbook convention — a part
    * selling one month a year IS erratic), M²·var = M·ΣQ² − S² over
    * exact BIGINT month sums, so the class predicates are
    * 4·(M·ΣQ² − S²) ≤ S² (X) and M·ΣQ² ≤ 2·S² (Y) — pure integer
    * cross-multiplication, like the ABC 80/95 cuts above. Output is
    * the 9-cell matrix with part counts and revenue, the planning
    * summary the per-part relation rolls into at any scale. */
  def partsAbcXyz(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents",
        "CAST(round(l_quantity) AS BIGINT) AS q",
        """CAST((extract(year FROM CAST(l_shipdate AS DATE)) - 1970) * 12
            + extract(month FROM CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS mth""")
    val abc = abcClasses(
      li.groupBy("l_partkey").agg(sum("cents").as("cents")))
    val xyz = xyzClasses(li.groupBy("l_partkey", "mth").agg(sum("q").as("mq")))
    abc.join(xyz, Seq("l_partkey"))
      .groupBy("abc_class", "xyz_class")
      .agg(count(lit(1)).as("n_parts"), sum("cents").as("cents"))
      .selectExpr("abc_class", "xyz_class",
        "CAST(n_parts AS BIGINT) AS n_parts",
        "CAST(cents AS BIGINT) / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("abc_class", "xyz_class")
  }

  /** XYZ classification over a (l_partkey, mth, mq) monthly-demand
    * relation; the month universe is the relation's own distinct-month
    * count, zero-months implicit. Seam for the spec — the fixture's
    * demand is so intermittent every part lands in Z, so the X/Y
    * predicates need crafted series to be exercised at all. */
  private[graft] def xyzClasses(mq: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val months = mq.agg(countDistinct("mth").as("m_total"))
    mq.groupBy("l_partkey")
      .agg(sum("mq").as("s"), sum(expr("mq * mq")).as("q2"))
      .crossJoin(broadcast(months))
      .selectExpr("l_partkey",
        """CASE WHEN 4 * (m_total * q2 - s * s) <= s * s THEN 'X'
                WHEN m_total * q2 <= 2 * s * s THEN 'Y'
                ELSE 'Z' END AS xyz_class""")
  }

  val partsAbcXyzOracle: String =
    """WITH li AS (SELECT l_partkey,
            CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
            CAST(round(l_quantity) AS BIGINT) AS q,
            CAST((extract(year FROM CAST(l_shipdate AS DATE)) - 1970) * 12
              + extract(month FROM CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS mth
          FROM lineitem),
        months AS (SELECT CAST(count(DISTINCT mth) AS BIGINT) AS m_total FROM li),
        per AS (SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS cents
          FROM li GROUP BY 1),
        r AS (SELECT *,
            CAST(sum(cents) OVER (ORDER BY cents DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_cents,
            CAST(sum(cents) OVER () AS BIGINT) AS total_cents
          FROM per),
        abc AS (SELECT l_partkey, cents,
            CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                 WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                 ELSE 'C' END AS abc_class
          FROM r),
        mq_t AS (SELECT l_partkey, mth, CAST(sum(q) AS BIGINT) AS mq
          FROM li GROUP BY 1, 2),
        xs AS (SELECT l_partkey, CAST(sum(mq) AS BIGINT) AS s,
            CAST(sum(mq * mq) AS BIGINT) AS q2
          FROM mq_t GROUP BY 1),
        xyz AS (SELECT l_partkey,
            CASE WHEN 4 * (m_total * q2 - s * s) <= s * s THEN 'X'
                 WHEN m_total * q2 <= 2 * s * s THEN 'Y'
                 ELSE 'Z' END AS xyz_class
          FROM xs CROSS JOIN months)
        SELECT a.abc_class, x.xyz_class,
          CAST(count(*) AS BIGINT) AS n_parts,
          CAST(sum(a.cents) AS BIGINT) / CAST(100 AS DOUBLE) AS revenue
        FROM abc a JOIN xyz x ON a.l_partkey = x.l_partkey
        GROUP BY 1, 2 ORDER BY 1, 2"""
}
