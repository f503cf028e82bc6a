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

  /** Shared RFM scoring subplan — ONE implementation of the
    * recency/frequency/monetary quintile triple, consumed by both
    * [[rfmSegments]] (segment-grain rollup, `rfm_segment_rollup`) and
    * [[customerRfm]] (customer-grain scores, `rfm_customer_scores`).
    * The two queries used to carry near-twin copies of this plan
    * under names one typo apart; now the scoring is built once (and
    * reused via PlanCache when prefix caching is on).
    *
    * Per customer: Recency (days since last order, anchored to the
    * dataset's max date so the query is reproducible), Frequency
    * (order count), Monetary (lifetime cents), each scored into
    * quintiles equivalent to `ntile(5)` with a custkey tie-break
    * (total order — without it the two engines would tile tied
    * customers differently and the hash compare would flap). Tile
    * polarity is "5 = best" on all three axes (recency DESC puts
    * stale customers in tile 1).
    *
    * Scale: orders collapse to customer grain in one map-side-combined
    * hash aggregate, and the three quintiles ride
    * [[graft.ops.Scale.withNtile]] — the two-phase exact rank whose
    * only global window runs over the BUCKET grain, so no WindowExec
    * ever sorts the customer dimension in one partition (the price the
    * old `ntile(5).over(Window.orderBy(...))` form paid at 1e9
    * customers). The low-cardinality axes (recency days, order count)
    * bucket by exact value + a custkey range so even a hot tie value
    * can't make a hot bucket; the near-unique monetary axis buckets
    * by value range. */
  private[graft] def rfmScores(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "rfm_scores", dir) {
      import graft.ops.Scale
      // Each withNtile references its input TWICE (bucket totals +
      // join-back), so the three chained scores re-executed the
      // previous level's windows 2x/4x and the orders rollup 8x in
      // one materialization (measured: a 316-Exchange physical plan).
      // persist() per level lets the CacheManager substitute ONE
      // InMemoryRelation for every repeated subtree, so each score
      // pass runs exactly once — while the ANALYZED plan (and with it
      // the rfm_column_lineage provenance walk, which a lineage CUT
      // would blind) is untouched. Customer-grain rows only.
      // Gated on PlanCache (ADVICE r13): with cachePrefixes off
      // (Verify, tests) an ungated persist would outlive this call and
      // quietly warm later rfm-family cold-path runs.
      def lvl(df: DataFrame): DataFrame =
        if (graft.PlanCache.enabled(spark)) df.persist() else df
      val base = t(spark, dir, "orders")
        .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS od",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c")
        .groupBy("o_custkey")
        .agg(max("od").as("last_order"), count(lit(1)).as("n_orders"),
          sum("price_c").as("monetary_c"))
        .transform(lvl)
      val anchored = base
        .join(broadcast(base.agg(max("last_order").as("anchor"))))
        .selectExpr("o_custkey AS custkey",
          "datediff(anchor, last_order) AS recency_days",
          "n_orders", "monetary_c")
        .transform(lvl)
      val r = Scale.withNtile(anchored, 5,
        Seq(expr("-recency_days"), expr("custkey DIV 65536")),
        Seq(desc("recency_days"), asc("custkey")), "r_score").transform(lvl)
      val f = Scale.withNtile(r, 5,
        Seq(col("n_orders"), expr("custkey DIV 65536")),
        Seq(asc("n_orders"), asc("custkey")), "f_score").transform(lvl)
      Scale.withNtile(f, 5,
        Seq(expr("monetary_c DIV 4194304")),
        Seq(asc("monetary_c"), asc("custkey")), "m_score")
    }

  /** `rfm_segment_rollup`: RFM segmentation rolled up to SEGMENT grain
    * — the CRM summary (customer counts, revenue, average frequency /
    * recency per named segment). Scoring comes from [[rfmScores]];
    * this query owns only the segment labels and the rollup. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    rfmScores(spark, dir)
      .withColumn("segment", expr(
        """CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions'
             WHEN r_score >= 4 AND f_score <= 2 THEN 'new_customers'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
             ELSE 'core'
           END"""))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        sum("monetary_c").as("mon_cents"),
        sum("n_orders").as("n_orders"),
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
       SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(frequency) AS BIGINT) AS n_orders,
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
         SELECT n.n_name AS nation,
           CAST(sum(l.rev_cents) AS BIGINT) AS rev_cents
         FROM l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name),
       ranked AS (
         SELECT nation, rev_cents,
           row_number() OVER (ORDER BY rev_cents, nation) AS lorenz_rank,
           CAST(sum(rev_cents) OVER (ORDER BY rev_cents, nation
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
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

  /** SCD Type 2 dimension build — the warehouse-dimension classic: from
    * an order event stream, reconstruct each customer's priority-state
    * HISTORY as validity intervals. Two window passes: (1) change
    * detection — `lag` over (custkey, date, orderkey) keeps only rows
    * where the tracked attribute actually changed (the compress step
    * that separates SCD2 from a raw event log); (2) interval assembly —
    * `lead` on the surviving rows closes each version with the next
    * one's start; the open tail (`valid_to` NULL, `is_current` 1) is
    * the live version. Same-day flips are real versions ordered by the
    * order key, so the build is deterministic under ties.
    *
    * Scale: both windows partition by customer — the shuffle is one
    * hash exchange on the dimension's natural key, never global. The
    * change-detect filter runs BEFORE interval assembly, so the second
    * window sees only the compressed stream. */
  def customerScd2(spark: SparkSession, dir: String): DataFrame =
    scd2Core(spark, dir)
      .selectExpr("custkey", "version_no", "priority",
        "CAST(valid_from AS STRING) AS valid_from",
        "CAST(valid_to AS STRING) AS valid_to",
        "CAST(valid_to IS NULL AS INT) AS is_current")
      .orderBy("custkey", "version_no")

  /** SCD2 build over an arbitrary event relation
    * (custkey, odate, o_orderkey, priority). The output keeps
    * `version_key` — the ORDER KEY of the event that OPENED each
    * version — because compression is re-runnable only with the full
    * tie order: re-feeding (valid_from, version_key, priority) through
    * this builder reproduces the same versions, which is what makes
    * [[scd2Merge]]'s rebuild-touched-customers strategy exact even
    * when a customer flips priority twice on one date. */
  private[graft] def scd2FromEvents(events: DataFrame): DataFrame =
    events
      // last EVENT per customer in full (odate, orderkey) tie order —
      // carried on every version row because compression is about to
      // drop non-change events, and the append-only guard in
      // [[scd2Merge]] must compare batches against the last EVENT, not
      // the last change point: a trailing same-priority event leaves
      // no version behind, yet a batch event interleaving before it
      // still diverges from a full rebuild (it can re-expose the
      // dropped event as a change). Same custkey-partitioned shuffle
      // as the windows below; no extra exchange.
      .withColumn("last_ev", expr(
        "max(struct(odate AS d, o_orderkey AS k)) OVER (PARTITION BY custkey)"))
      .withColumn("prev", expr(
        "lag(priority) OVER (PARTITION BY custkey ORDER BY odate, o_orderkey)"))
      .filter("prev IS NULL OR prev <> priority")
      .withColumn("version_no", expr(
        "row_number() OVER (PARTITION BY custkey ORDER BY odate, o_orderkey)"))
      .withColumn("valid_to", expr(
        "lead(odate) OVER (PARTITION BY custkey ORDER BY odate, o_orderkey)"))
      .selectExpr("custkey", "version_no", "priority",
        "odate AS valid_from", "valid_to", "o_orderkey AS version_key",
        "last_ev.d AS last_odate", "last_ev.k AS last_okey")

  /** The order stream as SCD2 input events. */
  private[graft] def orderEvents(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .selectExpr("o_custkey AS custkey",
        "CAST(o_orderdate AS DATE) AS odate", "o_orderkey",
        "o_orderpriority AS priority")

  /** The shared SCD2 builder: (custkey, version_no, priority,
    * valid_from DATE, valid_to DATE-or-NULL, version_key). */
  private def scd2Core(spark: SparkSession, dir: String): DataFrame =
    scd2FromEvents(orderEvents(spark, dir))

  /** Incremental SCD2 maintenance — the nightly production path: fold
    * a batch of NEW events into an existing dimension without
    * rewriting untouched customers. Touched customers (those with
    * events in the batch) are REBUILT from their compressed version
    * rows re-read as pseudo-events (valid_from + version_key carry the
    * full original tie order) plus the new events; everyone else
    * passes through verbatim via an anti-join. Rebuild-per-key is
    * exact because SCD2 compression is idempotent over its own output:
    * compress(compress(E₁) ∪ E₂) = compress(E₁ ∪ E₂) whenever E₂'s
    * events never interleave BEFORE a kept event they would have
    * displaced — i.e. per-customer history only appends, the CDC
    * contract. The `customer_scd2_merged` query pins the equivalence
    * against the full-rebuild DuckDB oracle; AnalyticsSpec folds three
    * time-ordered batches and lands bit-identically on the one-shot
    * build.
    *
    * Scale: the batch's customer set is batch-sized — it broadcasts to
    * both the anti-join (untouched fast path rewrites nothing) and the
    * pseudo-event extraction; the rebuild windows run only over
    * touched customers' compressed histories plus the delta.
    *
    * `validate` (default ON) enforces the contract instead of trusting
    * it: a batch event ordering BEFORE a touched customer's last
    * existing EVENT — `(odate, orderkey)` lexicographically, against
    * the `last_odate`/`last_okey` markers every dimension row carries
    * precisely for this check — means the history is NOT append-only
    * for that key, the idempotence identity above does not apply, and
    * the merged dimension would silently diverge from a full rebuild —
    * so the merge fails loudly with the violation count. The marker is
    * the last EVENT, not the last change point (`max(valid_from)`):
    * compression drops trailing same-priority events, and a batch
    * event slotted between the last change and such a dropped event
    * would pass a valid_from check yet re-expose the dropped event as
    * a change in a full rebuild. The check is one count job over
    * batch-sized relations (events ⋈ broadcast per-touched-customer
    * last-event marker), negligible next to the rebuild itself;
    * callers that pre-validate upstream can pass false.
    *
    * The rebuilt rows' own markers stay correct without a fix-up join:
    * validation guarantees every delta event orders at-or-after the
    * customer's previous last event, so max over pseudo ∪ delta IS the
    * new true last event. */
  def scd2Merge(existing: DataFrame, events: DataFrame,
      validate: Boolean = true): DataFrame = {
    val touched = events.select("custkey").distinct()
    if (validate) {
      val lastEv = existing.join(broadcast(touched), Seq("custkey"))
        .groupBy("custkey")
        .agg(max(struct(col("last_odate").as("d"), col("last_okey").as("k")))
          .as("last_ev"))
      val bad = events.join(broadcast(lastEv), Seq("custkey"))
        .filter(struct(col("odate").as("d"), col("o_orderkey").as("k"))
          < col("last_ev")).count()
      if (bad > 0) throw new IllegalStateException(
        s"scd2Merge: $bad batch event(s) order before a touched " +
          "customer's last existing event — append-only CDC contract " +
          "violated; the incremental merge would diverge from a full " +
          "rebuild. Replay the affected customers through a full " +
          "rebuild instead.")
    }
    val untouched = existing.join(broadcast(touched), Seq("custkey"), "left_anti")
    val pseudo = existing.join(broadcast(touched), Seq("custkey"))
      .selectExpr("custkey", "valid_from AS odate",
        "version_key AS o_orderkey", "priority")
    val rebuilt = scd2FromEvents(pseudo.unionByName(
      events.select("custkey", "odate", "o_orderkey", "priority")))
    untouched.unionByName(rebuilt)
  }

  /** The merge path surfaced as an oracle-checked query: build the
    * dimension from pre-2000 orders, fold the 2000+ delta through
    * [[scd2Merge]], and present the result exactly like
    * [[customerScd2]] — the ORACLE IS THE FULL REBUILD
    * ([[customerScd2Oracle]]), so any divergence between the
    * incremental and monolithic paths fails the hash compare. */
  def customerScd2Merged(spark: SparkSession, dir: String): DataFrame = {
    val all = orderEvents(spark, dir)
    val base = scd2FromEvents(all.filter("odate < DATE '2000-01-01'"))
    val delta = all.filter("odate >= DATE '2000-01-01'")
    scd2Merge(base, delta)
      .selectExpr("custkey", "version_no", "priority",
        "CAST(valid_from AS STRING) AS valid_from",
        "CAST(valid_to AS STRING) AS valid_to",
        "CAST(valid_to IS NULL AS INT) AS is_current")
      .orderBy("custkey", "version_no")
  }

  lazy val customerScd2MergedOracle: String = customerScd2Oracle

  private val scd2CoreSql: String =
    """chg AS (
         SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS odate,
           o_orderkey, o_orderpriority AS priority,
           lag(o_orderpriority) OVER (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev
         FROM orders),
       scd2 AS (
         SELECT custkey,
           row_number() OVER (PARTITION BY custkey
             ORDER BY odate, o_orderkey) AS version_no,
           priority, odate AS valid_from,
           lead(odate) OVER (PARTITION BY custkey
             ORDER BY odate, o_orderkey) AS valid_to
         FROM chg WHERE prev IS NULL OR prev <> priority)"""

  val customerScd2Oracle: String =
    s"""WITH $scd2CoreSql
       SELECT custkey, version_no, priority,
         CAST(valid_from AS VARCHAR) AS valid_from,
         CAST(valid_to AS VARCHAR) AS valid_to,
         CAST(valid_to IS NULL AS INT) AS is_current
       FROM scd2 ORDER BY custkey, version_no"""

  /** Point-in-time join against the SCD2 dimension: attribute each
    * line item's revenue to the priority-state its CUSTOMER was in on
    * the SHIP date — the "which version was true when the fact
    * happened" lookup that separates a type-2 dimension from a
    * latest-value snapshot. Version 1 is treated as valid from −∞ (the
    * standard initial-load convention: facts predating the first
    * observed change belong to the first known state — and the fixture
    * does ship line items before their customer's first order date, so
    * this is load-bearing, not defensive; AnalyticsSpec proved the
    * naive [first_order, ∞) tiling dropped rows). With it the
    * intervals partition (−∞, ∞) per customer, so every fact row
    * matches exactly one version.
    *
    * Scale: the version predicate rides on a custkey EQUI-join (the
    * interval test is a residual filter, never a cartesian); facts
    * collapse to the output grain in one hash agg. Versions-per-
    * customer is bounded by the change count, so the join fan-out is
    * the SCD2 compression ratio — the same reason warehouses can
    * afford PIT lookups at fact-table scale. */
  def lineitemPitPriority(spark: SparkSession, dir: String): DataFrame = {
    val facts = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS ship",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents")
      .join(t(spark, dir, "orders").selectExpr("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    val dim = scd2Core(spark, dir)
    facts.join(dim,
        col("o_custkey") === col("custkey") &&
          (col("version_no") === 1 || col("ship") >= col("valid_from")) &&
          (col("valid_to").isNull || col("ship") < col("valid_to")))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_items"), sum("rev_cents").as("rev_cents"))
      .selectExpr("priority", "n_items",
        "rev_cents / CAST(100 AS DOUBLE) AS revenue")
      .orderBy("priority")
  }

  val lineitemPitPriorityOracle: String =
    s"""WITH $scd2CoreSql,
       facts AS (
         SELECT o.o_custkey, CAST(l.l_shipdate AS DATE) AS ship,
           CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS rev_cents
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       SELECT d.priority, count(*) AS n_items,
         sum(f.rev_cents) / CAST(100 AS DOUBLE) AS revenue
       FROM facts f JOIN scd2 d ON f.o_custkey = d.custkey
         AND (d.version_no = 1 OR f.ship >= d.valid_from)
         AND (d.valid_to IS NULL OR f.ship < d.valid_to)
       GROUP BY d.priority ORDER BY d.priority"""

  /** Directed association rules over order baskets — the metrics layer
    * above [[graft.sql.Extras.brandCopurchase]]'s raw pair counts:
    * for each ordered brand pair (antecedent → consequent),
    * support = P(A,B), confidence = P(B|A), lift = P(A,B)/(P(A)·P(B)).
    * All three are single divisions over exact BIGINT counts, so the
    * doubles are engine-identical; rows rank by lift with a full
    * lexical tiebreak (equal-count pairs produce bit-equal lifts, so
    * the tie order must be total for a stable top-k).
    *
    * Scale: the basket self-join is bounded by basket size squared
    * (see brandCopurchase); the three statistics tables joined on are
    * brand-grain and a 1-row global — all broadcast. The scalar
    * basket count rides a broadcast nested-loop join of ONE row, the
    * degenerate cross join that is free at any scale. */
  def brandAssociationRules(spark: SparkSession, dir: String): DataFrame = {
    val ob = Extras.orderBrands(spark, dir)
    val nBaskets = Extras.orderBrandSets(spark, dir).agg(
      count(lit(1)).cast("long").as("n_baskets"))
    val brandN = ob.groupBy("p_brand")
      .agg(count(lit(1)).as("n_brand"))
    // directed pairs (a ≠ b) = the undirected a<b pair stream emitted
    // both ways — one array explode over the shared per-order sets
    // instead of the ob⋈ob self-join (identical multiset of pairs:
    // orderBrands is distinct per (order, brand))
    val undirected = Extras.orderBrandPairs(spark, dir)
    val pairs = undirected.selectExpr("a AS antecedent", "b AS consequent")
      .unionAll(undirected.selectExpr("b AS antecedent", "a AS consequent"))
      .groupBy("antecedent", "consequent")
      .agg(count(lit(1)).as("n_ab"))
      .filter("n_ab >= 3")
    pairs
      .join(broadcast(brandN.selectExpr("p_brand AS ba", "n_brand AS n_a")),
        col("antecedent") === col("ba"))
      .join(broadcast(brandN.selectExpr("p_brand AS bb", "n_brand AS n_b")),
        col("consequent") === col("bb"))
      .crossJoin(broadcast(nBaskets))
      // lift multiplies in DOUBLE, not BIGINT: n_ab·n_baskets is a
      // product of two row counts, which past ~3e9 rows each exceeds
      // 2^63 — Spark non-ANSI would wrap silently while DuckDB promotes
      // to HUGEINT, a cross-engine divergence. Counts below 2^53 are
      // exact as doubles, and one IEEE multiply/divide tree is
      // bit-identical in both engines.
      .selectExpr("antecedent", "consequent", "n_ab", "n_a", "n_b",
        "CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support",
        "CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence",
        "(CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS lift")
      .orderBy(desc("lift"), asc("antecedent"), asc("consequent"))
      .limit(50)
  }

  val brandAssociationRulesOracle: String =
    """WITH ob AS (SELECT DISTINCT l.l_orderkey, p.p_brand
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM ob),
       bn AS (SELECT p_brand, count(*) AS n_brand FROM ob GROUP BY p_brand),
       pairs AS (
         SELECT a.p_brand AS antecedent, b.p_brand AS consequent,
           count(*) AS n_ab
         FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
           AND a.p_brand <> b.p_brand
         GROUP BY 1, 2 HAVING count(*) >= 3)
       SELECT antecedent, consequent, n_ab,
         x.n_brand AS n_a, y.n_brand AS n_b,
         CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
         CAST(n_ab AS DOUBLE) / CAST(x.n_brand AS DOUBLE) AS confidence,
         (CAST(n_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE))
           / (CAST(x.n_brand AS DOUBLE) * CAST(y.n_brand AS DOUBLE)) AS lift
       FROM pairs
       JOIN bn x ON pairs.antecedent = x.p_brand
       JOIN bn y ON pairs.consequent = y.p_brand
       CROSS JOIN nb
       ORDER BY lift DESC, antecedent, consequent LIMIT 50"""

  /** Chi-square independence test: is event type independent of the
    * day of week? The full contingency grid (observed AND structural-
    * zero cells, so the test is total), expected counts, per-cell
    * contributions via the cross-multiplied identity
    * (O·N − rt·ct)² / (N·rt·ct) ≡ (O−E)²/E — every operand an
    * exact-integer-valued double, every step one IEEE op in a fixed
    * tree, so both engines land on identical bits. The statistic
    * itself must SUM those per-cell doubles, and float sums are
    * order-dependent — so each contribution is quantized to micro
    * units first and the total runs on BIGINTs (the corpus-wide
    * discipline applied to a test statistic). Day-of-week comes from
    * epoch-day mod 7 (Monday 0), the only dialect-neutral weekday.
    *
    * Scale: one map-side-combined count to the 42-cell grain; every
    * window after that runs on the grid, not the events. */
  def eventsChiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.io.Tables.events(spark, dir)
      .selectExpr("event_type",
        "datediff(CAST(ts AS DATE), DATE '1970-01-05') % 7 AS dow")
      .groupBy("event_type", "dow")
      .agg(count(lit(1)).as("observed"))
    val grid = cells.select("event_type").distinct()
      .crossJoin(broadcast(cells.select("dow").distinct()))
      .join(cells, Seq("event_type", "dow"), "left")
      .selectExpr("event_type", "dow",
        "coalesce(observed, CAST(0 AS BIGINT)) AS observed")
    val dof = cells.agg(
      countDistinct(col("event_type")).as("n_types"),
      countDistinct(col("dow")).as("n_dows"))
    grid.crossJoin(broadcast(dof))
      .withColumn("row_total", expr(
        "sum(observed) OVER (PARTITION BY event_type)"))
      .withColumn("col_total", expr("sum(observed) OVER (PARTITION BY dow)"))
      .withColumn("n_total", expr("sum(observed) OVER ()"))
      .withColumn("expected", expr(
        "CAST(row_total * col_total AS DOUBLE) / CAST(n_total AS DOUBLE)"))
      .withColumn("contrib", expr(
        """((CAST(observed AS DOUBLE) * CAST(n_total AS DOUBLE)
             - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))
            * (CAST(observed AS DOUBLE) * CAST(n_total AS DOUBLE)
             - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)))
           / (CAST(n_total AS DOUBLE) * CAST(row_total AS DOUBLE)
             * CAST(col_total AS DOUBLE))"""))
      .withColumn("chi2", expr(
        """sum(CAST(round(contrib * 1000000) AS BIGINT)) OVER ()
           / CAST(1000000 AS DOUBLE)"""))
      .selectExpr("event_type", "dow", "observed", "expected", "contrib",
        "chi2", "(n_types - 1) * (n_dows - 1) AS dof")
      .orderBy("event_type", "dow")
  }

  val eventsChiSquareOracle: String =
    """WITH cells AS (
         SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-05' AS BIGINT) % 7 AS dow,
           count(*) AS observed
         FROM events GROUP BY 1, 2),
       grid AS (
         SELECT t.event_type, d.dow,
           coalesce(c.observed, 0) AS observed
         FROM (SELECT DISTINCT event_type FROM cells) t
         CROSS JOIN (SELECT DISTINCT dow FROM cells) d
         LEFT JOIN cells c ON c.event_type = t.event_type AND c.dow = d.dow),
       dof AS (SELECT count(DISTINCT event_type) AS n_types,
           count(DISTINCT dow) AS n_dows FROM cells),
       tot AS (
         SELECT event_type, dow, observed,
           sum(observed) OVER (PARTITION BY event_type) AS row_total,
           sum(observed) OVER (PARTITION BY dow) AS col_total,
           sum(observed) OVER () AS n_total
         FROM grid),
       terms AS (
         SELECT *,
           CAST(row_total * col_total AS DOUBLE)
             / CAST(n_total AS DOUBLE) AS expected,
           ((CAST(observed AS DOUBLE) * CAST(n_total AS DOUBLE)
              - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))
             * (CAST(observed AS DOUBLE) * CAST(n_total AS DOUBLE)
              - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)))
            / (CAST(n_total AS DOUBLE) * CAST(row_total AS DOUBLE)
              * CAST(col_total AS DOUBLE)) AS contrib
         FROM tot)
       SELECT event_type, dow, observed, expected, contrib,
         sum(CAST(round(contrib * 1000000) AS BIGINT)) OVER ()
           / CAST(1000000 AS DOUBLE) AS chi2,
         (n_types - 1) * (n_dows - 1) AS dof
       FROM terms CROSS JOIN dof
       ORDER BY event_type, dow"""

  /** The daily/monthly revenue series both trend operators regress
    * over, in WHOLE DOLLARS (`cents DIV 100` — truncating integer
    * division, identical in both engines on non-negative cents) so
    * second moments stay inside BIGINT at any plausible scale: daily
    * dollar sums square to ~1e11·n_days, five orders of magnitude
    * under overflow, where daily CENTS squared would overflow BIGINT
    * near sf1. */
  private def revenueSeries(spark: SparkSession, dir: String,
      grain: String): DataFrame =
    graft.io.Tables.lineitem(spark, dir)
      .selectExpr(s"$grain AS x",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents")
      .groupBy("x")
      .agg(expr("sum(cents) DIV 100").as("y"))

  private val dayGrain =
    "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)"
  private val dayGrainDuck =
    "CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
  private val monthGrain =
    """CAST((extract(year FROM CAST(l_shipdate AS DATE)) - 1970) * 12
        + extract(month FROM CAST(l_shipdate AS DATE)) - 1 AS BIGINT)"""

  /** The OLS assembly over exact integer moments, shared verbatim by
    * the Spark projection and the DuckDB oracle — the [[graft.ops.Profile.momentCorr]]
    * pattern extended to the full regression readout: slope, intercept,
    * R², and a 30-step-ahead forecast, each a fixed arithmetic tree
    * over DOUBLE casts of order-independent BIGINT sums. */
  private val olsExprs: Seq[String] = {
    val (n, sx, sy, sxx, syy, sxy) =
      ("CAST(n AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)",
        "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)", "CAST(sxy AS DOUBLE)")
    val cov = s"($n * $sxy - $sx * $sy)"
    val varX = s"($n * $sxx - $sx * $sx)"
    val varY = s"($n * $syy - $sy * $sy)"
    val slope = s"$cov / $varX"
    val intercept = s"($sy - $cov / $varX * $sx) / $n"
    Seq("n AS n_days",
      s"$slope AS slope_per_day",
      s"$intercept AS intercept",
      s"$cov * $cov / ($varX * $varY) AS r2",
      s"$intercept + $slope * CAST(x_max + 30 AS DOUBLE) AS forecast_30d")
  }

  private val olsMoments: Seq[String] = Seq(
    "CAST(count(*) AS BIGINT) AS n", "CAST(sum(x) AS BIGINT) AS sx",
    "CAST(sum(y) AS BIGINT) AS sy", "CAST(sum(x * x) AS BIGINT) AS sxx",
    "CAST(sum(y * y) AS BIGINT) AS syy", "CAST(sum(x * y) AS BIGINT) AS sxy",
    "CAST(max(x) AS BIGINT) AS x_max")

  /** Ordinary least squares over the daily revenue series — trend
    * slope, intercept, R², and a 30-day-ahead point forecast, all from
    * ONE pass of exact integer moments (the decomposable-statistics
    * pattern: BIGINT sums are order-independent, so 1000 executors
    * reach bit-identical moments, and the regression readout is a
    * fixed IEEE tree both engines share verbatim). Contrast with
    * `regr_slope`/`corr`: their float accumulation order depends on
    * partitioning. At extreme scale, center x at the series midpoint
    * first — epoch-day x keeps Σxy at ~2e15 here, but centering drops
    * four orders of magnitude of headroom for free. */
  def dailyRevenueTrend(spark: SparkSession, dir: String): DataFrame =
    revenueSeries(spark, dir, dayGrain)
      .selectExpr(olsMoments: _*)
      .selectExpr(olsExprs: _*)

  val dailyRevenueTrendOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       m AS (SELECT ${olsMoments.mkString(", ")} FROM series)
       SELECT ${olsExprs.mkString(", ")} FROM m"""

  /** Theil–Sen robust trend over the monthly revenue series: the
    * median of all pairwise slopes, with the intercept as the median
    * of per-point residual offsets at that slope — the estimator that
    * shrugs off the outlier months OLS chases. Medians are the DISCRETE
    * lower median, selected by row_number over a totally ordered window
    * (slope, then both endpoints), so both engines pick the same
    * element — no percentile function, no interpolation, no float sum.
    *
    * Scale: the O(k²) pair join runs on the TIME grain (k months —
    * bounded by calendar span, not data volume; the fact table died in
    * the first hash agg), which is why Theil–Sen, quadratic in
    * general, is free here at any corpus size. */
  def monthlyRevenueTheilSen(spark: SparkSession, dir: String): DataFrame = {
    // the month-grain series is consumed three times (both self-join
    // sides + the residual pass); checkpointing the ~k-row result stops
    // each consumer re-running the fact-table aggregation
    val series = revenueSeries(spark, dir, monthGrain).transform(graft.ops.Checkpoints.cut)
    val a = series.selectExpr("x AS x1", "y AS y1")
    val b = series.selectExpr("x AS x2", "y AS y2")
    val slopes = a.join(b, col("x1") < col("x2"))
      .selectExpr("x1", "x2",
        "CAST(y2 - y1 AS DOUBLE) / CAST(x2 - x1 AS DOUBLE) AS slope")
    val medSlope = slopes
      .withColumn("rn", expr("row_number() OVER (ORDER BY slope, x1, x2)"))
      .withColumn("n_pairs", expr("count(*) OVER ()"))
      .filter("rn = (n_pairs + 1) DIV 2")
      .selectExpr("slope AS ts_slope", "n_pairs")
    val resid = series.crossJoin(broadcast(medSlope))
      .selectExpr("x", "ts_slope", "n_pairs",
        "CAST(y AS DOUBLE) - ts_slope * CAST(x AS DOUBLE) AS off")
    resid
      .withColumn("rn", expr("row_number() OVER (ORDER BY off, x)"))
      .withColumn("n_months", expr("count(*) OVER ()"))
      .filter("rn = (n_months + 1) DIV 2")
      .selectExpr("n_months", "n_pairs", "ts_slope",
        "off AS ts_intercept")
  }

  val monthlyRevenueTheilSenOracle: String =
    s"""WITH series AS (
         SELECT $monthGrain AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       slopes AS (
         SELECT a.x AS x1, b.x AS x2,
           CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
         FROM series a JOIN series b ON a.x < b.x),
       med AS (
         SELECT slope AS ts_slope, n_pairs FROM (
           SELECT slope,
             row_number() OVER (ORDER BY slope, x1, x2) AS rn,
             count(*) OVER () AS n_pairs
           FROM slopes) s
         WHERE rn = (n_pairs + 1) // 2),
       resid AS (
         SELECT x, ts_slope, n_pairs,
           CAST(y AS DOUBLE) - ts_slope * CAST(x AS DOUBLE) AS off
         FROM series CROSS JOIN med)
       SELECT n_months, n_pairs, ts_slope, off AS ts_intercept FROM (
         SELECT n_pairs, ts_slope, off,
           row_number() OVER (ORDER BY off, x) AS rn,
           count(*) OVER () AS n_months
         FROM resid) r
       WHERE rn = (n_months + 1) // 2"""

  /** Language-mix diversity per document source — the corpus-balance
    * audit a multilingual training pipeline runs before fixing mix
    * weights: per source, Gini impurity and inverse-Simpson "effective
    * language count" (both EXACT — pure rationals over BIGINT counts),
    * plus Shannon entropy and KL(source ‖ corpus) drift in nats. The
    * log-based terms cannot be summed as raw doubles (float sums are
    * order-dependent), so each per-language term is computed in a
    * fixed IEEE tree both engines share, quantized to nano-units, and
    * summed in BIGINT — the corpus quantization discipline applied to
    * information measures. KL is total because every source language
    * exists in the corpus distribution by construction (q > 0).
    *
    * Scale: one map-side-combined count to (source, lang) grain; the
    * global distribution is language-grain and broadcasts. */
  def docsSourceDiversity(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "documents")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n"))
    val glob = cells.groupBy("lang").agg(sum("n").as("n_g"))
      .withColumn("tot_g", expr("sum(n_g) OVER ()"))
    val withTot = cells
      .withColumn("n_s", expr("sum(n) OVER (PARTITION BY source)"))
      .join(broadcast(glob), Seq("lang"))
    withTot.groupBy("source")
      .agg(
        expr("max(n_s)").as("n_docs"),
        count(lit(1)).as("n_langs"),
        expr("sum(n * n)").as("sum_sq"),
        expr("""sum(CAST(round((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
            * ln(CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE)) * -1000000000)
            AS BIGINT))""").as("ent_nano"),
        expr("""sum(CAST(round((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
            * ln((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
              / (CAST(n_g AS DOUBLE) / CAST(tot_g AS DOUBLE))) * 1000000000)
            AS BIGINT))""").as("kl_nano"))
      .selectExpr("source", "n_docs", "n_langs",
        "CAST(n_docs * n_docs - sum_sq AS DOUBLE) / CAST(n_docs * n_docs AS DOUBLE) AS gini_impurity",
        "CAST(n_docs * n_docs AS DOUBLE) / CAST(sum_sq AS DOUBLE) AS effective_langs",
        "ent_nano / CAST(1000000000 AS DOUBLE) AS entropy_nats",
        "kl_nano / CAST(1000000000 AS DOUBLE) AS kl_vs_corpus")
      .orderBy("source")
  }

  val docsSourceDiversityOracle: String =
    """WITH cells AS (
         SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2),
       gdist AS (
         SELECT lang, CAST(sum(n) AS BIGINT) AS n_g,
           CAST(sum(sum(n)) OVER () AS BIGINT) AS tot_g
         FROM cells GROUP BY lang),
       wt AS (
         SELECT c.source, c.lang, c.n,
           CAST(sum(c.n) OVER (PARTITION BY c.source) AS BIGINT) AS n_s,
           g.n_g, g.tot_g
         FROM cells c JOIN gdist g ON c.lang = g.lang)
       SELECT source, CAST(max(n_s) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_langs,
         CAST(max(n_s) * max(n_s) - sum(n * n) AS DOUBLE)
           / CAST(max(n_s) * max(n_s) AS DOUBLE) AS gini_impurity,
         CAST(max(n_s) * max(n_s) AS DOUBLE)
           / CAST(sum(n * n) AS DOUBLE) AS effective_langs,
         CAST(sum(CAST(round((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
             * ln(CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE)) * -1000000000)
             AS BIGINT)) AS BIGINT) / CAST(1000000000 AS DOUBLE) AS entropy_nats,
         CAST(sum(CAST(round((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
             * ln((CAST(n AS DOUBLE) / CAST(n_s AS DOUBLE))
               / (CAST(n_g AS DOUBLE) / CAST(tot_g AS DOUBLE))) * 1000000000)
             AS BIGINT)) AS BIGINT) / CAST(1000000000 AS DOUBLE) AS kl_vs_corpus
       FROM wt GROUP BY source ORDER BY source"""

  /** Kaplan–Meier estimator over customer repurchase behavior: the
    * durations are day-gaps between a customer's consecutive orders
    * (event observed) plus the open gap from the last order to the
    * dataset anchor (right-censored — the customer simply hasn't
    * reordered YET, and discarding those tails is the classic survival
    * bias). One row per event time: risk set, events, censorings,
    * hazard d/n, and the survival curve. The product Π(1 − d/n) is
    * order-sensitive in floats, so it runs as a cumulative ORDERED sum
    * of nano-quantized ln((n−d)/n) terms in BIGINT — deterministic
    * under any partitioning — and only the final readout exponentiates,
    * quantized to micro units because exp() itself differs by an ulp
    * across libm implementations (measured: 1.1e-16 Spark vs DuckDB).
    * A total-death tail (n == d, log −∞) short-circuits to survival 0
    * before the log.
    *
    * Scale: durations collapse to the day-gap grain immediately; the
    * ordered scan runs on event times (calendar-bounded), not orders. */
  def customerSurvivalKm(spark: SparkSession, dir: String): DataFrame = {
    val durations = t(spark, dir, "orders")
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS odate", "o_orderkey")
      .withColumn("next_d", expr(
        "lead(odate) OVER (PARTITION BY o_custkey ORDER BY odate, o_orderkey)"))
      .withColumn("anchor", expr("max(odate) OVER ()"))
      .selectExpr(
        "CAST(datediff(coalesce(next_d, anchor), odate) AS BIGINT) AS dur",
        "CAST(next_d IS NOT NULL AS INT) AS event")
    val grouped = durations.groupBy("dur")
      .agg(sum("event").as("d"), count(lit(1)).as("m"))
      .withColumn("n_total", expr("sum(m) OVER ()"))
      .withColumn("n_at_risk", expr(
        """n_total - coalesce(sum(m) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"""))
    grouped
      .withColumn("term_nano", expr(
        """CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                WHEN n_at_risk > d THEN CAST(round(ln(
                  CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
                  * 1000000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END"""))
      .withColumn("dead", expr(
        """max(CASE WHEN d > 0 AND n_at_risk = d THEN 1 ELSE 0 END)
           OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))
      .withColumn("log_s_nano", expr(
        """sum(term_nano) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))
      .filter("d > 0")
      .selectExpr("dur AS duration_days", "n_at_risk", "d AS n_events",
        "m - d AS n_censored",
        "CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard",
        "CASE WHEN dead = 1 THEN CAST('-Infinity' AS DOUBLE) " +
          "ELSE log_s_nano / CAST(1000000000 AS DOUBLE) END AS log_survival",
        "CASE WHEN dead = 1 THEN 0.0 " +
          "ELSE round(exp(log_s_nano / CAST(1000000000 AS DOUBLE)) * 1000000) " +
          "/ CAST(1000000 AS DOUBLE) END AS survival")
      .orderBy("duration_days")
  }

  val customerSurvivalKmOracle: String =
    """WITH durations AS (
         SELECT CAST(coalesce(next_d, anchor) - odate AS BIGINT) AS dur,
           CASE WHEN next_d IS NOT NULL THEN 1 ELSE 0 END AS event
         FROM (
           SELECT CAST(o_orderdate AS DATE) AS odate,
             lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS next_d,
             max(CAST(o_orderdate AS DATE)) OVER () AS anchor
           FROM orders) g),
       grouped AS (
         SELECT dur, CAST(sum(event) AS BIGINT) AS d,
           CAST(count(*) AS BIGINT) AS m
         FROM durations GROUP BY dur),
       risk AS (
         SELECT dur, d, m,
           CAST(sum(m) OVER () AS BIGINT)
             - CAST(coalesce(sum(m) OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_at_risk
         FROM grouped),
       terms AS (
         SELECT *,
           CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                WHEN n_at_risk > d THEN CAST(round(ln(
                  CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE))
                  * 1000000000) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS term_nano
         FROM risk),
       curve AS (
         SELECT *,
           max(CASE WHEN d > 0 AND n_at_risk = d THEN 1 ELSE 0 END)
             OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS dead,
           CAST(sum(term_nano) OVER (ORDER BY dur
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS log_s_nano
         FROM terms)
       SELECT dur AS duration_days, n_at_risk, d AS n_events,
         m - d AS n_censored,
         CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard,
         CASE WHEN dead = 1 THEN CAST('-Infinity' AS DOUBLE)
           ELSE log_s_nano / CAST(1000000000 AS DOUBLE) END AS log_survival,
         CASE WHEN dead = 1 THEN 0.0
           ELSE round(exp(log_s_nano / CAST(1000000000 AS DOUBLE)) * 1000000)
             / CAST(1000000 AS DOUBLE) END AS survival
       FROM curve WHERE d > 0 ORDER BY duration_days"""

  /** Robust outlier detection over the daily revenue series with
    * median/MAD — the estimator pair whose 50% breakdown point
    * survives the very outliers a mean/stddev z-score gets dragged
    * toward. Both medians are DISCRETE (row_number selection), and
    * because the lower median of integers is itself an integer, the
    * deviations |y − med| and the MAD stay in BIGINT — the outlier
    * decision `|y − med|·10⁴ > 3·14826·mad` is an exact integer
    * cross-multiplication (1.4826 is the Gaussian-consistency scale as
    * the rational 14826/10⁴); no float ever decides a boundary row.
    * The robust z readout is the only double. Degenerate series
    * (mad = 0) report no outliers by construction.
    *
    * Scale: medians run on the day grain; the two scalar medians ride
    * single-row broadcast joins. */
  def dailyRevenueOutliers(spark: SparkSession, dir: String): DataFrame = {
    // consumed by the median pass, the deviation pass, and the MAD
    // pass — checkpoint the day-grain rows once
    val series = revenueSeries(spark, dir, dayGrain).transform(graft.ops.Checkpoints.cut)
    val med = series
      .withColumn("rn", expr("row_number() OVER (ORDER BY y, x)"))
      .withColumn("cnt", expr("count(*) OVER ()"))
      .filter("rn = (cnt + 1) DIV 2").selectExpr("y AS med")
    val dev = series.crossJoin(broadcast(med))
      .selectExpr("x", "y", "med", "abs(y - med) AS adev")
    val mad = dev
      .withColumn("rn", expr("row_number() OVER (ORDER BY adev, x)"))
      .withColumn("cnt", expr("count(*) OVER ()"))
      .filter("rn = (cnt + 1) DIV 2").selectExpr("adev AS mad")
    dev.crossJoin(broadcast(mad))
      .filter("mad > 0 AND adev * 10000 > 3 * 14826 * mad")
      .selectExpr("x AS day_number", "y AS revenue_dollars", "med", "mad",
        """CAST(y - med AS DOUBLE) * 10000.0
           / (14826.0 * CAST(mad AS DOUBLE)) AS robust_z""")
      .orderBy("x")
  }

  val dailyRevenueOutliersOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT)) // 100 AS BIGINT) AS y
         FROM lineitem GROUP BY 1),
       med AS (
         SELECT y AS med FROM (
           SELECT y, row_number() OVER (ORDER BY y, x) AS rn,
             count(*) OVER () AS cnt FROM series) s
         WHERE rn = (cnt + 1) // 2),
       dev AS (
         SELECT x, y, med, abs(y - med) AS adev
         FROM series CROSS JOIN med),
       mad AS (
         SELECT adev AS mad FROM (
           SELECT adev, x, row_number() OVER (ORDER BY adev, x) AS rn,
             count(*) OVER () AS cnt FROM dev) s
         WHERE rn = (cnt + 1) // 2)
       SELECT x AS day_number, y AS revenue_dollars, med, mad,
         CAST(y - med AS DOUBLE) * 10000.0
           / (14826.0 * CAST(mad AS DOUBLE)) AS robust_z
       FROM dev CROSS JOIN mad
       WHERE mad > 0 AND adev * 10000 > 3 * 14826 * mad
       ORDER BY x"""

  /** CUSUM drift detection over each event type's daily volume — the
    * classic sequential change-point statistic
    * S_t = max(0, S_{t−1} + (x_t − μ − k)) looks inherently
    * one-at-a-time, but it has a closed form that windows compute in
    * parallel: with P_t the ORDERED prefix sum of the penalized
    * residuals, S_t = P_t − min_{i≤t} P_i. Two window passes
    * (running sum, running min), no recursion, no driver loop — the
    * "sequential algorithm → prefix-scan identity" move that makes
    * streaming-style monitors feasible as batch queries at any scale
    * (each event type is an independent window partition).
    *
    * Exactness: residuals are scaled through by the day count D
    * (D·x_t − T is integral and sums to zero over the period), the
    * drift penalty k = μ/2 becomes the integer T DIV 2, and the alarm
    * threshold h = 2μ·D becomes 2·T — every comparison an exact
    * BIGINT. The readout divides once for the unscaled statistic.
    *
    * Windows ARE ordered state here, so this query (like the other
    * window analytics) relies on the per-partition total order
    * (event_type, day) — deterministic in both engines. */
  def eventsCusumDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.io.Tables.events(spark, dir)
      .selectExpr("event_type",
        "CAST(date_trunc('day', ts) AS DATE) AS day")
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
    daily
      .withColumn("t_total", expr(
        "sum(c) OVER (PARTITION BY event_type)"))
      .withColumn("n_days", expr(
        "count(*) OVER (PARTITION BY event_type)"))
      .withColumn("p", expr(
        """sum(n_days * c - t_total - (t_total DIV 2))
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))
      // the running min must include the EMPTY prefix (P_0 = 0), or a
      // series that only ever rises would subtract its first partial
      // sum instead of zero
      .withColumn("s", expr(
        """p - least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""))
      .groupBy("event_type")
      .agg(max("n_days").as("n_days"), max("t_total").as("total"),
        max("s").as("max_cusum_scaled"),
        expr("sum(CASE WHEN s > 2 * t_total THEN 1 ELSE 0 END)")
          .as("n_alarm_days"),
        expr("min(CASE WHEN s > 2 * t_total THEN day END)")
          .as("first_alarm_day"))
      .selectExpr("event_type", "n_days", "total", "max_cusum_scaled",
        "CAST(max_cusum_scaled AS DOUBLE) / CAST(n_days AS DOUBLE) AS max_cusum",
        "n_alarm_days", "CAST(first_alarm_day AS STRING) AS first_alarm_day")
      .orderBy("event_type")
  }

  val eventsCusumDriftOracle: String =
    """WITH daily AS (
         SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           count(*) AS c
         FROM events GROUP BY event_type, day),
       w AS (
         SELECT event_type, day, c,
           sum(c) OVER (PARTITION BY event_type) AS t_total,
           count(*) OVER (PARTITION BY event_type) AS n_days
         FROM daily),
       p_t AS (
         SELECT *, sum(n_days * c - t_total - (t_total // 2))
             OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         FROM w),
       s_t AS (
         SELECT *, p - least(CAST(0 AS BIGINT), min(p) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
         FROM p_t)
       SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
         CAST(max(t_total) AS BIGINT) AS total,
         CAST(max(s) AS BIGINT) AS max_cusum_scaled,
         CAST(max(s) AS DOUBLE) / CAST(max(n_days) AS DOUBLE) AS max_cusum,
         CAST(sum(CASE WHEN s > 2 * t_total THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
         CAST(min(CASE WHEN s > 2 * t_total THEN day END) AS VARCHAR) AS first_alarm_day
       FROM s_t GROUP BY event_type ORDER BY event_type"""

  // ---- Mann-Whitney U rank-sum test ----

  /** Mann–Whitney U test of `value` between purchase and error events —
    * the nonparametric two-sample location test (the A/B readout when
    * revenue-per-event is heavy-tailed and a t-test's mean is the wrong
    * summary). Completes the test battery next to the chi-square
    * independence grid.
    *
    * Exactness discipline: values quantize to exact integer cents, and
    * ALL rank arithmetic runs on 2× ranks so midranks of even tie
    * groups stay integral — R₁, U₁, U₂ and the tie term Σ(t³−t) are
    * exact BIGINTs that both engines must match bit-for-bit; only the
    * final z readout is a double, computed in one shared IEEE tree.
    *
    * Scale shape: occurrences collapse to the DISTINCT-VALUE grain
    * first (one map-side-combined agg), so the rank prefix-scan runs
    * over the value domain, not the event count — cents of a bounded
    * price range, thousands of rows at any corpus size. The global
    * window is therefore domain-sized (same argument as the CUSUM
    * day-grain scan); n₁·n₂ products go through DOUBLE for the z term
    * (the association-rule overflow dodge). */
  def eventsMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.io.Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .selectExpr("CAST(round(value * 100) AS BIGINT) AS v",
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1")
    val byV = ev.groupBy("v").agg(
      sum("g1").as("cnt1"), count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byV.withColumn("cnt_less",
      coalesce(sum("cnt").over(wPrev), lit(0L)))
    val agg = ranked.agg(
      sum("cnt1").as("n1"),
      sum(expr("cnt - cnt1")).as("n2"),
      sum(expr("cnt1 * (2 * cnt_less + cnt + 1)")).as("r1_doubled"),
      sum(expr("cnt * cnt * cnt - cnt")).as("tie_t"))
    agg.selectExpr("n1", "n2", "r1_doubled", "tie_t",
        "r1_doubled - n1 * (n1 + 1) AS u1_doubled")
      .selectExpr("n1", "n2", "r1_doubled", "tie_t", "u1_doubled",
        "2 * n1 * n2 - u1_doubled AS u2_doubled",
        // z = (U1 − n1·n2/2) / sqrt(n1·n2/12 · (n+1 − T/(n·(n−1))))
        """(CAST(u1_doubled AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) /
           sqrt(CAST(n1 AS DOUBLE) * n2 / 12 *
             (CAST(n1 + n2 + 1 AS DOUBLE)
              - CAST(tie_t AS DOUBLE) /
                (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1)))) AS z""")
  }

  // ---- changepoint detection (binary segmentation) ----

  /** Shared gain expression: SSE reduction from splitting a segment
    * with totals (t1, t2, nn) at a prefix point (s1, s2, i) —
    * SSE(a..b) = Σx² − (Σx)²/len via prefix sums, every term exact
    * (BIGINT / DECIMAL(38)) until the one double readout tree, which
    * is identical text on both engines. */
  private def segGain(s1: String, s2: String, i: String,
      t1: String, t2: String, nn: String): String =
    (s"((CAST($t2 AS DOUBLE) - CAST($t1 AS DOUBLE) * $t1 / $nn) " +
      s"- (CAST($s2 AS DOUBLE) - CAST($s1 AS DOUBLE) * $s1 / $i) " +
      s"- (CAST(($t2) - ($s2) AS DOUBLE) " +
      s"- CAST(($t1) - ($s1) AS DOUBLE) * (($t1) - ($s1)) / (($nn) - ($i))))")

  /** `daily_revenue_changepoints`: two-level binary segmentation of
    * the daily revenue series (the greedy first rounds of PELT-family
    * changepoint detection): the split maximizing the SSE reduction
    * over the whole series, then the best split inside each resulting
    * half — the structural-break readout that says WHEN the revenue
    * process changed, complementing CUSUM (drift alarm) and the trend
    * decomposition (fixed seasonal model). Costs come from prefix
    * sums over the day grain (a bounded calendar scan, the CUSUM
    * argument); squared sums ride DECIMAL(38) so no count or price
    * scale overflows; each argmax is a struct-min aggregate over
    * day-grain candidates, and the child-segment passes reuse the ONE
    * prefix relation with offset arithmetic — the series is scanned
    * once regardless of depth. */
  def dailyRevenueChangepoints(spark: SparkSession, dir: String): DataFrame = {
    val pre = revenueSeries(spark, dir, dayGrain)
      .withColumn("i", expr("row_number() OVER (ORDER BY x)"))
      .withColumn("s1", expr(
        "sum(y) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .withColumn("s2", expr(
        "CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) " +
          "OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0))"))
      .withColumn("n", expr("count(*) OVER ()"))
      .withColumn("t1", expr("sum(y) OVER ()"))
      .withColumn("t2", expr(
        "CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER () AS DECIMAL(38,0))"))
      .transform(graft.ops.Checkpoints.cut)
    val root = pre.filter(col("i") < col("n"))
      .selectExpr("x", "i", "s1", "s2",
        s"${segGain("s1", "s2", "i", "t1", "t2", "n")} AS gain")
      .agg(min(struct(expr("-gain").as("ng"), col("x").as("x"),
        col("i").as("i"), col("s1").as("s1"), col("s2").as("s2"))).as("m"))
      .selectExpr("m.x AS root_x", "m.i AS ri", "m.s1 AS rs1",
        "m.s2 AS rs2", "-m.ng AS root_gain")
    val wroot = broadcast(root.transform(graft.ops.Checkpoints.cut))
    def pick(cand: DataFrame, seg: String) = cand
      .agg(min(struct(expr("-gain").as("ng"), col("x").as("x"))).as("m"))
      .selectExpr(s"'$seg' AS segment", "CAST(2 AS INT) AS level",
        "m.x AS split_day", "-m.ng AS gain")
      .filter(col("split_day").isNotNull)
    val left = pick(pre.crossJoin(wroot).filter(col("i") < col("ri"))
      .selectExpr("x", s"${segGain("s1", "s2", "i", "rs1", "rs2", "ri")} AS gain"),
      "left")
    val right = pick(pre.crossJoin(wroot)
      .filter(col("i") > col("ri") && col("i") < col("n"))
      .selectExpr("x", s"${segGain("(s1 - rs1)", "(s2 - rs2)", "(i - ri)",
        "(t1 - rs1)", "(t2 - rs2)", "(n - ri)")} AS gain"),
      "right")
    root.selectExpr("'root' AS segment", "CAST(1 AS INT) AS level",
        "root_x AS split_day", "root_gain AS gain")
      .unionByName(left).unionByName(right)
      .orderBy("level", "segment")
  }

  val dailyRevenueChangepointsOracle: String =
    s"""WITH series AS (
          SELECT $dayGrainDuck AS x,
            sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
          FROM lineitem GROUP BY 1),
        pre AS MATERIALIZED (SELECT x, y,
            row_number() OVER (ORDER BY x) AS i,
            sum(y) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1,
            CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS s2,
            count(*) OVER () AS n,
            sum(y) OVER () AS t1,
            CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) OVER () AS DECIMAL(38,0)) AS t2
          FROM series),
        rootc AS (SELECT x, i, s1, s2,
            ${segGain("s1", "s2", "i", "t1", "t2", "n")} AS gain
          FROM pre WHERE i < n),
        root AS MATERIALIZED (SELECT x AS root_x, i AS ri, s1 AS rs1,
            s2 AS rs2, gain AS root_gain
          FROM (SELECT *, row_number() OVER (ORDER BY gain DESC, x) AS rn
                FROM rootc) z WHERE rn = 1),
        leftp AS (SELECT p.x,
            ${segGain("p.s1", "p.s2", "p.i", "r.rs1", "r.rs2", "r.ri")} AS gain
          FROM pre p CROSS JOIN root r WHERE p.i < r.ri),
        rightp AS (SELECT p.x,
            ${segGain("(p.s1 - r.rs1)", "(p.s2 - r.rs2)", "(p.i - r.ri)",
      "(p.t1 - r.rs1)", "(p.t2 - r.rs2)", "(p.n - r.ri)")} AS gain
          FROM pre p CROSS JOIN root r WHERE p.i > r.ri AND p.i < p.n),
        out AS (
          SELECT 'root' AS segment, CAST(1 AS INTEGER) AS level,
            root_x AS split_day, root_gain AS gain FROM root
          UNION ALL
          SELECT 'left', CAST(2 AS INTEGER), x, gain FROM
            (SELECT *, row_number() OVER (ORDER BY gain DESC, x) AS rn
             FROM leftp) z WHERE rn = 1
          UNION ALL
          SELECT 'right', CAST(2 AS INTEGER), x, gain FROM
            (SELECT *, row_number() OVER (ORDER BY gain DESC, x) AS rn
             FROM rightp) z WHERE rn = 1)
        SELECT segment, level, split_day, gain FROM out
        ORDER BY level, segment"""

  // ---- open-order backlog over time ----

  /** Orders in flight per day — the classic concurrent-intervals
    * count, done the way it scales: never join days×orders (interval
    * stabbing is quadratic-prone); emit +1 at each order's open date
    * and −1 the day after its close (last ship date), aggregate to
    * the day grain, and prefix-sum the deltas — the CUSUM/carry-
    * forward calendar-scan shape, day-grain regardless of order
    * volume. Orders with no line items never close (stay in the
    * backlog — the honest semantics for a missing fulfilment). */
  def ordersOpenBacklog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val opens = graft.io.Tables.orders(spark, dir)
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS day",
        "CAST(1 AS BIGINT) AS delta", "CAST(1 AS BIGINT) AS opened",
        "CAST(0 AS BIGINT) AS closed")
    val closes = graft.io.Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(max(expr("CAST(l_shipdate AS DATE)")).as("close_day"))
      .selectExpr("l_orderkey", "date_add(close_day, 1) AS day",
        "CAST(-1 AS BIGINT) AS delta", "CAST(0 AS BIGINT) AS opened",
        "CAST(1 AS BIGINT) AS closed")
    val daily = opens.select("day", "delta", "opened", "closed")
      .unionAll(closes.select("day", "delta", "opened", "closed"))
      .groupBy("day").agg(
        sum("delta").as("delta"),
        sum("opened").as("n_opened"),
        sum("closed").as("n_closed"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.withColumn("backlog", sum("delta").over(w))
      .selectExpr("day", "n_opened",
        // closes recorded on day+1; report them against that day
        "n_closed", "CAST(backlog AS BIGINT) AS backlog")
      .orderBy("day")
  }

  val ordersOpenBacklogOracle: String =
    """WITH opens AS (SELECT CAST(o_orderdate AS DATE) AS day,
           1 AS delta, 1 AS opened, 0 AS closed FROM orders),
       closes AS (SELECT cd + 1 AS day, -1 AS delta, 0 AS opened, 1 AS closed
         FROM (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS cd
               FROM lineitem GROUP BY l_orderkey) c),
       daily AS (SELECT day, sum(delta) AS delta,
           sum(opened) AS n_opened, sum(closed) AS n_closed
         FROM (SELECT * FROM opens UNION ALL SELECT * FROM closes) u
         GROUP BY day)
       SELECT day, CAST(n_opened AS BIGINT) AS n_opened,
         CAST(n_closed AS BIGINT) AS n_closed,
         CAST(sum(delta) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS backlog
       FROM daily ORDER BY day"""

  // ---- Wilson interval for brand return rates ----

  /** Per-brand return rate with a 95 % Wilson score interval — the
    * honest small-sample CI (a ±1.96·√(p̂q̂/n) Wald band collapses to
    * zero width at p̂ ∈ {0,1}; Wilson stays calibrated), which is what
    * separates "brand with 3 returns out of 4" from "brand with 3000
    * out of 4000" in a quality triage. Counts are one map-side agg on
    * the brand key; the interval is a fixed IEEE tree over the two
    * exact counts, nano-quantized at the readout (the quantized-
    * readout discipline — raw doubles carry ulp risk through √). */
  def brandReturnsWilson(spark: SparkSession, dir: String): DataFrame = {
    val z2 = "3.8415" // 1.96²
    val g = graft.io.Tables.lineitem(spark, dir)
      .join(broadcast(graft.io.Tables.table(spark, dir, "part")
        .select("p_partkey", "p_brand")), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(
        count(lit(1)).as("n"),
        sum(expr("CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END")).as("r"))
    g.selectExpr("p_brand AS brand", "n", "r",
        "CAST(r AS DOUBLE) / n AS ph")
      .selectExpr("brand", "n", "r",
        "CAST(round(ph * 1000000000) AS BIGINT) AS rate_nano",
        s"""CAST(round(((ph + $z2 / (2 * n)
             - sqrt($z2) * sqrt((ph * (1 - ph) + $z2 / (4 * n)) / n))
             / (1 + $z2 / n)) * 1000000000) AS BIGINT) AS lo_nano""",
        s"""CAST(round(((ph + $z2 / (2 * n)
             + sqrt($z2) * sqrt((ph * (1 - ph) + $z2 / (4 * n)) / n))
             / (1 + $z2 / n)) * 1000000000) AS BIGINT) AS hi_nano""")
      .orderBy("brand")
  }

  val brandReturnsWilsonOracle: String = {
    val z2 = "3.8415"
    s"""WITH g AS (SELECT p.p_brand AS brand, count(*) AS n,
           sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY p.p_brand),
       ph_t AS (SELECT brand, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
           CAST(r AS DOUBLE) / n AS ph FROM g)
       SELECT brand, n, r,
         CAST(round(ph * 1000000000) AS BIGINT) AS rate_nano,
         CAST(round(((ph + $z2 / (2 * n)
           - sqrt($z2) * sqrt((ph * (1 - ph) + $z2 / (4 * n)) / n))
           / (1 + $z2 / n)) * 1000000000) AS BIGINT) AS lo_nano,
         CAST(round(((ph + $z2 / (2 * n)
           + sqrt($z2) * sqrt((ph * (1 - ph) + $z2 / (4 * n)) / n))
           / (1 + $z2 / n)) * 1000000000) AS BIGINT) AS hi_nano
       FROM ph_t ORDER BY brand"""
  }

  // ---- two-feature linear regression ----

  /** Two-feature OLS (extended price ~ quantity + discount) by the
    * closed-form 2×2 normal equations — multivariate regression at
    * scale is the same decomposable-moments pattern as the univariate
    * [[dailyRevenueTrend]]: ONE pass of exact integer sums
    * (cent/basis-point-quantized), then the coefficient solve and R²
    * as a fixed IEEE tree over DOUBLE casts. Nine moments cover the
    * full normal-equation system; adding a feature adds a column of
    * moments, never a pass. Second moments ride DECIMAL(38,0)
    * ([[graft.ops.Profile]]'s Spearman lesson — cent-quantized price
    * squares wrap BIGINT in the billions of rows). */
  def lineitemRegression2f(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.io.Tables.lineitem(spark, dir).selectExpr(
      "CAST(round(l_quantity * 100) AS BIGINT) AS x1",
      "CAST(round(l_discount * 10000) AS BIGINT) AS x2",
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
    val dec = "DECIMAL(38,0)"
    val m = q.agg(
      expr("CAST(count(1) AS BIGINT)").as("n"),
      expr("CAST(sum(x1) AS BIGINT)").as("s1"),
      expr("CAST(sum(x2) AS BIGINT)").as("s2"),
      expr("CAST(sum(y) AS BIGINT)").as("sy"),
      expr(s"sum(CAST(x1 AS $dec) * x1)").as("s11"),
      expr(s"sum(CAST(x2 AS $dec) * x2)").as("s22"),
      expr(s"sum(CAST(x1 AS $dec) * x2)").as("s12"),
      expr(s"sum(CAST(x1 AS $dec) * y)").as("s1y"),
      expr(s"sum(CAST(x2 AS $dec) * y)").as("s2y"),
      expr(s"sum(CAST(y AS $dec) * y)").as("syy"))
    m.selectExpr("n",
        // centered second moments (all exact → double once)
        "CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 AS c11",
        "CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 AS c22",
        "CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 AS c12",
        "CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy AS c1y",
        "CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy AS c2y",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy",
        "CAST(s1 AS DOUBLE) AS s1d", "CAST(s2 AS DOUBLE) AS s2d",
        "CAST(sy AS DOUBLE) AS syd")
      .selectExpr("n",
        "(c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1",
        "(c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2",
        "c11", "c22", "c12", "c1y", "c2y", "cyy", "s1d", "s2d", "syd")
      .selectExpr("CAST(n AS BIGINT) AS n", "b1", "b2",
        "(syd - b1 * s1d - b2 * s2d) / n AS intercept", "c1y", "c2y", "cyy")
      // readouts are nano/femto-quantized: the >2^53 exact moments
      // round to DOUBLE one ulp apart between engines on some corpora,
      // and that ulp walks into the last bits of the raw ratios
      .selectExpr("n",
        "CAST(round(b1 * 1000000000) AS BIGINT) AS b1_nano",
        "CAST(round(b2 * 1000000000) AS BIGINT) AS b2_nano",
        "CAST(round(intercept * 1000) AS BIGINT) AS intercept_milli",
        "CAST(round((b1 * c1y + b2 * c2y) / cyy * 1e15) AS BIGINT) AS r2_femto")
  }

  val lineitemRegression2fOracle: String =
    """WITH q AS (SELECT
         CAST(round(l_quantity * 100) AS BIGINT) AS x1,
         CAST(round(l_discount * 10000) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
       FROM lineitem),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(x1 AS HUGEINT) * x1) AS s11,
           sum(CAST(x2 AS HUGEINT) * x2) AS s22,
           sum(CAST(x1 AS HUGEINT) * x2) AS s12,
           sum(CAST(x1 AS HUGEINT) * y) AS s1y,
           sum(CAST(x2 AS HUGEINT) * y) AS s2y,
           sum(CAST(y AS HUGEINT) * y) AS syy
         FROM q),
       c AS (SELECT n,
           CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 AS c11,
           CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 AS c22,
           CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 AS c12,
           CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy AS c1y,
           CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy AS c2y,
           CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy,
           CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
           CAST(sy AS DOUBLE) AS syd
         FROM m),
       b AS (SELECT n,
           (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
           (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2,
           c11, c22, c12, c1y, c2y, cyy, s1d, s2d, syd
         FROM c),
       b2t AS (SELECT n, b1, b2,
           (syd - b1 * s1d - b2 * s2d) / n AS intercept, c1y, c2y, cyy
         FROM b)
       SELECT CAST(n AS BIGINT) AS n,
         CAST(round(b1 * 1000000000) AS BIGINT) AS b1_nano,
         CAST(round(b2 * 1000000000) AS BIGINT) AS b2_nano,
         CAST(round(intercept * 1000) AS BIGINT) AS intercept_milli,
         CAST(round((b1 * c1y + b2 * c2y) / cyy * 1e15) AS BIGINT) AS r2_femto
       FROM b2t"""

  // ---- one-way ANOVA ----

  /** One-way ANOVA F statistic for document length across languages —
    * the many-group location test completing the battery (chi-square:
    * independence; Mann-Whitney: two-sample; ANOVA: k-sample). All
    * between/within sums of squares assemble from per-group exact
    * integer moments (one group-keyed hash agg over the lang domain);
    * F is the only float. SSB = Σ nᵢ·(meanᵢ − mean)² and
    * SSW = Σᵢ (Σx² − (Σx)²/nᵢ) are computed from the moment identities
    * so no per-row float deviation ever sums. */
  def docsAnovaLength(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.io.Tables.documents(spark, dir)
      .selectExpr("lang", "n_chars AS x")
      .groupBy("lang").agg(
        count(lit(1)).as("ni"),
        sum("x").as("si"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sii"))
    val tot = g.agg(sum("ni").as("n"), sum("si").as("s"),
      sum("sii").as("ss"), count(lit(1)).as("k"))
    g.crossJoin(broadcast(tot))
      .selectExpr("n", "k",
        // group term of SSB: ni·meani² = si²/ni ; and SSW term
        // per-group terms are rationals; milli-quantize each BEFORE
        // summing so the cross-group sum is an order-independent
        // BIGINT (a float sum over groups could differ by an ulp
        // between engines)
        "CAST(round((CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT) AS sbterm",
        "CAST(round((CAST(sii AS DOUBLE) - CAST(si AS DOUBLE) * si / ni) * 1000) AS BIGINT) AS swterm",
        "CAST(s AS DOUBLE) AS sd", "CAST(ss AS DOUBLE) AS ssd")
      .groupBy("n", "k", "sd", "ssd")
      .agg(sum("sbterm").as("sb"), sum("swterm").as("sw"))
      .selectExpr("CAST(n AS BIGINT) AS n", "CAST(k AS BIGINT) AS k",
        "CAST(sb AS DOUBLE) / 1000 - sd * sd / n AS ssb",
        "CAST(sw AS DOUBLE) / 1000 AS ssw")
      .selectExpr("n", "k", "ssb", "ssw",
        "(ssb / (k - 1)) / (ssw / (n - k)) AS f_stat")
  }

  val docsAnovaLengthOracle: String =
    """WITH g AS (SELECT lang, count(*) AS ni,
           CAST(sum(n_chars) AS BIGINT) AS si,
           sum(CAST(n_chars AS HUGEINT) * n_chars) AS sii
         FROM documents GROUP BY lang),
       tot AS (SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(si) AS BIGINT) AS s,
           sum(sii) AS ss, count(*) AS k FROM g),
       terms AS (SELECT t.n, t.k,
           CAST(round((CAST(g.si AS DOUBLE) * g.si / g.ni) * 1000) AS BIGINT) AS sbterm,
           CAST(round((CAST(g.sii AS DOUBLE) - CAST(g.si AS DOUBLE) * g.si / g.ni) * 1000) AS BIGINT) AS swterm,
           CAST(t.s AS DOUBLE) AS sd, CAST(t.ss AS DOUBLE) AS ssd
         FROM g CROSS JOIN tot t),
       agg AS (SELECT n, k, sd, ssd,
           CAST(sum(sbterm) AS BIGINT) AS sb, CAST(sum(swterm) AS BIGINT) AS sw
         FROM terms GROUP BY n, k, sd, ssd),
       fin AS (SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(sb AS DOUBLE) / 1000 - sd * sd / n AS ssb,
           CAST(sw AS DOUBLE) / 1000 AS ssw FROM agg)
       SELECT n, k, ssb, ssw,
         (ssb / (k - 1)) / (ssw / (n - k)) AS f_stat
       FROM fin"""

  // ---- trend + weekday variance decomposition ----

  /** Seasonal decomposition readout: how much daily-revenue variance
    * the linear trend explains, and how much more the weekday profile
    * adds — the one-row answer to "is this series trending, weekly,
    * or noise" that decides which forecaster [[dailyRevenueBacktest]]
    * should even field. Discipline: OLS coefficients come from the
    * exact integer moments (shared with [[dailyRevenueTrend]]);
    * detrended residuals are quantized to exact integer CENTS before
    * any aggregation (float residual sums would be partitioning-
    * dependent); weekday means use floor(s/n) on a DOUBLE division of
    * exact ints (both engines round the division identically — integer
    * DIV would diverge on negatives: Spark truncates, DuckDB floors);
    * the variance ratios are one shared IEEE tree at the end. The
    * whole operator is day-grain. */
  def dailyRevenueDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain).transform(graft.ops.Checkpoints.cut)
    val m = series.selectExpr(olsMoments: _*)
    val fit = m.selectExpr("n", "sy", "syy",
      """(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
         (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b""",
      "CAST(sx AS DOUBLE) AS sxd")
      .selectExpr("n", "sy", "syy", "b",
        "(CAST(sy AS DOUBLE) - b * sxd) / n AS a")
    val resid = series.crossJoin(broadcast(fit))
      .selectExpr("x % 7 AS wd",
        "CAST(round((CAST(y AS DOUBLE) - (a + b * x)) * 100) AS BIGINT) AS dc",
        "n", "sy", "syy")
      .transform(graft.ops.Checkpoints.cut)
    val wm = resid.groupBy("wd")
      .agg(sum("dc").as("swd"), count(lit(1)).as("nwd"))
      .selectExpr("wd", "floor(CAST(swd AS DOUBLE) / nwd) AS wmean")
    resid.join(broadcast(wm), Seq("wd"))
      .selectExpr("n", "sy", "syy", "dc",
        "CAST(dc - wmean AS BIGINT) AS rc")
      .groupBy("n", "sy", "syy")
      .agg(sum(expr("CAST(dc AS DECIMAL(38,0)) * dc")).as("sdd"),
        sum(expr("CAST(rc AS DECIMAL(38,0)) * rc")).as("srr"))
      .selectExpr("CAST(n AS BIGINT) AS n_days",
        "CAST(sdd AS DOUBLE) AS ss_detrended_cents2",
        "CAST(srr AS DOUBLE) AS ss_residual_cents2",
        // ss_total (dollar²·n²-scaled) = n·Σy² − (Σy)²; residual sums
        // are cents² · n-scaled → align scales via n and 10⁴
        """1.0 - CAST(n AS DOUBLE) * sdd /
           (10000.0 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2_trend""",
        """1.0 - CAST(n AS DOUBLE) * srr /
           (10000.0 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2_trend_weekday""")
  }

  val dailyRevenueDecompositionOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       m AS (SELECT ${olsMoments.mkString(", ")} FROM series),
       fit AS (SELECT n, sy, syy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
             (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
           CAST(sx AS DOUBLE) AS sxd
         FROM m),
       fit2 AS (SELECT n, sy, syy, b,
           (CAST(sy AS DOUBLE) - b * sxd) / n AS a FROM fit),
       resid AS (SELECT s.x % 7 AS wd,
           CAST(round((CAST(s.y AS DOUBLE) - (f.a + f.b * s.x)) * 100) AS BIGINT) AS dc,
           f.n, f.sy, f.syy
         FROM series s CROSS JOIN fit2 f),
       wm AS (SELECT wd, floor(CAST(sum(dc) AS DOUBLE) / count(*)) AS wmean
              FROM resid GROUP BY wd),
       rr AS (SELECT r.n, r.sy, r.syy, r.dc,
           CAST(r.dc - w.wmean AS BIGINT) AS rc
         FROM resid r JOIN wm w ON r.wd = w.wd),
       agg AS (SELECT n, sy, syy,
           sum(CAST(dc AS HUGEINT) * dc) AS sdd,
           sum(CAST(rc AS HUGEINT) * rc) AS srr
         FROM rr GROUP BY n, sy, syy)
       SELECT CAST(n AS BIGINT) AS n_days,
         CAST(sdd AS DOUBLE) AS ss_detrended_cents2,
         CAST(srr AS DOUBLE) AS ss_residual_cents2,
         1.0 - CAST(n AS DOUBLE) * sdd /
           (10000.0 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2_trend,
         1.0 - CAST(n AS DOUBLE) * srr /
           (10000.0 * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2_trend_weekday
       FROM agg"""

  // ---- forecast backtest (MASE) ----

  /** Rolling-origin forecast backtest on the daily revenue series:
    * hold out the last 7 observed days, score three closed-form
    * forecasters — last-value naive, train mean, weekly
    * seasonal-naive (t−7, falling back to the naive value when the
    * lagged day is absent) — by MAE and MASE (MAE relative to naive,
    * Hyndman & Koehler 2006). The point of shipping the BACKTEST
    * rather than another forecaster: at 100 TB the model zoo changes,
    * but the evaluation harness (holdout split, lag join, error agg)
    * is the stable operator, and it runs entirely on the day grain —
    * the fact table died in the first hash agg. Error sums are exact
    * BIGINT dollars; only the MAE/MASE readouts divide. */
  def dailyRevenueBacktest(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain).transform(graft.ops.Checkpoints.cut)
    val cut = series.agg(expr("max(x) - 6").as("cut"))
    val train = series.crossJoin(broadcast(cut)).filter(col("x") < col("cut"))
    val trainStats = train.agg(
      expr("max_by(y, x)").as("last_y"),
      expr("sum(y) DIV count(1)").as("mean_y"))
    val holdout = series.crossJoin(broadcast(cut)).filter(col("x") >= col("cut"))
      .select("x", "y")
      .join(series.selectExpr("x + 7 AS x", "y AS y7"), Seq("x"), "left")
    val agg = holdout.crossJoin(broadcast(trainStats)).agg(
      count(lit(1)).as("n_days"),
      sum(expr("abs(y - last_y)")).as("naive_sum"),
      sum(expr("abs(y - mean_y)")).as("mean_sum"),
      sum(expr("abs(y - coalesce(y7, last_y))")).as("seasonal_sum"))
    agg.selectExpr("n_days", "naive_sum",
        """stack(3,
             'mean', mean_sum,
             'naive', naive_sum,
             'seasonal', seasonal_sum) AS (method, mae_sum)""")
      .selectExpr("method", "n_days", "mae_sum",
        "CAST(mae_sum AS DOUBLE) / n_days AS mae",
        "CASE WHEN naive_sum > 0 THEN CAST(mae_sum AS DOUBLE) / naive_sum ELSE CAST(0 AS DOUBLE) END AS mase")
      .orderBy("method")
  }

  val dailyRevenueBacktestOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       cut AS (SELECT max(x) - 6 AS cut FROM series),
       train AS (SELECT s.* FROM series s CROSS JOIN cut WHERE s.x < cut),
       ts AS (SELECT max_by(y, x) AS last_y, sum(y) // count(*) AS mean_y FROM train),
       holdout AS (SELECT s.x, s.y, l.y AS y7
         FROM series s CROSS JOIN cut
         LEFT JOIN series l ON l.x = s.x - 7
         WHERE s.x >= cut),
       agg AS (SELECT count(*) AS n_days,
           sum(abs(y - last_y)) AS naive_sum,
           sum(abs(y - mean_y)) AS mean_sum,
           sum(abs(y - coalesce(y7, last_y))) AS seasonal_sum
         FROM holdout CROSS JOIN ts),
       stacked AS (
         SELECT 'mean' AS method, n_days, mean_sum AS mae_sum, naive_sum FROM agg
         UNION ALL
         SELECT 'naive', n_days, naive_sum, naive_sum FROM agg
         UNION ALL
         SELECT 'seasonal', n_days, seasonal_sum, naive_sum FROM agg)
       SELECT method, CAST(n_days AS BIGINT) AS n_days,
         CAST(mae_sum AS BIGINT) AS mae_sum,
         CAST(mae_sum AS DOUBLE) / n_days AS mae,
         CASE WHEN naive_sum > 0 THEN CAST(mae_sum AS DOUBLE) / naive_sum ELSE CAST(0 AS DOUBLE) END AS mase
       FROM stacked ORDER BY method"""

  // ---- difference-in-differences (promo effect) ----

  /** Difference-in-differences estimate of the promo effect on
    * per-line revenue (Card & Krueger 1994's identification strategy,
    * on the fixture's natural experiment): treated = PROMO-type
    * parts, control = everything else, periods split at the corpus
    * ship-date midpoint (derived, not hard-coded), and
    * DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) — the
    * estimator that differences away both the group-level baseline
    * gap and the common time trend, which a naive post-period
    * comparison conflates. One conditional aggregation produces all
    * four cells (exact BIGINT cent sums and counts); the four means
    * and the estimate are fixed IEEE trees at the end. Parallel-trends
    * is the untestable assumption — stated, not implied. */
  def lineitemPromoDid(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS d")
    val parts = graft.io.Tables.part(spark, dir)
      .selectExpr("p_partkey AS l_partkey",
        "CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS treated")
    val cut = li.agg(expr("(min(d) + max(d)) DIV 2").as("cut_d"))
    li.join(broadcast(parts), "l_partkey")
      .crossJoin(broadcast(cut))
      .selectExpr("treated", "CASE WHEN d >= cut_d THEN 1 ELSE 0 END AS post", "cents")
      .groupBy()
      .agg(
        sum(expr("CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END")).as("s_tp"),
        sum(expr("CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END")).as("n_tp"),
        sum(expr("CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END")).as("s_t0"),
        sum(expr("CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END")).as("n_t0"),
        sum(expr("CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END")).as("s_cp"),
        sum(expr("CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END")).as("n_cp"),
        sum(expr("CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END")).as("s_c0"),
        sum(expr("CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END")).as("n_c0"))
      .selectExpr(
        "CAST(n_tp AS BIGINT) AS n_treated_post", "CAST(n_t0 AS BIGINT) AS n_treated_pre",
        "CAST(n_cp AS BIGINT) AS n_control_post", "CAST(n_c0 AS BIGINT) AS n_control_pre",
        "CAST(s_tp AS DOUBLE) / (100 * n_tp) AS y_treated_post",
        "CAST(s_t0 AS DOUBLE) / (100 * n_t0) AS y_treated_pre",
        "CAST(s_cp AS DOUBLE) / (100 * n_cp) AS y_control_post",
        "CAST(s_c0 AS DOUBLE) / (100 * n_c0) AS y_control_pre")
      .selectExpr("*",
        "(y_treated_post - y_treated_pre) - (y_control_post - y_control_pre) AS did")
  }

  val lineitemPromoDidOracle: String =
    """WITH li AS (SELECT l_partkey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents,
           CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
         FROM lineitem),
       cut AS (SELECT (min(d) + max(d)) // 2 AS cut_d FROM li),
       j AS (SELECT CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS treated,
           CASE WHEN li.d >= cut_d THEN 1 ELSE 0 END AS post, li.cents
         FROM li JOIN part p ON li.l_partkey = p.p_partkey CROSS JOIN cut),
       agg AS (SELECT
           CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
           CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_t0,
           CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
           CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
           CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
           CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_c0,
           CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0
         FROM j),
       means AS (SELECT n_tp AS n_treated_post, n_t0 AS n_treated_pre,
           n_cp AS n_control_post, n_c0 AS n_control_pre,
           CAST(s_tp AS DOUBLE) / (100 * n_tp) AS y_treated_post,
           CAST(s_t0 AS DOUBLE) / (100 * n_t0) AS y_treated_pre,
           CAST(s_cp AS DOUBLE) / (100 * n_cp) AS y_control_post,
           CAST(s_c0 AS DOUBLE) / (100 * n_c0) AS y_control_pre
         FROM agg)
       SELECT *,
         (y_treated_post - y_treated_pre) - (y_control_post - y_control_pre) AS did
       FROM means"""

  // ---- lang × source independence (chi-square + Cramér's V) ----

  /** Independence test of the documents' language × source
    * contingency — the corpus-composition audit that catches a feed
    * silently becoming monolingual (a common crawl failure mode):
    * Pearson χ², Cramér's V (the [0,1] effect size χ² alone lacks —
    * with 100 cells a significant χ² can still be a trivial
    * association), and the count of |standardized residual| > 2
    * cells, the "which cells drive it" readout. Expected counts are
    * exact rationals n_r·n_c/n; each cell's χ² term is one fixed IEEE
    * tree over exact BIGINTs, nano-quantized BEFORE the cross-cell
    * sum (the ANOVA order-independence discipline), so the gate holds
    * bit-exact; V's single sqrt is correctly rounded on both engines.
    * Grain: sources × langs cells — dimension-bounded at any corpus
    * size. */
  def docsLangSourceIndependence(spark: SparkSession, dir: String): DataFrame = {
    val cells = graft.io.Tables.documents(spark, dir)
      .groupBy("source", "lang").agg(count(lit(1)).as("o"))
    val full = cells
      .withColumn("n_r", expr("sum(o) OVER (PARTITION BY source)"))
      .withColumn("n_c", expr("sum(o) OVER (PARTITION BY lang)"))
      .withColumn("n", expr("sum(o) OVER ()"))
      .selectExpr("source", "lang", "o", "n_r", "n_c", "n",
        """CAST(round((CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
             * (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
             / (CAST(n_r AS DOUBLE) * n_c / n) * 1e9) AS BIGINT) AS chi_nano""",
        """CASE WHEN (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                   * (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                 > 4 * (CAST(n_r AS DOUBLE) * n_c / n)
           THEN 1 ELSE 0 END AS big_resid""")
    full.agg(
        expr("CAST(max(n) AS BIGINT) AS n"),
        expr("CAST(count(1) AS BIGINT) AS n_cells"),
        expr("CAST(count(DISTINCT source) AS BIGINT) AS n_sources"),
        expr("CAST(count(DISTINCT lang) AS BIGINT) AS n_langs"),
        expr("CAST(sum(chi_nano) AS BIGINT) AS chi2_nano"),
        expr("CAST(sum(big_resid) AS BIGINT) AS n_big_residuals"))
      .selectExpr("n", "n_cells", "n_sources", "n_langs",
        "chi2_nano", "n_big_residuals",
        "(n_sources - 1) * (n_langs - 1) AS df",
        """sqrt(chi2_nano / 1e9
           / (n * least(n_sources - 1, n_langs - 1))) AS cramers_v""")
  }

  val docsLangSourceIndependenceOracle: String =
    """WITH cells AS (SELECT source, lang, count(*) AS o
         FROM documents GROUP BY 1, 2),
       full_t AS (SELECT source, lang, o,
           sum(o) OVER (PARTITION BY source) AS n_r,
           sum(o) OVER (PARTITION BY lang) AS n_c,
           sum(o) OVER () AS n
         FROM cells),
       terms AS (SELECT source, lang, o, n_r, n_c, n,
           CAST(round((CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
             * (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
             / (CAST(n_r AS DOUBLE) * n_c / n) * 1e9) AS BIGINT) AS chi_nano,
           CASE WHEN (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                    * (CAST(o AS DOUBLE) - CAST(n_r AS DOUBLE) * n_c / n)
                  > 4 * (CAST(n_r AS DOUBLE) * n_c / n)
             THEN 1 ELSE 0 END AS big_resid
         FROM full_t),
       agg AS (SELECT CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(sum(chi_nano) AS BIGINT) AS chi2_nano,
           CAST(sum(big_resid) AS BIGINT) AS n_big_residuals
         FROM terms)
       SELECT n, n_cells, n_sources, n_langs, chi2_nano, n_big_residuals,
         (n_sources - 1) * (n_langs - 1) AS df,
         sqrt(chi2_nano / 1e9
           / (n * least(n_sources - 1, n_langs - 1))) AS cramers_v
       FROM agg"""

  // ---- pinball-loss quantile (loss-minimization view) ----

  /** The 0.9-quantile of daily revenue derived TWICE: as the order
    * statistic, and as the minimizer of the pinball (quantile) loss
    * L_τ(c) = Σ τ·(y−c)⁺ + (1−τ)·(c−y)⁺ — the loss quantile
    * regression and forecast-interval scoring optimize. The theorem
    * that any τ-quantile minimizes L_τ (Koenker & Bassett 1978)
    * becomes a CHECKED FLAG: both derivations must name the same
    * value, and the oracle hashes the flag as a literal 1.
    *
    * Exactness: with τ = 9/10 and integer dollars, 10·L is an exact
    * BIGINT — per candidate c (the distinct values), both one-sided
    * sums come from cumulative count/sum windows over the value
    * domain, so the whole sweep is O(distinct values), not O(n²), and
    * the argmin comparison never touches a float. Ties break to the
    * smallest candidate, the lower quantile. */
  def dailyRevenuePinballQuantile(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain)
      .transform(graft.ops.Checkpoints.cut)
    val cand = series.groupBy("y").agg(count(lit(1)).as("cnt"))
      .selectExpr("y AS c", "cnt",
        """CAST(sum(cnt) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_le""",
        """CAST(sum(y * cnt) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_le""",
        "CAST(sum(cnt) OVER () AS BIGINT) AS n",
        "CAST(sum(y * cnt) OVER () AS BIGINT) AS s")
      .selectExpr("c", "n_le", "n",
        "9 * ((s - sum_le) - c * (n - n_le)) + (c * n_le - sum_le) AS loss10")
    val best = cand.orderBy(asc("loss10"), asc("c")).limit(1)
      .selectExpr("c AS q_pinball", "loss10", "n")
    val orderStat = cand
      .filter(expr("n_le >= (9 * n + 9) DIV 10"))
      .orderBy(asc("c")).limit(1)
      .selectExpr("c AS q_order")
    best.crossJoin(broadcast(orderStat))
      .selectExpr("n", "q_pinball", "q_order", "loss10",
        "CAST(CASE WHEN q_pinball = q_order THEN 1 ELSE 0 END AS INT) AS theorem_holds")
  }

  val dailyRevenuePinballQuantileOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       cand0 AS (SELECT y AS c, count(*) AS cnt FROM series GROUP BY y),
       cand AS (SELECT c,
           CAST(sum(cnt) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_le,
           CAST(sum(c * cnt) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_le,
           CAST(sum(cnt) OVER () AS BIGINT) AS n,
           CAST(sum(c * cnt) OVER () AS BIGINT) AS s
         FROM cand0),
       sweep AS (SELECT c, n_le, n,
           9 * ((s - sum_le) - c * (n - n_le)) + (c * n_le - sum_le) AS loss10
         FROM cand),
       best AS (SELECT c AS q_pinball, loss10, n FROM sweep
         ORDER BY loss10, c LIMIT 1),
       ord AS (SELECT c AS q_order FROM sweep
         WHERE n_le >= (9 * n + 9) // 10 ORDER BY c LIMIT 1)
       SELECT n, CAST(q_pinball AS BIGINT) AS q_pinball,
         CAST(q_order AS BIGINT) AS q_order,
         CAST(loss10 AS BIGINT) AS loss10,
         CAST(CASE WHEN q_pinball = q_order THEN 1 ELSE 0 END AS INT) AS theorem_holds
       FROM best CROSS JOIN ord"""

  // ---- Wald-Wolfowitz runs test ----

  /** Runs test for randomness of the daily revenue series around its
    * median (Wald & Wolfowitz 1940): days are signed above/below the
    * median (exact low-median order statistic; exact-median days are
    * dropped, the standard dichotomization), the run count R is an
    * exact integer from a lag comparison, and the normal approximation
    * z = (R − E[R])/√Var[R] uses the closed-form rational moments
    * E = 1 + 2n₁n₂/n, Var = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)). Too FEW runs
    * means positive serial dependence (trends, regimes — what CUSUM
    * and Mann–Kendall then characterize); too many means oscillation.
    * This is the cheap "is there any structure at all" gate in front
    * of the heavier trend battery. Day-grain everything; the one sqrt
    * is IEEE-exact-rounded on both engines. */
  def dailyRevenueRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain)
      .transform(graft.ops.Checkpoints.cut)
    val med = series
      .selectExpr("y", "row_number() OVER (ORDER BY y, x) AS rk",
        "count(1) OVER () AS n")
      .filter(expr("rk = (n + 1) DIV 2"))
      .selectExpr("y AS median_y")
    val signed = series.crossJoin(broadcast(med))
      .filter(col("y") =!= col("median_y"))
      .selectExpr("x", "CASE WHEN y > median_y THEN 1 ELSE 0 END AS s")
    val runs = signed
      .selectExpr("s",
        """CASE WHEN lag(s) OVER (ORDER BY x) IS NULL
                OR lag(s) OVER (ORDER BY x) <> s THEN 1 ELSE 0 END AS new_run""")
      .agg(sum("new_run").as("r"),
        sum("s").as("n1"),
        sum(expr("1 - s")).as("n2"))
    runs
      .selectExpr("CAST(r AS BIGINT) AS r", "CAST(n1 AS BIGINT) AS n1",
        "CAST(n2 AS BIGINT) AS n2")
      .selectExpr("r", "n1", "n2",
        "1 + 2 * CAST(n1 AS DOUBLE) * n2 / (n1 + n2) AS e_r",
        """2 * CAST(n1 AS DOUBLE) * n2 * (2 * CAST(n1 AS DOUBLE) * n2 - (n1 + n2))
           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)) AS var_r""")
      .selectExpr("r", "n1", "n2", "e_r", "var_r",
        "CASE WHEN var_r > 0 THEN (r - e_r) / sqrt(var_r) ELSE CAST(0 AS DOUBLE) END AS z")
      .selectExpr("r", "n1", "n2", "e_r", "var_r", "z",
        """CASE WHEN z < -1.96 THEN 'clustered'
                WHEN z > 1.96 THEN 'oscillating'
                ELSE 'random' END AS verdict""")
  }

  val dailyRevenueRunsTestOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       med AS (SELECT y AS median_y FROM (
           SELECT y, row_number() OVER (ORDER BY y, x) AS rk,
             count(*) OVER () AS n FROM series)
         WHERE rk = (n + 1) // 2),
       signed AS (SELECT x, CASE WHEN y > median_y THEN 1 ELSE 0 END AS s
         FROM series CROSS JOIN med WHERE y <> median_y),
       flags AS (SELECT s,
           CASE WHEN lag(s) OVER (ORDER BY x) IS NULL
                OR lag(s) OVER (ORDER BY x) <> s THEN 1 ELSE 0 END AS new_run
         FROM signed),
       agg AS (SELECT CAST(sum(new_run) AS BIGINT) AS r,
           CAST(sum(s) AS BIGINT) AS n1,
           CAST(sum(1 - s) AS BIGINT) AS n2 FROM flags),
       m AS (SELECT r, n1, n2,
           1 + 2 * CAST(n1 AS DOUBLE) * n2 / (n1 + n2) AS e_r,
           2 * CAST(n1 AS DOUBLE) * n2 * (2 * CAST(n1 AS DOUBLE) * n2 - (n1 + n2))
             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)) AS var_r
         FROM agg),
       zt AS (SELECT *, CASE WHEN var_r > 0 THEN (r - e_r) / sqrt(var_r)
                ELSE CAST(0 AS DOUBLE) END AS z FROM m)
       SELECT r, n1, n2, e_r, var_r, z,
         CASE WHEN z < -1.96 THEN 'clustered'
              WHEN z > 1.96 THEN 'oscillating'
              ELSE 'random' END AS verdict
       FROM zt"""

  // ---- Mann-Kendall trend test ----

  /** Mann–Kendall monotonic-trend test on the daily revenue series —
    * the significance companion to the Theil–Sen slope (Mann 1945;
    * Kendall 1975): S = Σ_{i<j} sign(y_j − y_i), exact tie-corrected
    * variance n(n−1)(2n+5)/18 − Σ_t t(t−1)(2t+5)/18, and the
    * continuity-corrected normal score z = (S∓1)/√Var. Distribution-
    * free like the conformal operator — no residual model to
    * mis-specify; ships as a one-row readout with the ±1.96 verdict.
    *
    * Scale shape: the pair enumeration is a self-join on the DAY
    * grain — calendar² pairs (≈3M at a 7-year span), constant in the
    * fact-table volume, which died in the first hash agg. S and the
    * tie sums are exact BIGINTs; z is the only float. */
  def dailyRevenueMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain)
      .transform(graft.ops.Checkpoints.cut)
    val a = series.selectExpr("x AS xa", "y AS ya")
    val b = series.selectExpr("x AS xb", "y AS yb")
    val s = a.join(b, col("xa") < col("xb"))
      .agg(sum(expr(
        "CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1 ELSE 0 END")).as("s"))
    val ties = series.groupBy("y").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_sum"))
    val n = series.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .selectExpr("CAST(n AS BIGINT) AS n", "CAST(s AS BIGINT) AS s",
        "CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS BIGINT) AS var_num")
      .selectExpr("n", "s", "var_num",
        """CASE WHEN var_num <= 0 THEN CAST(0 AS DOUBLE)
                WHEN s > 0 THEN (s - 1) / sqrt(var_num / CAST(18 AS DOUBLE))
                WHEN s < 0 THEN (s + 1) / sqrt(var_num / CAST(18 AS DOUBLE))
                ELSE CAST(0 AS DOUBLE) END AS z""")
      .selectExpr("n", "s", "var_num", "z",
        """CASE WHEN z > 1.96 THEN 'increasing'
                WHEN z < -1.96 THEN 'decreasing'
                ELSE 'no_trend' END AS verdict""")
  }

  val dailyRevenueMannKendallOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       s_t AS (SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
         FROM series a JOIN series b ON a.x < b.x),
       ties AS (SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
         FROM (SELECT count(*) AS t FROM series GROUP BY y)),
       n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM series),
       v AS (SELECT n, s,
           CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS BIGINT) AS var_num
         FROM s_t CROSS JOIN ties CROSS JOIN n_t),
       z_t AS (SELECT n, s, var_num,
           CASE WHEN var_num <= 0 THEN CAST(0 AS DOUBLE)
                WHEN s > 0 THEN (s - 1) / sqrt(var_num / CAST(18 AS DOUBLE))
                WHEN s < 0 THEN (s + 1) / sqrt(var_num / CAST(18 AS DOUBLE))
                ELSE CAST(0 AS DOUBLE) END AS z
         FROM v)
       SELECT n, s, var_num, z,
         CASE WHEN z > 1.96 THEN 'increasing'
              WHEN z < -1.96 THEN 'decreasing'
              ELSE 'no_trend' END AS verdict
       FROM z_t"""

  // ---- robust location: trimmed and winsorized means ----

  /** 10 %-trimmed and 10 %-winsorized mean quantity per return flag —
    * the robust-location pair (Tukey; Huber 1981 §1) that survives the
    * fat tails a plain mean drowns in. Trimming drops the k = ⌊0.1·n⌋
    * extreme ranks per side; winsorizing clamps them to the surviving
    * boundary order statistics (win_sum = trim_sum + k·(q_lo + q_hi)
    * exactly — the identity the spec checks). Ranks, not values,
    * define the trim so boundary TIES are handled deterministically
    * (value-threshold trimming drops a data-dependent count).
    *
    * Everything is integer: quantities are whole in this schema
    * (centi-scaled anyway for safety), rank selection is row_number
    * with a unique (orderkey, linenumber) tiebreak, sums are BIGINT,
    * and only the final mean readouts divide. Scale note: the rank
    * window sorts each group once — the documented exact path; past
    * memory, swap the boundary selection to GK ε-quantiles and keep
    * the same conditional-sum pass (the swap changes bounds by ≤ εn
    * ranks, named here rather than silently taken). */
  def lineitemTrimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val ranked = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS flag",
        "CAST(round(l_quantity * 100) AS BIGINT) AS v",
        "l_orderkey", "l_linenumber")
      .selectExpr("flag", "v",
        """row_number() OVER (PARTITION BY flag
             ORDER BY v, l_orderkey, l_linenumber) AS rk""",
        "count(1) OVER (PARTITION BY flag) AS n")
      .selectExpr("flag", "v", "rk", "n", "n DIV 10 AS k")
    ranked.groupBy("flag")
      .agg(
        expr("max(n) AS n"), expr("max(k) AS k"),
        expr("sum(v) AS sum_all"),
        expr("sum(CASE WHEN rk > k AND rk <= n - k THEN v ELSE 0 END) AS trim_sum"),
        expr("max(CASE WHEN rk = k + 1 THEN v END) AS q_lo"),
        expr("max(CASE WHEN rk = n - k THEN v END) AS q_hi"))
      .selectExpr("flag", "n", "k", "q_lo", "q_hi",
        "CAST(sum_all AS DOUBLE) / (100 * n) AS mean",
        "CAST(trim_sum AS DOUBLE) / (100 * (n - 2 * k)) AS trimmed_mean",
        "CAST(trim_sum + k * (q_lo + q_hi) AS DOUBLE) / (100 * n) AS winsorized_mean")
      .orderBy("flag")
  }

  val lineitemTrimmedMeanOracle: String =
    """WITH ranked AS (
         SELECT l_returnflag AS flag,
           CAST(round(l_quantity * 100) AS BIGINT) AS v,
           row_number() OVER (PARTITION BY l_returnflag
             ORDER BY CAST(round(l_quantity * 100) AS BIGINT),
                      l_orderkey, l_linenumber) AS rk,
           count(*) OVER (PARTITION BY l_returnflag) AS n
         FROM lineitem),
       rk2 AS (SELECT *, n // 10 AS k FROM ranked),
       agg AS (SELECT flag, max(n) AS n, max(k) AS k,
           sum(v) AS sum_all,
           sum(CASE WHEN rk > k AND rk <= n - k THEN v ELSE 0 END) AS trim_sum,
           max(CASE WHEN rk = k + 1 THEN v END) AS q_lo,
           max(CASE WHEN rk = n - k THEN v END) AS q_hi
         FROM rk2 GROUP BY flag)
       SELECT flag, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
         q_lo, q_hi,
         CAST(sum_all AS DOUBLE) / (100 * n) AS mean,
         CAST(trim_sum AS DOUBLE) / (100 * (n - 2 * k)) AS trimmed_mean,
         CAST(trim_sum + k * (q_lo + q_hi) AS DOUBLE) / (100 * n) AS winsorized_mean
       FROM agg ORDER BY flag"""

  // ---- split-conformal forecast intervals ----

  /** Distribution-free forecast intervals on the daily revenue series
    * by split conformal prediction (Vovk et al. 2005; Lei et al. 2018
    * §2): fit a weekday-mean forecaster on history, take the
    * calibration window's absolute residuals, and the k-th order
    * statistic with k = ⌈(n+1)(1−α)⌉ (α = 0.1) is a width with a
    * FINITE-SAMPLE marginal coverage guarantee ≥ 90 % under
    * exchangeability — no model-correctness assumption, which is why
    * it ships next to the MASE backtest: the backtest scores point
    * forecasts, this bounds them. The three-way split (fit / calibrate
    * / test) is load-bearing: calibrating on the fit window breaks the
    * guarantee.
    *
    * Everything is exact: y is integer dollars, the weekday model is
    * `sum DIV count`, residuals are BIGINT, and the quantile is an
    * order statistic picked by row_number (k computed by integer
    * ceiling DIV — no float quantile interpolation for engines to
    * disagree on). Scale shape: the fact table dies in the first
    * day-grain hash agg; fit/calibration/test relations are
    * calendar-sized, every join key is `wd` (7 rows, broadcast). */
  def dailyRevenueConformal(spark: SparkSession, dir: String): DataFrame = {
    val series = revenueSeries(spark, dir, dayGrain)
      .transform(graft.ops.Checkpoints.cut)
    val cuts = series.agg(
      expr("max(x) - 13").as("cut_test"),
      expr("max(x) - 41").as("cut_cal"))
    val withCuts = series.crossJoin(broadcast(cuts))
    val fitRows = withCuts.filter(col("x") < col("cut_cal"))
    val fit = fitRows.selectExpr("x % 7 AS wd", "y")
      .groupBy("wd").agg(expr("sum(y) DIV count(1)").as("yhat_wd"))
    val gfit = fitRows.agg(expr("sum(y) DIV count(1)").as("yhat_g"))
    val calib = withCuts
      .filter(col("x") >= col("cut_cal") && col("x") < col("cut_test"))
      .selectExpr("x", "x % 7 AS wd", "y")
      .join(broadcast(fit), Seq("wd"), "left")
      .crossJoin(broadcast(gfit))
      .selectExpr("x", "abs(y - coalesce(yhat_wd, yhat_g)) AS r")
    val qhat = calib
      .selectExpr("r", "row_number() OVER (ORDER BY r, x) AS rk",
        "count(1) OVER () AS ncal")
      .filter(expr("rk = ((ncal + 1) * 9 + 9) DIV 10"))
      .selectExpr("r AS qhat")
    withCuts.filter(col("x") >= col("cut_test"))
      .selectExpr("x", "x % 7 AS wd", "y")
      .join(broadcast(fit), Seq("wd"), "left")
      .crossJoin(broadcast(gfit))
      .crossJoin(broadcast(qhat))
      .selectExpr("CAST(x AS BIGINT) AS x", "y",
        "coalesce(yhat_wd, yhat_g) AS yhat", "qhat")
      .selectExpr("x", "y", "yhat", "qhat",
        "yhat - qhat AS lo", "yhat + qhat AS hi",
        "CAST(CASE WHEN y >= yhat - qhat AND y <= yhat + qhat THEN 1 ELSE 0 END AS INT) AS covered")
      .orderBy("x")
  }

  val dailyRevenueConformalOracle: String =
    s"""WITH series AS (
         SELECT $dayGrainDuck AS x,
           sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) // 100 AS y
         FROM lineitem GROUP BY 1),
       cuts AS (SELECT max(x) - 13 AS cut_test, max(x) - 41 AS cut_cal FROM series),
       fit AS (SELECT s.x % 7 AS wd, sum(s.y) // count(*) AS yhat_wd
         FROM series s CROSS JOIN cuts WHERE s.x < cut_cal GROUP BY 1),
       gfit AS (SELECT sum(s.y) // count(*) AS yhat_g
         FROM series s CROSS JOIN cuts WHERE s.x < cut_cal),
       calib AS (SELECT s.x, abs(s.y - coalesce(f.yhat_wd, g.yhat_g)) AS r
         FROM series s CROSS JOIN cuts CROSS JOIN gfit g
         LEFT JOIN fit f ON f.wd = s.x % 7
         WHERE s.x >= cut_cal AND s.x < cut_test),
       ranked AS (SELECT r, row_number() OVER (ORDER BY r, x) AS rk,
           count(*) OVER () AS ncal FROM calib),
       qh AS (SELECT r AS qhat FROM ranked
              WHERE rk = ((ncal + 1) * 9 + 9) // 10)
       SELECT CAST(s.x AS BIGINT) AS x, CAST(s.y AS BIGINT) AS y,
         CAST(coalesce(f.yhat_wd, g.yhat_g) AS BIGINT) AS yhat,
         CAST(q.qhat AS BIGINT) AS qhat,
         CAST(coalesce(f.yhat_wd, g.yhat_g) - q.qhat AS BIGINT) AS lo,
         CAST(coalesce(f.yhat_wd, g.yhat_g) + q.qhat AS BIGINT) AS hi,
         CAST(CASE WHEN s.y >= coalesce(f.yhat_wd, g.yhat_g) - q.qhat
                    AND s.y <= coalesce(f.yhat_wd, g.yhat_g) + q.qhat
              THEN 1 ELSE 0 END AS INT) AS covered
       FROM series s CROSS JOIN cuts CROSS JOIN gfit g CROSS JOIN qh q
       LEFT JOIN fit f ON f.wd = s.x % 7
       WHERE s.x >= cut_test
       ORDER BY x"""

  // ---- daily-count autocorrelation (seasonality detector) ----

  /** Autocorrelation of the daily event count at lags 1..7 — the
    * periodicity detector that turns "is traffic weekly-seasonal?"
    * into one readout (r spikes at the true period). Day-grain pairs
    * come from ONE fan-out equi-join (each day projects its 7 lag
    * targets; the join key is the computed target day — no range
    * predicate, no window), and each lag's Pearson r is assembled
    * from exact integer moments ([[Profile]]'s momentCorr discipline:
    * BIGINT Σx/Σy/Σxy/Σx²/Σy² per lag, the float tree only at the
    * final r). The scan is day-grain, so the whole operator is
    * calendar-sized at any event volume — the events themselves
    * aggregate once. */
  def eventsDailyAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.io.Tables.events(spark, dir)
      .selectExpr("CAST(ts AS DATE) AS day")
      .groupBy("day").agg(count(lit(1)).as("n"))
    val probes = daily.selectExpr("day", "n AS x",
        "explode(sequence(1, 7)) AS lag")
      .selectExpr("lag", "x", "date_add(day, lag) AS tday")
    val pairs = probes.join(
      daily.selectExpr("day AS tday", "n AS y"), Seq("tday"))
    pairs.groupBy("lag").agg(
        count(lit(1)).as("n_pairs"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sx2"),
        sum(expr("y * y")).as("sy2"))
      .selectExpr("CAST(lag AS INT) AS lag", "n_pairs", "sx", "sy", "sxy",
        """(CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
           sqrt((CAST(n_pairs AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx) *
                (CAST(n_pairs AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)) AS r""")
      .orderBy("lag")
  }

  val eventsDailyAutocorrOracle: String =
    """WITH daily AS (
         SELECT CAST(ts AS DATE) AS day, count(*) AS n
         FROM events GROUP BY 1),
       probes AS (
         SELECT l.lag, d.n AS x, d.day + CAST(l.lag AS INTEGER) AS tday
         FROM daily d, (SELECT unnest(range(1, 8)) AS lag) l),
       pairs AS (
         SELECT p.lag, p.x, t.n AS y
         FROM probes p JOIN daily t ON t.day = p.tday),
       m AS (
         SELECT lag, count(*) AS n_pairs,
           sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
           sum(x * x) AS sx2, sum(y * y) AS sy2
         FROM pairs GROUP BY lag)
       SELECT CAST(lag AS INTEGER) AS lag,
         CAST(n_pairs AS BIGINT) AS n_pairs,
         CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
         CAST(sxy AS BIGINT) AS sxy,
         (CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
           sqrt((CAST(n_pairs AS DOUBLE) * sx2 - CAST(sx AS DOUBLE) * sx) *
                (CAST(n_pairs AS DOUBLE) * sy2 - CAST(sy AS DOUBLE) * sy)) AS r
       FROM m ORDER BY lag"""

  val eventsMannWhitneyOracle: String =
    """WITH ev AS (
         SELECT CAST(round(value * 100) AS BIGINT) AS v,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
         FROM events WHERE event_type IN ('purchase', 'error')),
       byv AS (SELECT v, sum(g1) AS cnt1, count(*) AS cnt
               FROM ev GROUP BY v),
       ranked AS (SELECT *,
           coalesce(sum(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnt_less
         FROM byv),
       agg AS (SELECT
           sum(cnt1) AS n1,
           sum(cnt - cnt1) AS n2,
           sum(cnt1 * (2 * cnt_less + cnt + 1)) AS r1_doubled,
           sum(cnt * cnt * cnt - cnt) AS tie_t
         FROM ranked),
       u AS (SELECT *, r1_doubled - n1 * (n1 + 1) AS u1_doubled FROM agg)
       SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         CAST(r1_doubled AS BIGINT) AS r1_doubled,
         CAST(tie_t AS BIGINT) AS tie_t,
         CAST(u1_doubled AS BIGINT) AS u1_doubled,
         CAST(2 * n1 * n2 - u1_doubled AS BIGINT) AS u2_doubled,
         (CAST(u1_doubled AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * n2 / 2) /
           sqrt(CAST(n1 AS DOUBLE) * n2 / 12 *
             (CAST(n1 + n2 + 1 AS DOUBLE)
              - CAST(tie_t AS DOUBLE) /
                (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1)))) AS z
       FROM u"""


  // ---- RFM customer segmentation ----

  /** `rfm_customer_scores`: the CUSTOMER-grain RFM export — one row
    * per ordering customer with the quintile triple and a canonical
    * segment label (this is the CRM-export grain; its sibling
    * [[rfmSegments]] rolls the same scores up to segment grain).
    * Scoring comes from the shared [[rfmScores]] subplan — quintile
    * semantics, tie-breaks, anchoring, and the two-phase scalable
    * rank are documented there. Covers customers WITH orders (an RFM
    * score for a never-ordered customer is undefined on every axis). */
  def customerRfm(spark: SparkSession, dir: String): DataFrame =
    rfmScores(spark, dir)
      .selectExpr("custkey", "recency_days", "n_orders",
        "CAST(monetary_c AS DOUBLE) / 100.0 AS monetary",
        "r_score", "f_score", "m_score",
        """CASE
             WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
             WHEN r_score <= 2 AND m_score <= 2 THEN 'hibernating'
             WHEN r_score >= 4 AND f_score <= 2 THEN 'new_or_returning'
             ELSE 'regular' END AS segment""")
      .orderBy("custkey")

  val customerRfmOracle: String =
    """WITH base AS (SELECT o_custkey,
          max(CAST(o_orderdate AS DATE)) AS last_order,
          count(*) AS n_orders,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS monetary_c
        FROM orders GROUP BY o_custkey),
       anch AS (SELECT max(last_order) AS anchor FROM base),
       rfm AS (SELECT o_custkey AS custkey,
          datediff('day', last_order, anchor) AS recency_days,
          n_orders, monetary_c FROM base, anch),
       scored AS (SELECT *,
          ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS r_score,
          ntile(5) OVER (ORDER BY n_orders, custkey) AS f_score,
          ntile(5) OVER (ORDER BY monetary_c, custkey) AS m_score
        FROM rfm)
       SELECT custkey, CAST(recency_days AS INTEGER) AS recency_days,
         n_orders, CAST(monetary_c AS DOUBLE) / 100.0 AS monetary,
         r_score, f_score, m_score,
         CASE
           WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
             THEN 'champion'
           WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
           WHEN r_score <= 2 AND m_score <= 2 THEN 'hibernating'
           WHEN r_score >= 4 AND f_score <= 2 THEN 'new_or_returning'
           ELSE 'regular' END AS segment
       FROM scored ORDER BY custkey"""

  // ---- Mahalanobis outlier screen ----

  /** Top-20 bivariate Mahalanobis outliers over (quantity, price) —
    * the covariance-aware anomaly screen (a point can be ordinary on
    * each axis yet wildly off the joint distribution; Euclidean
    * z-scores miss exactly those). One pass collects the six exact
    * moments (second moments in DECIMAL(38,0)/HUGEINT — cents squared
    * overflow BIGINT at corpus scale), the 2×2 covariance inverts in
    * closed form, and each row's distance is ONE fixed IEEE tree over
    * exact-integer deviations (dx = x·n − Σx stays BIGINT), nano-
    * quantized before the rank (the n² factors in numerator and
    * determinant cancel, so the ratio IS true d² — a first cut
    * scaled by 1e-9 instead of 1e9 crushed every distance to zero
    * and the "top-20" degenerated to key order). Top-k via
    * TakeOrderedAndProject on (d², orderkey, linenumber, qty, price)
    * — (orderkey, linenumber) alone is NOT unique in this fixture,
    * the salesTransactions lesson. */
  def lineitemMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.io.Tables.lineitem(spark, dir).selectExpr(
      "l_orderkey", "l_linenumber",
      "CAST(round(l_quantity * 100) AS BIGINT) AS x",
      "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
    val dec = "DECIMAL(38,0)"
    val m = q.agg(
      expr("CAST(count(1) AS BIGINT)").as("n"),
      expr("CAST(sum(x) AS BIGINT)").as("sx"),
      expr("CAST(sum(y) AS BIGINT)").as("sy"),
      expr(s"sum(CAST(x AS $dec) * x)").as("sxx"),
      expr(s"sum(CAST(y AS $dec) * y)").as("syy"),
      expr(s"sum(CAST(x AS $dec) * y)").as("sxy"))
      .selectExpr("n", "sx", "sy",
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS cxx",
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy",
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cxy")
    q.join(broadcast(m))
      .selectExpr("l_orderkey", "l_linenumber", "x", "y",
        "CAST(x * n - sx AS DOUBLE) AS dx",
        "CAST(y * n - sy AS DOUBLE) AS dy",
        "cxx", "cyy", "cxy")
      .selectExpr("l_orderkey", "l_linenumber", "x", "y",
        "CAST(round((dx * dx * cyy - 2 * dx * dy * cxy + dy * dy * cxx) " +
          "/ (cxx * cyy - cxy * cxy) * 1e9) AS BIGINT) AS d2_nano")
      .orderBy(desc("d2_nano"), asc("l_orderkey"), asc("l_linenumber"),
        asc("x"), asc("y"))
      .limit(20)
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(x AS DOUBLE) / 100.0 AS quantity",
        "CAST(y AS DOUBLE) / 100.0 AS price", "d2_nano")
  }

  val lineitemMahalanobisOracle: String =
    """WITH q AS (SELECT l_orderkey, l_linenumber,
          CAST(round(l_quantity * 100) AS BIGINT) AS x,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          sum(CAST(x AS HUGEINT) * x) AS sxx,
          sum(CAST(y AS HUGEINT) * y) AS syy,
          sum(CAST(x AS HUGEINT) * y) AS sxy
        FROM q),
       c AS (SELECT n, sx, sy,
          CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS cxx,
          CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy,
          CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cxy
        FROM m),
       scored AS (SELECT q.l_orderkey, q.l_linenumber, q.x, q.y,
          CAST(round((CAST(q.x * c.n - c.sx AS DOUBLE) * CAST(q.x * c.n - c.sx AS DOUBLE) * c.cyy
            - 2 * CAST(q.x * c.n - c.sx AS DOUBLE) * CAST(q.y * c.n - c.sy AS DOUBLE) * c.cxy
            + CAST(q.y * c.n - c.sy AS DOUBLE) * CAST(q.y * c.n - c.sy AS DOUBLE) * c.cxx)
            / (c.cxx * c.cyy - c.cxy * c.cxy) * 1e9) AS BIGINT) AS d2_nano
        FROM q, c)
       SELECT l_orderkey, l_linenumber,
         CAST(x AS DOUBLE) / 100.0 AS quantity,
         CAST(y AS DOUBLE) / 100.0 AS price, d2_nano
       FROM scored
       ORDER BY d2_nano DESC, l_orderkey, l_linenumber, x, y LIMIT 20"""

  // ---- winsorized robust statistics ----

  /** Winsorized mean/sd of extended price (clamp at the exact p1/p99
    * order statistics, then exact moments of the clamped cents) — the
    * robust-statistics answer to a heavy-tailed money column, where a
    * handful of jumbo orders drag the raw mean. The percentile
    * machinery is the scale-correct one: counts collapse to the VALUE
    * grain, a bucket-grain prefix (the [[graft.llm.Curation]]
    * chopBoundaries two-phase scan: per-bucket totals, bucket-grain
    * cumulative, broadcast offsets, within-bucket window) yields
    * exact cumulative ranks with NO single-partition global window,
    * and the thresholds are the smallest values whose cumulative
    * count reaches ⌈0.01·n⌉ / ⌈0.99·n⌉ — exact integer arithmetic
    * end to end. Clamped second moments ride DECIMAL(38,0)/HUGEINT;
    * readouts quantize once. */
  def lineitemWinsorized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "DECIMAL(38,0)"
    // r13: everything after the first value-grain rollup runs at VALUE
    // grain — the fact table used to be scanned three times (the
    // rollup, a separate count(*), and the final winsorize pass).
    // n rides the bucket-total window (sum of exact bucket counts),
    // and the final moments weight each distinct value by its count:
    // identical exact-integer sums, one fact scan.
    val q = graft.io.Tables.lineitem(spark, dir)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS v")
    val vals = q.groupBy("v").agg(count(lit(1)).as("c"))
      .withColumn("bucket", expr("v DIV 100000"))
      .transform(graft.ops.Checkpoints.cut)
    val bucketTot = vals.groupBy("bucket").agg(sum("c").as("bc"))
      .withColumn("off", coalesce(sum("bc").over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", sum("bc").over(
        Window.orderBy("bucket").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("bucket", "off", "n")
    val cum = vals.join(broadcast(bucketTot), Seq("bucket"))
      .withColumn("cum", col("off") + sum("c").over(
        Window.partitionBy("bucket").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val thresholds = cum
      .agg(
        min(expr("CASE WHEN cum >= (n + 99) DIV 100 THEN v END")).as("lo"),
        min(expr("CASE WHEN cum >= (99 * n + 99) DIV 100 THEN v END")).as("hi"))
    vals.join(broadcast(thresholds))
      .selectExpr("v", "c", "least(greatest(v, lo), hi) AS w", "lo", "hi")
      .groupBy("lo", "hi")
      .agg(sum("c").as("n"),
        sum(expr("v * c")).as("sv"), sum(expr("w * c")).as("sw"),
        expr(s"sum(CAST(w AS $dec) * w * c)").as("ssw"))
      .selectExpr("n",
        "CAST(lo AS DOUBLE) / 100.0 AS p1",
        "CAST(hi AS DOUBLE) / 100.0 AS p99",
        "CAST(round(CAST(sv AS DOUBLE) / n * 10) AS BIGINT) AS mean_raw_dmilli",
        "CAST(round(CAST(sw AS DOUBLE) / n * 10) AS BIGINT) AS mean_wins_dmilli",
        "CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(ssw AS DOUBLE) " +
          "- CAST(sw AS DOUBLE) * sw) / (CAST(n AS DOUBLE) * n)) * 10) " +
          "AS BIGINT) AS sd_wins_dmilli")
  }

  val lineitemWinsorizedOracle: String =
    """WITH q AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
          FROM lineitem),
       vals AS (SELECT v, count(*) AS c FROM q GROUP BY v),
       cum_t AS (SELECT v, c,
          sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
         FROM vals),
       nn AS (SELECT count(*) AS n FROM q),
       th AS (SELECT
          min(CASE WHEN cum >= (n + 99) // 100 THEN v END) AS lo,
          min(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS hi
         FROM cum_t, nn),
       cl AS (SELECT q.v, least(greatest(q.v, th.lo), th.hi) AS w,
           th.lo, th.hi
         FROM q, th),
       m AS (SELECT lo, hi, count(*) AS n,
           CAST(sum(v) AS BIGINT) AS sv, CAST(sum(w) AS BIGINT) AS sw,
           sum(CAST(w AS HUGEINT) * w) AS ssw
         FROM cl GROUP BY lo, hi)
       SELECT n,
         CAST(lo AS DOUBLE) / 100.0 AS p1,
         CAST(hi AS DOUBLE) / 100.0 AS p99,
         CAST(round(CAST(sv AS DOUBLE) / n * 10) AS BIGINT) AS mean_raw_dmilli,
         CAST(round(CAST(sw AS DOUBLE) / n * 10) AS BIGINT) AS mean_wins_dmilli,
         CAST(round(sqrt((CAST(n AS DOUBLE) * CAST(ssw AS DOUBLE)
           - CAST(sw AS DOUBLE) * sw) / (CAST(n AS DOUBLE) * n)) * 10)
           AS BIGINT) AS sd_wins_dmilli
       FROM m"""

  // ---- two-sample Kolmogorov–Smirnov (distributed ECDF) ----

  /** Shared double readout for [[docsKsLengths]] — one expression
    * text used verbatim by both engines so the IEEE-754 trees are
    * identical. `d = D_num/(n1·n2)` is the exact KS statistic (the
    * numerator is an exact BIGINT max of cross-multiplied cumulative
    * counts); `p_asym` is the standard two-sided asymptotic tail
    * 2·exp(−2·D²·n1·n2/(n1+n2)). */
  private val ksReadout = Seq(
    "n1", "n2", "d_num",
    "CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS d",
    """2 * exp(-2 * (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))
        * (CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))
        * (CAST(n1 AS DOUBLE) * n2 / (CAST(n1 AS DOUBLE) + n2)))
       AS p_asym""")

  // ---- distribution-free median confidence interval ----

  /** `lineitem_median_ci`: exact median of the line price with a
    * DISTRIBUTION-FREE confidence interval from binomial order
    * statistics (the nonparametric classic: P(X_(l) ≤ m ≤ X_(u))
    * depends only on Binomial(n, ½), never on the price
    * distribution) — the partner of [[ordersBootstrapCi]]: the
    * bootstrap CI is for the MEAN and needs resampling; the median CI
    * is closed-form from three order statistics. Ranks use the normal
    * approximation l = ⌊(n − z·√n)/2⌋, u = n − l + 1 (z = 1.96),
    * computed as identical double text on both engines from the same
    * exact n — no baked tables needed.
    *
    * Shape: the corpus collapses to VALUE grain (distinct cents) in
    * one map-side-combined agg; one cumulative window over the value
    * domain turns rank lookups into three conditional mins — the
    * [[lineitemWinsorized]] two-phase-rank machinery, reused. */
  def lineitemMedianCi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = t(spark, dir, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS v")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = byV.withColumn("cum", sum("cnt").over(wCum))
    val totals = byV.agg(sum("cnt").as("n"))
    cum.crossJoin(broadcast(totals))
      .selectExpr("v", "cum", "n",
        "(n + 1) DIV 2 AS r_med",
        """greatest(CAST(1 AS BIGINT), CAST(floor((CAST(n AS DOUBLE)
            - 1.959963984540054 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT))
           AS r_lo""")
      .selectExpr("v", "cum", "n", "r_med", "r_lo", "n - r_lo + 1 AS r_hi")
      .agg(max("n").as("n"), max("r_lo").as("r_lo"), max("r_hi").as("r_hi"),
        min(expr("CASE WHEN cum >= r_med THEN v END")).as("med_c"),
        min(expr("CASE WHEN cum >= r_lo THEN v END")).as("lo_c"),
        min(expr("CASE WHEN cum >= r_hi THEN v END")).as("hi_c"))
      .selectExpr("CAST(n AS BIGINT) AS n",
        "CAST(r_lo AS BIGINT) AS r_lo", "CAST(r_hi AS BIGINT) AS r_hi",
        "CAST(med_c AS DOUBLE) / 100 AS median_price",
        "CAST(lo_c AS DOUBLE) / 100 AS ci_lo",
        "CAST(hi_c AS DOUBLE) / 100 AS ci_hi")
  }

  val lineitemMedianCiOracle: String =
    """WITH byv AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
            count(*) AS cnt
          FROM lineitem GROUP BY 1),
        cum_t AS (SELECT v, sum(cnt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM byv),
        tot AS (SELECT sum(cnt) AS n FROM byv),
        rk AS (SELECT v, cum, n,
            (n + 1) // 2 AS r_med,
            greatest(CAST(1 AS BIGINT), CAST(floor((CAST(n AS DOUBLE)
              - 1.959963984540054 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT))
              AS r_lo
          FROM cum_t, tot),
        rk2 AS (SELECT *, n - r_lo + 1 AS r_hi FROM rk),
        agg AS (SELECT max(n) AS n, max(r_lo) AS r_lo, max(r_hi) AS r_hi,
            min(CASE WHEN cum >= r_med THEN v END) AS med_c,
            min(CASE WHEN cum >= r_lo THEN v END) AS lo_c,
            min(CASE WHEN cum >= r_hi THEN v END) AS hi_c
          FROM rk2)
        SELECT CAST(n AS BIGINT) AS n,
          CAST(r_lo AS BIGINT) AS r_lo, CAST(r_hi AS BIGINT) AS r_hi,
          CAST(med_c AS DOUBLE) / 100 AS median_price,
          CAST(lo_c AS DOUBLE) / 100 AS ci_lo,
          CAST(hi_c AS DOUBLE) / 100 AS ci_hi
        FROM agg"""

  // ---- CUPED-adjusted A/B comparison ----

  /** Shared readout expressions for [[eventsCupedAb]] (identical text
    * on both engines). Inputs are the exact pooled/per-arm integer
    * moments; everything below is the one sanctioned double tree.
    * θ = cov(X,Y)/var(X) pooled; Yadj = Y − θ·(X − E[X]); the z-stat
    * uses the per-arm adjusted variances (Welch form). Var(Yadj) per
    * arm expands to Var(Y) − 2θ·Cov(X,Y) + θ²·Var(X), all from the
    * same six sums — no second pass. */
  private def cupedReadout: Seq[String] = {
    def m(p: String) = (s"CAST(n_$p AS DOUBLE)", s"CAST(sx_$p AS DOUBLE)",
      s"CAST(sy_$p AS DOUBLE)", s"CAST(sxx_$p AS DOUBLE)",
      s"CAST(syy_$p AS DOUBLE)", s"CAST(sxy_$p AS DOUBLE)")
    val (n, sx, sy, sxx, syy, sxy) = m("all")
    val theta = s"(($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx))"
    val xbar = s"($sx / $n)"
    def arm(p: String): (String, String, String) = {
      val (na, sxa, sya, sxxa, syya, sxya) = m(p)
      val meanAdj = s"($sya / $na - $theta * ($sxa / $na - $xbar))"
      val varY = s"(($na * $syya - $sya * $sya) / ($na * $na))"
      val covA = s"(($na * $sxya - $sxa * $sya) / ($na * $na))"
      val varX = s"(($na * $sxxa - $sxa * $sxa) / ($na * $na))"
      val varAdj =
        s"($varY - 2 * $theta * $covA + $theta * $theta * $varX)"
      (meanAdj, varY, varAdj)
    }
    val (ma, vya, vaa) = arm("a"); val (mb, vyb, vab) = arm("b")
    val (naD, _, syaD, _, _, _) = m("a"); val (nbD, _, sybD, _, _, _) = m("b")
    Seq(
      "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
      s"($syaD / $naD) AS mean_y_a", s"($sybD / $nbD) AS mean_y_b",
      s"$theta AS theta",
      s"($sybD / $nbD - $syaD / $naD) AS diff_raw",
      s"($mb - $ma) AS diff_adj",
      s"(1 - ($vaa * $naD + $vab * $nbD) / ($vya * $naD + $vyb * $nbD)) AS var_reduction",
      s"(($mb - $ma) / sqrt($vaa / $naD + $vab / $nbD)) AS z_adj")
  }

  /** `events_cuped_ab`: A/B comparison of per-user purchase value
    * with CUPED variance reduction (Deng et al. 2013, "Improving the
    * sensitivity of online controlled experiments") — THE production
    * experimentation-platform adjustment: regress the experiment-
    * period metric Y on the PRE-period covariate X (same metric,
    * earlier window), subtract the predictable part, and the arm
    * comparison keeps its mean but sheds the between-user variance X
    * explains.
    *
    * Determinism end-to-end: arms are the md5 parity of the user id
    * (the hash-split discipline — reproducible, partition-independent);
    * the period boundary is the integer midpoint of the observed
    * micros range (one-row broadcast, a pure function of the data);
    * X and Y are exact cents; all six moments per arm + pooled are
    * BIGINT sums (order-independent), and every reported statistic is
    * one shared double tree over those ints ([[cupedReadout]]).
    * Shape: events collapse to user grain in one map-side-combined
    * agg, then ONE single-row moment aggregate — no window, no
    * second scan, CUPED at 100 TB is exactly this plan. */
  def eventsCupedAb(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.Gen.hexPrefix32
    val ev = graft.io.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id",
        "unix_micros(ts) AS tsu",
        "CAST(round(value * 100) AS BIGINT) AS cents")
    val bounds = ev.agg(min("tsu").as("t0"), max("tsu").as("t1"))
      .selectExpr("t0 + (t1 - t0) DIV 2 AS tmid")
    val users = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(expr("CASE WHEN tsu < tmid THEN cents ELSE 0 END")).as("x"),
        sum(expr("CASE WHEN tsu >= tmid THEN cents ELSE 0 END")).as("y"))
      .selectExpr("x", "y",
        s"${hexPrefix32("md5(concat('ab:', CAST(user_id AS STRING)))")} % 2 AS arm")
    val momentCols = Seq("all", "a", "b").flatMap { p =>
      val f = p match {
        case "all" => "1 = 1"
        case "a"   => "arm = 0"
        case _     => "arm = 1"
      }
      Seq(s"CAST(sum(CASE WHEN $f THEN 1 ELSE 0 END) AS BIGINT) AS n_$p",
        s"CAST(sum(CASE WHEN $f THEN x ELSE 0 END) AS BIGINT) AS sx_$p",
        s"CAST(sum(CASE WHEN $f THEN y ELSE 0 END) AS BIGINT) AS sy_$p",
        s"CAST(sum(CASE WHEN $f THEN x * x ELSE 0 END) AS BIGINT) AS sxx_$p",
        s"CAST(sum(CASE WHEN $f THEN y * y ELSE 0 END) AS BIGINT) AS syy_$p",
        s"CAST(sum(CASE WHEN $f THEN x * y ELSE 0 END) AS BIGINT) AS sxy_$p")
    }
    users.selectExpr(momentCols: _*).selectExpr(cupedReadout: _*)
  }

  val eventsCupedAbOracle: String = {
    import graft.llm.Gen.hexPrefix32
    val momentCols = Seq("all", "a", "b").flatMap { p =>
      val f = p match {
        case "all" => "1 = 1"
        case "a"   => "arm = 0"
        case _     => "arm = 1"
      }
      Seq(s"CAST(sum(CASE WHEN $f THEN 1 ELSE 0 END) AS BIGINT) AS n_$p",
        s"CAST(sum(CASE WHEN $f THEN x ELSE 0 END) AS BIGINT) AS sx_$p",
        s"CAST(sum(CASE WHEN $f THEN y ELSE 0 END) AS BIGINT) AS sy_$p",
        s"CAST(sum(CASE WHEN $f THEN x * x ELSE 0 END) AS BIGINT) AS sxx_$p",
        s"CAST(sum(CASE WHEN $f THEN y * y ELSE 0 END) AS BIGINT) AS syy_$p",
        s"CAST(sum(CASE WHEN $f THEN x * y ELSE 0 END) AS BIGINT) AS sxy_$p")
    }.mkString(",\n            ")
    s"""WITH ev AS (SELECT user_id,
            CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS tsu,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        bounds AS (SELECT min(tsu) + (max(tsu) - min(tsu)) // 2
            AS tmid FROM ev),
        users AS (SELECT user_id,
            sum(CASE WHEN tsu < tmid THEN cents ELSE 0 END) AS x,
            sum(CASE WHEN tsu >= tmid THEN cents ELSE 0 END) AS y
          FROM ev, bounds GROUP BY user_id),
        armed AS (SELECT x, y,
            ${hexPrefix32("md5(concat('ab:', CAST(user_id AS VARCHAR)))")} % 2 AS arm
          FROM users),
        m AS (SELECT
            $momentCols
          FROM armed)
        SELECT ${cupedReadout.mkString(",\n          ")} FROM m"""
  }

  // ---- Poisson bootstrap (single-pass distributed resampling) ----

  /** Integer inverse-CDF thresholds for Poisson(1): T_k =
    * ⌊CDF(k)·2³²⌋, so a 32-bit hash draw maps to a resampling weight
    * by pure BIGINT comparison. Computing the CDF here ONCE and
    * baking the nine integers into both engines' SQL as literals is
    * what keeps the bootstrap oracle-exact: the queries never call
    * exp(), so libm never gets a vote. Tail mass beyond k=9 is
    * ~1.1e-7 — those draws take weight 9 (documented truncation). */
  private val poisCumThresholds: Array[Long] = {
    var p = math.exp(-1.0); var cum = p
    (0 to 8).map { k =>
      if (k > 0) { p = p / k; cum += p }
      math.floor(cum * 4294967296.0).toLong
    }.toArray
  }

  private def bootWeight(h: String): String = {
    val cases = poisCumThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }.mkString(" ")
    s"(CASE $cases ELSE ${poisCumThresholds.length} END)"
  }

  private val bootReps = 32

  /** `orders_bootstrap_ci`: bootstrap confidence interval for the
    * mean order value via the POISSON bootstrap (Chamandy et al.,
    * "Estimating uncertainty for massive data streams", the
    * bootstrap that actually runs at 100 TB): instead of drawing B
    * resamples (impossible — a resample IS the dataset), each row
    * independently contributes a Poisson(1) count to every replicate,
    * which converges to multinomial resampling as n grows. One scan,
    * B=32 replicate (Σw·x, Σw) pairs accumulated as 64 aggregate
    * columns — no row explosion, no shuffle beyond the one-row
    * final combine; the replicate spine then unpivots to 32 rows for
    * the order statistics.
    *
    * Determinism: the "random" draw for (order, replicate) is the
    * 32-bit md5 prefix of `orderkey:boot:r` compared against the
    * integer thresholds above — reproducible across engines, re-runs,
    * stragglers, and partitionings, the same discipline as the
    * hash-split samplers. Every accumulated quantity is BIGINT-exact;
    * each replicate mean is ONE double division+round readout
    * (identical text both engines), and the CI bounds are order
    * statistics of those 32 exact milli-cent integers (ranks 2/16/31
    * of the sorted replicate means — a ~93.75% interval).
    *
    * Plan-shape lesson (measured): the first cut accumulated 64
    * aggregate columns over 32 per-row hash projections, counting on
    * codegen subexpression elimination across the CASE fan-out — the
    * giant expression tree fell out of whole-stage codegen and ran
    * 14 s at sf0.1. This form EXPLODES to (row × replicate) grain
    * instead: 32× the scan-side rows, but one md5 per (order,
    * replicate), a single tight codegen'd projection, and a map-side-
    * combined 32-group aggregate — 0.6 s for identical results. At
    * 100 TB the explode factor is the replicate count, amortized by
    * partial aggregation; the shuffle still carries 32 rows per
    * task. */
  def ordersBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.Gen.hexPrefix32
    val base = t(spark, dir, "orders").selectExpr("o_orderkey",
      "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c")
    val repAgg = base
      .select(col("o_orderkey"), col("price_c"),
        explode(expr(s"sequence(0, ${bootReps - 1})")).as("r"))
      .selectExpr("price_c", "r", hexPrefix32(
        "md5(concat(CAST(o_orderkey AS STRING), ':boot:', CAST(r AS STRING)))") +
        " AS h")
      .selectExpr("price_c", "r", s"${bootWeight("h")} AS w")
      .groupBy("r").agg(
        sum(expr("w * price_c")).cast("long").as("ws"),
        sum("w").cast("long").as("w"))
    val totals = base.agg(count(lit(1)).cast("long").as("n_orders"),
      sum("price_c").cast("long").as("total_c"))
    val reps = repAgg.crossJoin(broadcast(totals))
      .selectExpr("n_orders", "total_c", "CAST(r AS INT) AS r",
        "CAST(round(CAST(ws AS DOUBLE) * 1000 / w) AS BIGINT) AS mean_milli")
    import org.apache.spark.sql.expressions.Window
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy("mean_milli", "r")))
    ranked.agg(
      max("n_orders").as("n_orders"),
      max(expr(s"CAST($bootReps AS BIGINT)")).as("n_reps"),
      max(expr("CAST(round(CAST(total_c AS DOUBLE) * 1000 / n_orders) AS BIGINT)"))
        .as("mean_milli_full"),
      max(expr("CASE WHEN rn = 2 THEN mean_milli END")).as("boot_lo_milli"),
      max(expr("CASE WHEN rn = 16 THEN mean_milli END")).as("boot_med_milli"),
      max(expr("CASE WHEN rn = 31 THEN mean_milli END")).as("boot_hi_milli"))
  }

  val ordersBootstrapCiOracle: String = {
    import graft.llm.Gen.hexPrefix32
    val hCols = (0 until bootReps).map(r => hexPrefix32(
      s"md5(concat(CAST(o_orderkey AS VARCHAR), ':boot:$r'))") +
      s" AS h_$r").mkString(",\n            ")
    val wCols = (0 until bootReps)
      .map(r => s"${bootWeight(s"h_$r")} AS w_$r").mkString(",\n            ")
    val aggCols = (0 until bootReps).flatMap(r => Seq(
      s"CAST(sum(w_$r * price_c) AS BIGINT) AS ws_$r",
      s"CAST(sum(w_$r) AS BIGINT) AS w_$r")).mkString(",\n            ")
    val spine = (0 until bootReps)
      .map(r => s"SELECT $r AS r, ws_$r AS ws, w_$r AS w FROM agg")
      .mkString("\n          UNION ALL ")
    s"""WITH base AS (SELECT o_orderkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
          FROM orders),
        h_t AS (SELECT price_c,
            $hCols
          FROM base),
        w_t AS (SELECT price_c,
            $wCols
          FROM h_t),
        agg AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
            CAST(sum(price_c) AS BIGINT) AS total_c,
            $aggCols
          FROM w_t),
        reps AS ($spine),
        mm AS (SELECT r,
            CAST(round(CAST(ws AS DOUBLE) * 1000 / w) AS BIGINT) AS mean_milli
          FROM reps),
        ranked AS (SELECT r, mean_milli,
            row_number() OVER (ORDER BY mean_milli, r) AS rn
          FROM mm)
        SELECT max(a.n_orders) AS n_orders,
          CAST($bootReps AS BIGINT) AS n_reps,
          max(CAST(round(CAST(a.total_c AS DOUBLE) * 1000 / a.n_orders)
            AS BIGINT)) AS mean_milli_full,
          max(CASE WHEN k.rn = 2 THEN k.mean_milli END) AS boot_lo_milli,
          max(CASE WHEN k.rn = 16 THEN k.mean_milli END) AS boot_med_milli,
          max(CASE WHEN k.rn = 31 THEN k.mean_milli END) AS boot_hi_milli
        FROM ranked k, agg a"""
  }

  /** `docs_ks_lengths`: two-sample Kolmogorov–Smirnov test comparing
    * the document-length distribution of English docs against the
    * rest of the corpus — the distribution-shape sibling of the
    * rank-based [[eventsMannWhitney]]: MW asks "is one group
    * stochastically larger", KS asks "do the two ECDFs diverge
    * anywhere", which is the drift check a corpus monitor wants when
    * a new source ships truncated or concatenated documents.
    *
    * Distributed-ECDF shape (same class as Mann-Whitney): collapse
    * the corpus to VALUE grain with one map-side-combined hash
    * aggregate (per length: group-1 count, total count), then a
    * cumulative window over the value grain gives both ECDFs at every
    * observed value — KS only needs the sup at observed points. The
    * statistic stays exact: sup|F1−F2| = max|cum1·n2 − cum2·n1| /
    * (n1·n2), computed as a BIGINT max so partitioning can never
    * perturb it; doubles appear only in the final readout. The one
    * global window sorts the VALUE DOMAIN (distinct lengths), never
    * the corpus — at 100 TB the distinct-length relation is still
    * tiny; a genuinely wide value domain upgrades to the two-phase
    * prefix scan [[lineitemWinsorized]] documents. Totals ride a
    * one-row broadcast cross join (the scalar-totals pattern). */
  def docsKsLengths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = graft.io.Tables.documents(spark, dir)
      .selectExpr("n_chars AS v",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g1")
      .groupBy("v").agg(sum("g1").as("cnt1"), count(lit(1)).as("cnt"))
    val totals = byV.agg(sum("cnt1").as("n1"),
      sum(expr("cnt - cnt1")).as("n2"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    byV
      .withColumn("cum1", sum("cnt1").over(wCum))
      .withColumn("cum", sum("cnt").over(wCum))
      .crossJoin(broadcast(totals))
      .agg(max(expr("abs(cum1 * n2 - (cum - cum1) * n1)")).as("d_num"),
        max("n1").as("n1"), max("n2").as("n2"))
      .selectExpr(ksReadout: _*)
  }

  val docsKsLengthsOracle: String =
    s"""WITH byv AS (
          SELECT n_chars AS v,
            sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt1,
            count(*) AS cnt
          FROM documents GROUP BY n_chars),
        totals AS (SELECT sum(cnt1) AS n1, sum(cnt - cnt1) AS n2 FROM byv),
        cum_t AS (SELECT v, cnt1, cnt,
            sum(cnt1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
            sum(cnt) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM byv),
        agg AS (SELECT
            CAST(max(abs(cum1 * n2 - (cum - cum1) * n1)) AS BIGINT) AS d_num,
            CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
          FROM cum_t, totals)
        SELECT ${ksReadout.mkString(",\n          ")} FROM agg"""
}
