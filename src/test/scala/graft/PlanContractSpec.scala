package graft

/** Plan contracts: regressions that would silently wreck scale-out get
  * caught here, not in a 100 TB run. Asserts on the physical plans of
  * representative queries: no cartesian/nested-loop joins outside the
  * two intentionally non-equi ANN plans, predicates pushed into the
  * parquet scans, and pruned read schemas. */
class PlanContractSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfTiny)
      .queryExecution.executedPlan.toString

  private val equiJoinOnly = Seq(
    "sales_transactions", "inventory_reconciliation",
    "customer_feedback_enriched", "curated_revenue_by_category",
    "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_ngram_jaccard",
    "dedup_embedding", "ann_lsh_topk", "events_purchase_attribution",
    "events_last_click_asof", "corpus_source_quota", "corpus_curated",
    "events_salted_join", "dedup_incremental", "text_oov_rate",
    "corpus_epoch_plan", "dedup_canonical_quality",
    "corpus_embedding_coverage", "orders_retention_cohorts",
    "events_hourly_anomaly", "revenue_by_nation",
    "curated_incremental_refresh", "text_tfidf_pairs", "orders_cdc_apply",
    "classic_shipping_priority", "classic_bilateral_trade",
    "classic_market_share", "classic_returned_revenue",
    "classic_order_distribution", "classic_promo_share",
    "classic_small_order_revenue", "classic_large_orders",
    "classic_disjunctive_bands", "lineitem_pit_priority",
    "nation_revenue_lorenz", "docs_source_diversity",
    "events_cms_heavy_hitters", "text_bigram_lm", "doc_cdc_chunks",
    "doc_cdc_shared", "corpus_weighted_sample",
    "dedup_prefix_filter_pairs", "dedup_prefix_filter_topk",
    "text_tfidf_topk", "curated_revenue_by_category_approx_audit",
    "category_quantity_quartiles_approx_audit",
    "dedup_duplicate_spans", "doc_dup_span_coverage",
    "doc_dup_span_intervals", "dedup_incremental_spans",
    "lineitem_promo_uplift",
    // continuation-session operators whose plans must stay pure
    // equi-join (the ones with intentional 1-row-broadcast cross
    // joins — int8 codebook, DSIR totals, PMI totals, Apriori
    // support threshold, query-side ANN — are excluded by design)
    "nation_bfs_hops", "events_mann_whitney", "corpus_shard_plan",
    "multimodal_hist_similarity", "events_daily_autocorr",
    "text_char_diversity", "dedup_clustering_coeff",
    // round-8 battery completion (Q11's mean-threshold one-row
    // broadcast is excluded like the other scalar-total patterns)
    "classic_min_cost_supplier", "classic_late_order_priority",
    "classic_product_profit", "classic_ship_lag_priority",
    "classic_supplier_part_counts", "classic_dominant_supplier",
    "classic_waiting_supplier",
    // session-3 operators with pure equi-join plans (the scalar
    // one-row-broadcast patterns — waterfill level, DiD cut, prior
    // row, decile totals, Kendall cell grid — are excluded by design
    // like the other scalar-total patterns; the edit join and
    // Mann-Kendall carry intentional BOUNDED non-equi joins asserted
    // in their own tests below)
    "source_simpson_diversity", "dsv2_runtime_pruned_join",
    "text_tokenizer_fertility", "dsv2_sink_roundtrip")

  test("saturated edit join: broadcast band join, no hash shuffle") {
    // the fixture corpus is gram-saturated, so the dispatch must pick
    // the length-band broadcast path: texts ride inline through ONE
    // BroadcastHashJoin and the counting filter + banded verify fuse
    // into the probe stage — a hash-partitioned shuffle anywhere
    // before the final (tiny) ordered output means the gram join
    // came back
    val p = plan("dedup_edit_join_pairs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      s"saturated path must not shuffle:\n$p")
    assert(p.contains("graft_hist_l1") || p.contains("histl1") ||
      p.contains("HistL1"), "counting filter missing from the plan")
  }

  test("masked containment verifies at distinct-set grain") {
    // vocab fits 64 bits on the fixture → the bitmask path: set-pair
    // candidacy is a broadcast nested-loop over the DISTINCT-MASK
    // relation (intentional — thousands of rows by saturation), the
    // verify is popcount arithmetic, and both top-k cuts are
    // TakeOrdered, never a global sort of the quadratic answer
    val p = plan("dedup_containment_banded")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("bit_count"), s"popcount verify missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("edit join's long-document population never goes cartesian") {
    // the candidate generator must stay a (gram, band) equi-join; the
    // only permitted non-equi join is the BOUNDED short-document
    // fallback (both sides < q·(d+1) chars by construction), which
    // plans as a broadcast nested-loop, never a cartesian product
    val p = plan("dedup_edit_join_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), "no equi-join found for the gram buckets")
  }

  test("trend tests never go cartesian above the day-grain checkpoint") {
    // the series is checkpointed at the day grain (Checkpoints.cut
    // truncates the visible lineage, so the grain itself is pinned by
    // the revenueSeries construction, not re-derivable from the plan);
    // what the plan CAN still promise is that the pair fan-outs above
    // it — Mann-Kendall's day-pair join especially — stay broadcast
    // nested-loop over the calendar-sized relation, never a cartesian
    Seq("daily_revenue_mann_kendall", "daily_revenue_runs_test",
      "daily_revenue_conformal", "daily_revenue_pinball_quantile").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q went cartesian:\n$p")
    }
  }

  test("no cartesian or nested-loop join in any equi-join query plan") {
    equiJoinOnly.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has BroadcastNestedLoopJoin")
    }
  }

  test("approx profile plan avoids the Expand the exact profile pays") {
    // Exact multi-count(DISTINCT) in ONE aggregate plans as an Expand
    // that duplicates the scan stream per distinct column (x12 rows,
    // full width). The HLL profile was always one plain partial agg;
    // since the r13 optimization round the EXACT profile also avoids
    // Expand by decomposing into one non-distinct pass plus one
    // single-distinct branch per column (each column-pruned at the
    // scan) — both plans are now Expand-free, and that IS the
    // contract.
    val approx = graft.ops.Profile.tableProfileApprox(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(!approx.contains("Expand"), "approx profile should not Expand")
    assert(!plan("table_profile").contains("Expand"),
      "exact profile should decompose distinct counts, not Expand")
    // And the audited form stays within its published 4-sigma band at
    // fixture scale (flags all 1).
    val audit = graft.ops.Profile.tableProfileApproxAudit(spark, sfTiny)
    assert(audit.filter(
      "distinct_within_bound = 0 OR exact_columns_match = 0").count() === 0)
  }

  test("min/max/count aggregates push into the parquet footer under DSv2") {
    // The 100 TB freebie: MIN/MAX/COUNT over parquet can be answered
    // from row-group statistics without touching a data page. Spark
    // gates this behind the v2 reader + an explicit conf; this contract
    // pins that the engine's scans stay eligible (no hidden projection
    // or filter that would force a full read) — a regression here turns
    // metadata-time audits into full-corpus scans. Integer keys only:
    // ONE non-pushable aggregate (e.g. min over the NTZ timestamp
    // column) disables pushdown for the whole scan, which is itself
    // worth knowing when writing a 100 TB audit.
    val confs = Seq(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = spark.read.parquet(s"$sfTiny/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.min("l_orderkey"),
          org.apache.spark.sql.functions.max("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate not pushed into the scan:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("filters are pushed into the lineitem scan and schema is pruned") {
    val p = plan("sales_transactions")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull"))
    // quantity guard reaches the scan as a pushed range predicate
    assert(p.contains("GreaterThan(l_quantity,0.0)"))
    // projection pruning: lineitem has 16 columns; the read schema must
    // not include ones the pipeline never touches
    assert(!p.contains("l_comment"))
  }

  test("dimension joins broadcast the small side") {
    val p = plan("rating_icon_join")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("pagerank iterations stay join-shaped: no cartesian products") {
    // the only nested-loop joins allowed are the degenerate one-row
    // broadcasts (dangling mass, node count) — same as the scalar
    // basket count in parts_association_rules
    val p = plan("nation_pagerank")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("the deep join chain broadcasts every dimension") {
    // TPC-H-Q5 shape: lineitem⋈orders must be the only shuffle join;
    // customer/nation/region ride in as broadcasts. A SortMergeJoin
    // against nation at 100 TB would shuffle the whole fact lineage
    // for a 25-row dim.
    val p = plan("revenue_by_nation")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$p")
  }

  test("classic top-k queries use TakeOrderedAndProject, never a global sort") {
    Seq("classic_shipping_priority", "classic_returned_revenue").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q:\n$p")
    }
  }

  test("classic Q6 pushes its redundant raw-range guards into the scan") {
    // plan.toString truncates the PushedFilters list; the formatted
    // explain prints it in full
    val p = SparkEntry.queries("classic_forecast_revenue")(spark, sfTiny)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_discount,0.0499)"), p)
    assert(p.contains("LessThan(l_quantity,24.01)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
  }

  test("classic disjunctive-band join broadcasts the part dim") {
    val p = plan("classic_disjunctive_bands")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // the runtime-filter contract: when a shuffle join's build side is
    // selectively filtered, Spark should inject a bloom filter on the
    // probe side so the fact scan drops non-joining rows BEFORE the
    // shuffle — at 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the matching slice. Thresholds
    // are floored because the fixture is tiny; the production confs
    // keep their defaults.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // raw scans: the rule pattern-matches filter/project over a scan
      // on the creation side, so the fixture-spread Repartition would
      // hide the join shape it exists to optimize
      val fact = spark.read.parquet(s"$sfTiny/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val dim = spark.read.parquet(s"$sfTiny/orders.parquet")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_orderkey")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("prefix-filter verify joins fall back to shuffle joins under a low broadcast threshold") {
    // the 100 TB contract for the exact similarity join: the verify
    // step's doc→token-array relation must NOT be pinned to a
    // broadcast (an unconditional hint would OOM the driver at corpus
    // scale — Spark's broadcast hard limit is 8 GB); with no hint the
    // static plan is a doc_id shuffle join and AQE upgrades it to a
    // runtime broadcast only when the observed size fits. Forcing both
    // thresholds to -1 models the too-big-to-broadcast corpus: the
    // plan must contain no BroadcastHashJoin and still produce the
    // identical pair set.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val baseline = graft.llm.PrefixJoin.prefixFilterPairs(spark, sfTiny).count()
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.llm.PrefixJoin.prefixFilterPairs(spark, sfTiny)
      assert(df.count() == baseline, "fallback plan changed the result")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"corpus-sized relation still broadcast under forced-low threshold:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("range join stays an equi-join even when nothing can broadcast") {
    // the point of the bin-bucketing rewrite: with broadcast disabled
    // (modeling an interval side too big to broadcast) the plan must
    // be a shuffle hash/merge join on the bin key — a naive non-equi
    // formulation would degrade to BroadcastNestedLoopJoin or a
    // cartesian product, the O(facts × intervals) scale-killer
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val baseline = graft.ops.RangeJoin.promoUplift(spark, sfTiny).collect()
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.ops.RangeJoin.promoUplift(spark, sfTiny)
      assert(df.collect().sameElements(baseline), "fallback plan changed the result")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p)
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("join strategy hints are honored") {
    // the escape hatch when the optimizer's choice is wrong at scale:
    // a SHUFFLE_HASH hint must beat the SMJ default (no sort, build a
    // hash map per partition) and a MERGE hint must force SMJ back
    val a = graft.io.Tables.events(spark, sfTiny).select("user_id", "value")
    val b = graft.io.Tables.events(spark, sfTiny).groupBy("user_id").count()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hashed = a.hint("shuffle_hash").join(b, "user_id")
        .queryExecution.executedPlan.toString
      assert(hashed.contains("ShuffledHashJoin"), s"hint ignored:\n$hashed")
      val merged = a.hint("merge").join(b, "user_id")
        .queryExecution.executedPlan.toString
      assert(merged.contains("SortMergeJoin"), s"hint ignored:\n$merged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("AQE splits a skewed shuffle join at runtime") {
    // the runtime skew lever: one key holding 99% of the left side
    // must be detected AFTER the shuffle materializes and split into
    // multiple tasks — the difference between one straggler task and
    // a balanced stage at 100 TB. Thresholds floored for the tiny
    // fixture; production keeps defaults.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 100 < 99 THEN CAST(0 AS BIGINT) ELSE id END AS k",
        "id AS v")
      val right = spark.range(0, 1000).selectExpr("id AS k", "id AS w")
      val j = left.join(right, "k")
      j.collect(): Unit // execute so AQE finalizes the plan
      val p = j.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("skew"),
        s"AQE did not mark the skewed join:\n$p")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("no data-grain global-sort window in the rank/ntile/cumsum rewrites") {
    // The five dimension-grain queries that used to run
    // `ntile/sum OVER (ORDER BY ...)` with no partition key — one
    // WindowExec task sorting the whole dimension — now ride the
    // two-phase Scale.orderedPrefixSum. Contract: every WindowExec
    // with an EMPTY partitionSpec either (a) orders only by __pb*
    // bucket columns (the tiny bucket-grain offset pass — bounded by
    // the value domain / bucket width, never by row count), or
    // (b) has an empty orderSpec too (a grand total over an already-
    // rolled-up grain, e.g. the 10-row decile relation — a global
    // ORDER there is what moves unbounded data to one task, a
    // frame-less total over a group-key-bounded rollup is not).
    // Residual honesty gap: (b) cannot see the input's grain, so a
    // frameless global total over a RAW relation would pass — none of
    // these five plans has one, and the ORDER-carrying class is the
    // one that bit at sf0.1 already.
    import org.apache.spark.sql.execution.window.WindowExec
    Seq("rfm_customer_scores", "rfm_segment_rollup",
      "events_user_deciles", "parts_abc_analysis", "parts_abc_xyz",
      "events_funnel_latency", "text_zipf_slope")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sfTiny)
          .queryExecution.sparkPlan
        val offenders = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty &&
            w.orderSpec.nonEmpty &&
            !w.orderSpec.forall(_.child.references.forall(
              _.name.startsWith("__pb"))) => w
        }
        assert(offenders.isEmpty,
          s"$q has a data-grain global-sort WindowExec:\n" +
            offenders.mkString("\n"))
      }
  }

  test("no Sort in any pipeline run() write-path plan") {
    // run() outputs are what EndToEnd hands to Writers.processed /
    // Writers.curated; a global orderBy there is a wasted
    // total-ordering range shuffle at fact grain (the writer inserts
    // its own REBALANCE exchange, and curated aggs re-shuffle on the
    // group key anyway). Determinism sorts belong in the
    // SparkEntry.queries wrappers only. Matches reference 01-05,
    // which never sort before write.
    import org.apache.spark.sql.execution.SortExec
    import graft.etl.Entities
    import graft.pipelines._
    val d = sfTiny
    val producers = Map(
      "SalesRevenue.run" -> SalesRevenue.run(
        Entities.orders(spark, d), Entities.orderItems(spark, d),
        Entities.products(spark, d)),
      "DeliveryPerformance.run" ->
        DeliveryPerformance.run(Entities.orders(spark, d)),
      "MarketingRoi.run" -> MarketingRoi.run(Entities.marketing(spark, d)),
      "InventoryReconciliation.run" -> InventoryReconciliation.run(
        Entities.inventoryOld(spark, d), Entities.inventoryNew(spark, d),
        Entities.products(spark, d)),
      "CustomerFeedback.enrich" -> CustomerFeedback.enrich(
        Entities.feedback(spark, d), Entities.customers(spark, d),
        Entities.orders(spark, d), CustomerFeedback.ratingIcons(spark)))
    producers.foreach { case (name, df) =>
      // global sorts only: the dedup windows legitimately sort WITHIN
      // their hash-partitioned (key) groups, so assert on SortExec
      // nodes marked global (the range-shuffle-backed kind orderBy
      // plants), not on every per-partition sort
      val offenders = df.queryExecution.sparkPlan.collect {
        case s: SortExec if s.global => s
      }
      assert(offenders.isEmpty,
        s"$name plants a global Sort in the write path:\n" +
          offenders.mkString("\n"))
    }
  }

  test("co-bucketed tables join with no Exchange on either side") {
    // the write-side co-location contract: two tables bucketed+sorted
    // the same way must sort-merge-join straight off the scans — an
    // Exchange here would mean bucketing silently stopped eliminating
    // the shuffle (the 100 TB win the API exists for)
    val ev = graft.io.Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "value")
    val us = graft.io.Tables.events(spark, sfTiny)
      .groupBy("user_id").count()
    graft.ops.Scale.bucketedTable(ev, "pcs_ev_bkt", 4, "user_id")
    graft.ops.Scale.bucketedTable(us, "pcs_user_bkt", 4, "user_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("pcs_ev_bkt")
        .join(spark.table("pcs_user_bkt"), Seq("user_id"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"unexpected exchange in:\n$p")
      assert(p.contains("SortMergeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
