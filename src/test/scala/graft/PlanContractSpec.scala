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
    "events_salted_join", "dedup_incremental")

  test("no cartesian or nested-loop join in any equi-join query plan") {
    equiJoinOnly.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has BroadcastNestedLoopJoin")
    }
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
