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
    "events_last_click_asof", "corpus_source_quota", "corpus_curated")

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
}
