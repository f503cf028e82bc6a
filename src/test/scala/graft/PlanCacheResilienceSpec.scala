package graft

/** PlanCache under pressure (VERDICT r7 #8): correctness must never
  * depend on a cache hit. Two failure modes a long-lived report session
  * actually meets: (a) executor memory pressure evicts persisted blocks
  * BETWEEN two consumers of a shared prefix — the next consumer must
  * recompute from lineage, bit-identically; (b) the parquet staging dir
  * for side-tables is full/unwritable — the session must degrade to the
  * persist path, never read partial files and never fail the query.
  */
class PlanCacheResilienceSpec extends SparkSpec {

  private def withPrefixCache[A](extra: (String, String)*)(body: => A): A = {
    spark.conf.set("spark.graft.cachePrefixes", "true")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally {
      PlanCache.clear()
      spark.conf.unset("spark.graft.cachePrefixes")
      extra.foreach { case (k, _) => spark.conf.unset(k) }
    }
  }

  test("evicting every persisted block between two consumers changes nothing") {
    val cold = graft.llm.Similarity.cosineTopK(spark, sfTiny).collect().toSeq
    withPrefixCache() {
      val first = graft.llm.Similarity.cosineTopK(spark, sfTiny).collect().toSeq
      assert(first === cold)
      // Memory-pressure analogue: drop ALL persisted blocks mid-session.
      // The PlanCache entry still holds the persisted plan; its
      // InMemoryRelation recomputes missing partitions from lineage.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val second = graft.llm.Similarity.cosineTopK(spark, sfTiny).collect().toSeq
      assert(second === cold)
    }
  }

  test("an unwritable side-table dir degrades to the persist path, results identical") {
    val cold = graft.llm.PrefixJoin.prefixFilterPairs(spark, sfTiny).collect().toSeq
    withPrefixCache(
      "spark.graft.featureTableDir" -> "/proc/graft_cannot_write_here") {
      val staged = graft.llm.PrefixJoin.prefixFilterPairs(spark, sfTiny)
        .collect().toSeq
      assert(staged === cold)
      // And a second consumer reuses the fallback without re-failing.
      val again = graft.llm.PrefixJoin.prefixFilterPairs(spark, sfTiny)
        .collect().toSeq
      assert(again === cold)
    }
  }
}
