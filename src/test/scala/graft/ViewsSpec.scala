package graft

import graft.io.Views

/** The shared-temp-view invariant Verify's concurrency rests on, now
  * machine-enforced: a view name registered twice with the same
  * definition (even a structurally-identical rebuilt plan) is fine; a
  * DIFFERENT definition under the same (dir, name) throws instead of
  * silently swapping the relation under a concurrent query.
  */
class ViewsSpec extends SparkSpec {

  test("identical re-registration (rebuilt plan) is accepted") {
    val d = graft.io.Tables.lineitem(spark, sfTiny).select("l_orderkey")
    Views.register(sfTiny, "vs_ok", d)
    // a fresh, structurally identical plan: new expr ids, same canonical form
    Views.register(sfTiny, "vs_ok",
      graft.io.Tables.lineitem(spark, sfTiny).select("l_orderkey"))
    assert(spark.table("vs_ok").columns.sameElements(Array("l_orderkey")))
  }

  test("divergent re-registration throws instead of contaminating") {
    Views.register(sfTiny, "vs_clash",
      graft.io.Tables.orders(spark, sfTiny).select("o_orderkey"))
    val e = intercept[IllegalStateException] {
      Views.register(sfTiny, "vs_clash",
        graft.io.Tables.orders(spark, sfTiny).select("o_custkey"))
    }
    assert(e.getMessage.contains("vs_clash"))
    // the original relation is untouched
    assert(spark.table("vs_clash").columns.sameElements(Array("o_orderkey")))
  }

  test("same name under a different fixture dir is a separate scope") {
    Views.register(sfTiny, "vs_scope",
      graft.io.Tables.nation(spark, sfTiny).select("n_nationkey"))
    Views.register("/root/testdata/sf0.01", "vs_scope",
      graft.io.Tables.nation(spark, "/root/testdata/sf0.01").select("n_name"))
    assert(spark.table("vs_scope").columns.sameElements(Array("n_name")))
  }
}
