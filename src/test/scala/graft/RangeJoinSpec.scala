package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bin-bucketed range join: the equi-join rewrite must be EXACTLY the
  * non-equi join it replaces — same pair set, same multiplicity (each
  * qualifying pair once), on every bin alignment including negative
  * coordinates where truncating division would mis-bin. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(facts: Seq[(Long, Long)], ivals: Seq[(Long, Long, Long)]) =
    for {
      (fid, p) <- facts
      (iid, s, e) <- ivals
      if p >= s && p <= e
    } yield (fid, iid)

  private def viaBinned(facts: Seq[(Long, Long)], ivals: Seq[(Long, Long, Long)],
                        w: Int): Seq[(Long, Long)] = {
    val f = facts.toDF("fact_id", "pt")
    val i = ivals.toDF("ival_id", "lo", "hi")
    RangeJoin.binned(f, "pt", i, "lo", "hi", w)
      .select("fact_id", "ival_id").as[(Long, Long)].collect().toSeq
  }

  test("binned == brute-force non-equi join, pairs exactly once") {
    val facts = (0L until 200L).map(i => (i, i * 7 % 97 - 20))
    val ivals = (0L until 40L).map(i => (i, i * 11 % 83 - 30, i * 11 % 83 - 30 + i % 9))
    for (w <- Seq(1, 3, 9, 64)) {
      val got = viaBinned(facts, ivals, w).sorted
      val want = brute(facts, ivals).sorted
      assert(got == want, s"binWidth=$w diverged")
      assert(got.distinct.size == got.size, s"binWidth=$w duplicated a pair")
    }
  }

  test("negative coordinates bin by floor division, not truncation") {
    // point -1 with binWidth 7: floor(-1/7) = -1, but -1 DIV 7 = 0 —
    // truncation would put the point and the interval [-5,-1] in
    // different bins and silently drop the match
    val got = viaBinned(Seq((1L, -1L)), Seq((1L, -5L, -1L)), 7)
    assert(got == Seq((1L, 1L)))
  }

  test("promo uplift attributes every in-window item and only those") {
    val out = SparkEntry.queries("lineitem_promo_uplift")(spark, sfTiny).collect()
    assert(out.nonEmpty && out.length <= 12)
    // reconciliation against the naive non-equi plan on the same fixture
    val naive = {
      import graft.io.Tables
      val days = Tables.orders(spark, sfTiny)
        .selectExpr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS de")
        .groupBy("de").agg(count(lit(1)).as("n_orders"))
        .orderBy(desc("n_orders"), asc("de")).limit(12)
        .selectExpr("de - 3 AS start_e", "de + 3 AS end_e")
      Tables.lineitem(spark, sfTiny)
        .selectExpr("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS se")
        .join(days, expr("se BETWEEN start_e AND end_e"))
        .count()
    }
    assert(out.map(_.getAs[Long]("n_items")).sum == naive)
  }
}
