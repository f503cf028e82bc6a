package graft

/** Max-min-fairness invariants of the water-filling allocator that
  * value-equality against the oracle cannot state by itself. */
class WaterfillSpec extends SparkSpec {

  test("skewed sources: small ones keep everything, giants share one level") {
    import spark.implicits._
    // total 10_000 → budget 4_000; smalls (100+200+300=600) all fit
    // under the level, giants split 3_400 as {1700, 1700} (rem 0)
    val rows = graft.llm.Curation.waterfillOf(
      Seq(("tiny", 100L), ("small", 200L), ("mid", 300L),
        ("giant1", 4400L), ("giant2", 5000L)).toDF("source", "avail"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
      .map(t => t._1 -> t).toMap
    assert(rows("tiny")._4 === 1 && rows("tiny")._5 === 100L)
    assert(rows("small")._5 === 200L && rows("mid")._5 === 300L)
    assert(rows("giant1")._4 === 0 && rows("giant1")._5 === 1700L)
    assert(rows("giant2")._5 === 1700L)
    assert(rows.values.map(_._5).sum === 4000L)
  }

  test("allocation is feasible, exhausts the budget exactly, and is max-min fair") {
    val rows = graft.llm.Curation.budgetWaterfill(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(rows.length === 20)
    val total = rows.map(_._2).sum
    val budget = 4 * total / 10
    // feasible: nobody gets more than they have
    rows.foreach { case (_, avail, _, _, alloc) =>
      assert(alloc <= avail && alloc >= 0) }
    // exact: the integer remainder distribution closes the budget
    assert(rows.map(_._5).sum === math.min(budget, total))
    // max-min fair: every capped source keeps everything; every
    // uncapped allocation is within one token of the common level and
    // at least as large as any capped source's whole availability
    val (capped, uncapped) = rows.partition(_._4 == 1)
    capped.foreach { case (_, avail, _, _, alloc) => assert(alloc === avail) }
    if (uncapped.nonEmpty) {
      val levels = uncapped.map(_._5)
      assert(levels.max - levels.min <= 1)
      if (capped.nonEmpty) assert(levels.min >= capped.map(_._2).max)
    }
  }
}
