package graft

/** Invariants of the masking plan the oracle's value-equality can't
  * state: spans in bounds, pairwise disjoint after the merge, and the
  * corruption budget in the intended band. */
class SpanCorruptionSpec extends SparkSpec {

  test("spans are in-bounds, disjoint, ordered, and budget-bounded") {
    val rows = graft.llm.Curation.spanCorruptionPlan(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, spans) =>
      val n = spans.head._2
      val sorted = spans.sortBy(_._3)
      // sentinels number the merged spans in document order from 1
      assert(sorted.map(_._3).toSeq === (1L to spans.length).toSeq)
      sorted.foreach { case (_, _, _, start, len) =>
        assert(len >= 1 && start >= 0 && start + len <= n)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, s1, l1), (_, _, _, s2, _)) =>
          assert(s2 > s1 + l1 - 1, "merged spans must not touch") // disjoint
        case _ => ()
      }
      // raw budget is ~n/20 spans of length <= 5: merged coverage can
      // only shrink, so corruption stays well under half the doc
      val covered = sorted.map(_._5).sum
      assert(covered <= n / 2 + 5)
    }
  }
}
