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

  test("(start, fin) ties merge into one island, never overlap (ADVICE r8)") {
    // Two spans identical on (start, fin) in one doc: without k in the
    // cumulative-sum ORDER BY, the flag-0 twin can sum FIRST and join
    // the PREVIOUS island, yielding overlapping merged intervals. The
    // crafted frame drives the tie directly through the merge seam.
    import spark.implicits._
    val spans = Seq(
      // doc 1: island A = {(0,3) k=2 flag, (0,3) k=5 tie-dup}, island B
      (1L, 100L, 0L, 3L, 5L), (1L, 100L, 0L, 3L, 2L),
      (1L, 100L, 10L, 12L, 7L),
      // doc 2: tie INSIDE a chain — (4,6) twice bridging (4,9)
      (2L, 50L, 4L, 6L, 1L), (2L, 50L, 4L, 6L, 9L), (2L, 50L, 5L, 9L, 3L))
      .toDF("doc_id", "n_tokens", "start", "fin", "k")
    val got = graft.llm.Curation.mergeSpanIslands(spans)
      .select("doc_id", "island", "start", "fin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 1L, 0L, 3L), (1L, 2L, 10L, 12L),
      (2L, 1L, 4L, 9L)), s"got $got")
    // islands within a doc never overlap
    got.groupBy(_._1).foreach { case (_, is) =>
      is.sortBy(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(b._3 >= a._4, s"overlap: $a $b")
        case _ => ()
      }
    }
  }
}
