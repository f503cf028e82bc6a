package graft

import org.apache.spark.sql.functions._

/** Losslessness of the Ed-Join candidate chain against JVM brute
  * force, on a corpus crafted to hit every branch the fixture can't:
  * short docs (the both-short fallback), pathologically repetitive
  * docs (distinct-gram set ≪ gram bag — the set-vs-bag theorem
  * distinction), boundary pairs at exactly d and d+1, and identical
  * texts (distance 0). */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private val d = 12

  /** Plain O(n·m) Levenshtein — the spec's independent metric. */
  private def lev(s: String, t: String): Int = {
    val dp = Array.tabulate(t.length + 1)(identity)
    for (i <- 1 to s.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to t.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (s(i - 1) == t(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(t.length)
  }

  private def mut(s: String, edits: Int): String = {
    // deterministic spread of substitutions/inserts/deletes
    var r = s
    (0 until edits).foreach { k =>
      val p = (k * 37 + 11) % math.max(1, r.length - 1)
      r = (k % 3) match {
        case 0 => r.substring(0, p) + "Z" + r.substring(p + 1) // sub
        case 1 => r.substring(0, p) + "Q" + r.substring(p)     // ins
        case 2 => r.substring(0, p) + r.substring(p + 1)       // del
      }
    }
    r
  }

  test("edit join equals brute force on a branch-covering corpus") {
    val base = "the quick brown fox jumps over the lazy dog while " +
      "spark shuffles parquet row groups across executor threads"
    val docs = Seq[(Long, String)](
      // long family: mutations at 0, 3, 12 (== d), 13 (== d+1), 40
      (0L, base),
      (1L, mut(base, 3)),
      (2L, mut(base, 12)),
      (3L, mut(base, 13)),
      (4L, mut(base, 40)),
      (5L, base), // exact duplicate of 0
      // repetitive docs: 60 chars, ~2 distinct grams
      (6L, "ab" * 30),
      (7L, "ab" * 28 + "cdab"),
      (8L, "xy" * 30),
      // short-doc family (< 39 chars): fallback branch
      (9L, "short text one"),
      (10L, "short text two"),
      (11L, "completely different tiny"),
      (12L, "sh"), // below gram width q=3
      // short-vs-long length gap keeps them apart via length filter
      (13L, "the quick brown fox")
    ).toDF("doc_id", "text")

    val rows = graft.llm.EditJoin.pairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val local = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val expected = (for {
      (ia, ta) <- local; (ib, tb) <- local if ia < ib
      e = lev(ta, tb) if e <= d
    } yield (ia, ib) -> e.toLong).toMap

    assert(rows === expected)
    // sanity on the crafted intent: the spec actually exercised
    // a distance-0 pair, a == d boundary pair, and a short-pair hit
    assert(expected((0L, 5L)) === 0L)
    assert(expected.exists { case (_, e) => e == d.toLong })
    assert(expected.contains((9L, 10L)))
    assert(!expected.contains((0L, 4L))) // 40 edits is out
  }

  test("band-scan and prefix-gram candidacy verify to identical answers") {
    // both fixture docs (saturated grams → band path dispatched) and
    // the crafted corpus (gram-rich → prefix path dispatched) must
    // yield the same verified pair set through EITHER candidacy —
    // band candidacy is a superset by construction, prefix candidacy
    // is lossless by the set-prefix theorem, verify decides
    graft.functions.Native.register(spark)
    def viaBoth(docs: org.apache.spark.sql.DataFrame)
        : (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) = {
      val base = docs.selectExpr("doc_id", "text", "length(text) AS len")
      val texts = base.select("doc_id", "text")
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val band = collect(graft.llm.EditJoin.verifyPairs(
        graft.llm.EditJoin.bandScanPairs(base, broadcastBuild = true)))
      val prefix = collect(graft.llm.EditJoin.verifyPairs(
        graft.llm.EditJoin.prefixCandidatePairs(base)))
      (band, prefix)
    }
    val fixture = graft.io.Tables.documents(spark, sfTiny)
      .select("doc_id", "text")
    val (b1, p1) = viaBoth(fixture)
    assert(b1.nonEmpty && b1 == p1,
      s"fixture: band-only=${(b1 -- p1).take(3)} prefix-only=${(p1 -- b1).take(3)}")
    val crafted = Seq[(Long, String)](
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, mut("the quick brown fox jumps over the lazy dog tonight", 5)),
      (2L, "zebras graze quietly beneath the winter moonlight sky"),
      (3L, "short one"), (4L, "short two")).toDF("doc_id", "text")
    val (b2, p2) = viaBoth(crafted)
    assert(b2.nonEmpty && b2 == p2)
  }

  test("over-threshold corpus dispatches the shuffle-band fallback, same answer") {
    // models the 100×-scale saturated corpus whose document relation
    // no longer fits a broadcast: with the broadcast bound forced to 0
    // bytes the dispatch must keep the band equi-join but drop the
    // broadcast() hint — no forced BroadcastExchange of the corpus —
    // and the verified pair set must be byte-identical. Both AQE
    // broadcast thresholds are forced to -1 so the runtime can't
    // re-broadcast the small fixture and mask a hinted plan.
    graft.functions.Native.register(spark)
    val fixture = graft.io.Tables.documents(spark, sfTiny)
      .select("doc_id", "text")
    def collectPairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val baseline = collectPairs(graft.llm.EditJoin.pairsOf(fixture))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.llm.EditJoin.pairsOf(fixture, maxBroadcastBytes = 0L)
      val got = collectPairs(df)
      assert(got == baseline, "fallback plan changed the answer")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"over-bound corpus still forced a broadcast:\n$p")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("thresholded levenshtein boundary: d kept, d+1 rejected") {
    val r = spark.sql(
      s"SELECT levenshtein('${"a" * 20}', '${"a" * 20 + "b" * d}', $d) x, " +
        s"levenshtein('${"a" * 20}', '${"a" * 20 + "b" * (d + 1)}', $d) y")
      .head()
    assert(r.getInt(0) === d)
    assert(r.getInt(1) === -1)
  }

  test("fixture run is non-empty and all distances within threshold") {
    val out = graft.llm.EditJoin.editDistancePairs(spark, sfTiny)
    val rs = out.collect()
    assert(rs.nonEmpty)
    assert(rs.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= d))
    // pair set is canonical: a < b, no duplicates
    val keys = rs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.distinct.length === keys.length)
  }
}
