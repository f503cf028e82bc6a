package graft

import org.apache.spark.sql.DataFrame
import graft.llm.PrefixJoin

/** The containment join's two physical plans — the saturated-vocab
  * bitmask path and the Zipfian rarity-prefix path — must agree with
  * each other and with brute force on ANY corpus where both apply;
  * and the masked path's minimal-pair/201-member bounds must survive
  * a viral group (hundreds of identical docs) without losing a
  * top-200 pair. [[ContainmentBandSpec]] covers the dispatch path on
  * the real fixture; this spec covers the equivalence and the bound.
  */
class ContainmentMaskedSpec extends SparkSpec {
  import spark.implicits._

  private def docsArrOf(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.toDF("doc_id", "raw")
      .selectExpr("doc_id", "sort_array(array_distinct(raw)) AS toks")
      .selectExpr("doc_id", "toks", "size(toks) AS sz")

  // MULTISET comparison on purpose: a Set compare once hid an
  // orientation bug that emitted equal-size cross pairs twice —
  // duplicates must fail the compare, not vanish into it
  private def brute(rows: Seq[(Long, Seq[String])])
      : Seq[(Long, Long, Long, Double)] = {
    val docs = rows.map { case (id, ts) => id -> ts.toSet }
    val all = for {
      (ia, sa) <- docs
      (ib, sb) <- docs
      if ia != ib
      if sa.size < sb.size || (sa.size == sb.size && ia < ib)
      if sb.size <= 2 * sa.size
      inter = (sa intersect sb).size
      if 10 * inter >= 9 * sa.size
    } yield (ia, ib, inter.toLong, inter.toDouble / sa.size)
    all.sortBy(r => (-r._4, r._1, r._2)).take(200)
      .sortBy(r => (r._1, r._2)).toVector
  }

  private def run(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.selectExpr("contained_id", "container_id", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect().toVector
      .sortBy(r => (r._1, r._2))

  test("masked == prefix == brute force under a viral identical group") {
    graft.functions.Native.register(spark)
    val t = (0 to 11).map(i => s"t$i")
    val viral = (1000L to 1299L).map(id => id -> t.take(5))      // 300 twins
    val fixture: Seq[(Long, Seq[String])] = Seq(
      1L -> t.take(10),                    // {t0..t9}
      2L -> t.take(9),                     // strict subset, C=1.0
      4L -> (t.take(9) :+ t(10)),          // equal size vs doc 1, C=0.9
      5L -> t.take(6),                     // 6 of 10 vs doc 1 — fails
      6L -> Seq(t(11))                     // singleton, no partner
    ) ++ viral
    val docsArr = docsArrOf(fixture)
    val vocab = docsArr.selectExpr("explode(toks) AS tok").distinct()
    assert(vocab.count() <= 64)
    val expect = brute(fixture)
    assert(expect.size == 200) // the viral group alone overflows the cap
    val masked = run(PrefixJoin.maskedContainment(docsArr, vocab))
    val prefix = run(PrefixJoin.prefixContainment(docsArr))
    assert(masked == expect,
      s"masked missing=${(expect.diff(masked)).take(5)} " +
        s"extra=${(masked.diff(expect)).take(5)}")
    assert(prefix == expect,
      s"prefix missing=${(expect.diff(prefix)).take(5)} " +
        s"extra=${(prefix.diff(expect)).take(5)}")
  }

  test("equal-size distinct sets orient per doc id in both paths") {
    graft.functions.Native.register(spark)
    val t = (0 to 11).map(i => s"t$i")
    val fixture: Seq[(Long, Seq[String])] = Seq(
      1L -> t.take(10),           // {t0..t9}
      2L -> t.take(9),            // strict subset of both 1 and 4
      4L -> (t.take(9) :+ t(10)), // equal size vs doc 1, inter 9
      5L -> t.take(6),
      6L -> Seq(t(11)))
    val docsArr = docsArrOf(fixture)
    val vocab = docsArr.selectExpr("explode(toks) AS tok").distinct()
    val expect = brute(fixture)
    assert(run(PrefixJoin.maskedContainment(docsArr, vocab)) == expect)
    assert(run(PrefixJoin.prefixContainment(docsArr)) == expect)
    // the equal-size pair is present, oriented by id, at exactly 0.9
    assert(expect.contains((1L, 4L, 9L, 0.9)))
  }

  test("over-bound distinct-mask count routes through the prefix path") {
    // the ≤64-token vocabulary check alone does NOT bound the masked
    // path's masks² BNLJ (2^vocab subsets are possible); the dispatch
    // must also check the distinct-set count. Forcing the bound below
    // this corpus's distinct-set count must pick the prefix plan —
    // no BroadcastNestedLoopJoin — with the identical top-200 answer.
    graft.functions.Native.register(spark)
    val t = (0 to 11).map(i => s"t$i")
    val fixture: Seq[(Long, Seq[String])] = Seq(
      1L -> t.take(10), 2L -> t.take(9), 4L -> (t.take(9) :+ t(10)),
      5L -> t.take(6), 6L -> Seq(t(11))) ++
      (1000L to 1099L).map(id => id -> t.take(5))
    val docsArr = docsArrOf(fixture)
    val expect = brute(fixture)
    // sanity: under the default bound this corpus takes the masked path
    assert(run(PrefixJoin.containmentFrom(docsArr)) == expect)
    val guarded = PrefixJoin.containmentFrom(docsArr, maxMasks = 3L)
    val got = run(guarded)
    assert(got == expect,
      s"fallback missing=${(expect.diff(got)).take(5)} " +
        s"extra=${(got.diff(expect)).take(5)}")
    val p = guarded.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"over-bound mask count still chose the BNLJ plan:\n$p")
  }

  test("large vocabulary routes through the prefix path and stays exact") {
    graft.functions.Native.register(spark)
    // 80-token vocabulary, sliding 21-token windows: adjacent windows
    // overlap 20/21 = 0.952 >= 0.9; skip-2 windows 19/21 — fails
    val fixture: Seq[(Long, Seq[String])] = (0 until 60).map { i =>
      i.toLong -> (i until i + 21).map(j => f"w${j % 80}%02d")
    }
    val docsArr = docsArrOf(fixture)
    assert(docsArr.selectExpr("explode(toks) AS t").distinct().count() > 64)
    val got = run(PrefixJoin.containmentFrom(docsArr))
    assert(got == brute(fixture))
    assert(got.nonEmpty && got.forall(_._4 >= 0.9))
  }
}
