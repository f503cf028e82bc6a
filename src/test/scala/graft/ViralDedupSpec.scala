package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Bounded-occupancy LSH enforcement (VERDICT r8 #4): a viral cluster
  * of byte-identical documents must never flow k²/2 candidates through
  * the band-bucket self-join — the exact-duplicate collapse runs
  * candidates and verification at one-representative-per-text grain,
  * and the block-decomposed self-join bounds any remaining hot
  * bucket's largest join task. Output equality with the all-pairs
  * formulation is pinned here on a synthetic corpus (the fixture
  * corpus is pinned by the DuckDB oracle gate).
  */
class ViralDedupSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source")
  }

  private val viralText =
    "breaking news this viral story is being reposted everywhere today"
  private val nearText = // one word changed vs viralText: high jaccard
    "breaking news this viral story is being reposted everywhere tonight"
  private val otherText =
    "a completely different document about distributed query planning internals"

  test("10^4 identical docs: candidate set stays at representative grain") {
    val k = 10000
    val viral = (0 until k).map(i => (i.toLong, viralText))
    val extras = Seq(
      (20001L, nearText), (20002L, otherText),
      (20003L, "short doc"), // < 3 words: no bands, never a candidate
      (20004L, otherText + " with an extra tail clause"))
    val feats = Dedup.featuresOf(docsOf(viral ++ extras))
    val nCands = Dedup.repBandCandidatesOf(feats).count()
    // 4 distinct band-bearing texts -> at most C(4,2) = 6 rep pairs;
    // the all-pairs band join would have produced >= C(10^4,2) ~ 5e7.
    assert(nCands <= 6, s"candidate set not collapsed: $nCands")
  }

  test("pair output equals the all-pairs band-join formulation") {
    // small enough to brute-force: one 80-doc viral group, a 3-doc
    // near group, distinct docs, a short doc
    val docs = docsOf(
      (0 until 80).map(i => (i.toLong, viralText)) ++ Seq(
        (100L, nearText), (101L, nearText), (102L, nearText),
        (200L, otherText), (201L, "short doc")))
    val feats = Dedup.featuresOf(docs).cache()
    val got = Dedup.minhashPairsOf(feats, Dedup.repBandCandidatesOf(feats))
      .select("doc_a", "doc_b", "intersection_size", "union_size", "jaccard")
      .collect().map(_.toSeq).toSet
    // reference: the pre-collapse formulation — all-pairs band
    // collision, signature pre-filter, exact jaccard
    val bandStack = (0 until 4).map(b => s"$b, band_$b").mkString(", ")
    val bands = feats
      .selectExpr("doc_id", s"stack(4, $bandStack) AS (band_idx, band_val)")
      .filter(col("band_val").isNotNull)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val agree = (0 until 16)
      .map(j => s"CASE WHEN a_sig_$j = b_sig_$j THEN 1 ELSE 0 END").mkString(" + ")
    val sigsA = feats.selectExpr(
      Seq("doc_id AS doc_a") ++ (0 until 16).map(j => s"sig_$j AS a_sig_$j"): _*)
    val sigsB = feats.selectExpr(
      Seq("doc_id AS doc_b") ++ (0 until 16).map(j => s"sig_$j AS b_sig_$j"): _*)
    val sh = feats.selectExpr("doc_id", "sh", "n")
    val want = cands
      .join(sigsA, Seq("doc_a")).join(sigsB, Seq("doc_b"))
      .filter(expr(s"($agree) >= 6")).select("doc_a", "doc_b")
      .join(sh.selectExpr("doc_id AS doc_a", "sh AS sh_a", "n AS na"), Seq("doc_a"))
      .join(sh.selectExpr("doc_id AS doc_b", "sh AS sh_b", "n AS nb"), Seq("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "CAST(size(array_intersect(sh_a, sh_b)) AS INTEGER) AS intersection_size",
        "na", "nb")
      .selectExpr("doc_a", "doc_b", "intersection_size",
        "na + nb - intersection_size AS union_size")
      .filter(col("union_size") > 0)
      .selectExpr("*", "intersection_size / union_size AS jaccard")
      .filter(col("jaccard") >= 0.5)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(got == want,
      s"collapsed pipeline diverged: extra=${got -- want} missing=${want -- got}")
    // within-group pairs all carry jaccard exactly 1.0
    val withinJ = Dedup.minhashPairsOf(feats, Dedup.repBandCandidatesOf(feats))
      .filter(col("doc_a") < 80 && col("doc_b") < 80)
      .select("jaccard").distinct().collect().map(_.getDouble(0)).toSeq
    assert(withinJ == Seq(1.0), s"within-group jaccard: $withinJ")
    feats.unpersist()
  }

  test("simhash pairs: viral cluster collapses to simhash-value grain " +
      "and output equals the all-pairs band-join formulation") {
    import spark.implicits._
    // synthetic SIGNATURE relation (the seam skips tokenization): one
    // 500-member hamming-0 cluster whose members SPAN LANGS (the lang
    // filter must apply per member pair, not at rep grain), a
    // neighbor 3 bits away, a neighbor 9 bits away (band-reachable
    // but over the hamming cut), and a far value
    val base = 0x12345678L
    val sims = ((0 until 500).map(i =>
        (i.toLong, if (i % 5 == 0) "de" else "en", base)) ++ Seq(
        (1000L, "en", base ^ 0x7L),       // hamming 3: kept
        (1001L, "en", base ^ 0x1FFL),     // hamming 9: cut
        (1002L, "en", 0x0FEDCBA9L)))      // far
      .toDF("doc_id", "lang", "simhash")
    val got = Dedup.simhashPairsOf(sims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toSet
    // reference: the pre-collapse all-pairs formulation
    val naive = sims.as("a").join(sims.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b", "a.lang AS lang",
        "CAST(bit_count(a.simhash ^ b.simhash) AS INTEGER) AS hamming")
      .filter(col("hamming") <= 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toSet
    assert(naive.nonEmpty, "fixture produced no pairs — test is vacuous")
    assert(got == naive,
      s"collapsed simhash diverged: extra=${(got -- naive).take(5)} " +
        s"missing=${(naive -- got).take(5)}")
    // no duplicate emission: disjoint union of expansion + within-group
    assert(Dedup.simhashPairsOf(sims).count() == naive.size)
    // the 1001 doc is hamming 9 from the viral cluster (cut there) but
    // hamming 6 from 1000 — it must pair ONLY with 1000
    assert(got.filter(p => p._1 == 1001L || p._2 == 1001L)
      == Set((1000L, 1001L, "en", 6)))
    // r14 dispatch pin: the banded fallback (forced with maxDirect = 0)
    // must produce the identical pair set as the direct group-pair
    // path the small-group regime takes (both are lossless for
    // hamming <= 8 by the pigeonhole argument)
    val banded = Dedup.simhashPairsOf(sims, maxDirect = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toSet
    assert(banded == naive,
      s"banded fallback diverged: extra=${(banded -- naive).take(5)} " +
        s"missing=${(naive -- banded).take(5)}")
  }

  test("bucketSelfJoinPairs: blocked hot path equals the naive self-join") {
    // one hot key (600 rows) and several cold keys, threshold 64 so the
    // hot path genuinely engages, 4 blocks
    val rel = spark.range(0, 600).selectExpr("CAST(7 AS INT) AS k", "id")
      .union(spark.range(1000, 1030).selectExpr("CAST(1 AS INT) AS k", "id"))
      .union(spark.range(2000, 2002).selectExpr("CAST(2 AS INT) AS k", "id"))
    val got = Dedup.bucketSelfJoinPairs(rel, Seq("k"), "id",
        hotOccupancy = 64, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = rel.as("a").join(rel.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.size == 600 * 599 / 2 + 30 * 29 / 2 + 1)
    assert(got == naive,
      s"blocked self-join diverged: extra=${(got -- naive).take(5)} " +
        s"missing=${(naive -- got).take(5)}")
    // every pair met exactly once per bucket: no distinct() above, so
    // equality of SETS plus equal COUNTS proves no duplicates either
    val gotCount = Dedup.bucketSelfJoinPairs(rel, Seq("k"), "id",
      hotOccupancy = 64, blocks = 4).count()
    assert(gotCount == naive.size, s"duplicate pairs: $gotCount vs ${naive.size}")
  }

  test("bucket-constant payload columns survive both paths") {
    // payload contract: constant within a bucket (the fp_raw group's
    // shared n/text_len in real use) — here w = k * 10
    val rel = spark.range(0, 100)
      .selectExpr("CAST(pmod(id, 2) AS INT) AS k", "id", "pmod(id, 2) * 10 AS w")
    val pairs = Dedup.bucketSelfJoinPairs(rel, Seq("k"), "id",
      payload = Seq("w"), hotOccupancy = 16, blocks = 4)
    assert(pairs.filter(col("w") =!= pmod(col("doc_a"), lit(2)) * 10).count() == 0)
    assert(pairs.count() == 2L * (50 * 49 / 2))
  }

  // ---- aHash top-k pairs: threshold + collapse exactness ----

  private def naiveAhashTopK(ah: DataFrame): Seq[(Long, Long, Int, Int)] = {
    // the pre-r13 formulation: doc-grain band join, global distinct,
    // TakeOrdered — the reference the histogram-threshold + value-
    // grain collapse must reproduce exactly
    val a = ah.as("a"); val b = ah.as("b")
    a.join(b, col("a.doc_id") < col("b.doc_id"))
      .filter(expr("exists(array(" +
        (Seq((0, 7), (7, 7), (14, 7), (21, 7), (28, 7), (35, 7), (42, 7),
          (49, 7), (56, 8)).map { case (o, w) =>
          s"(shiftright(a.ahash, $o) & ${(1 << w) - 1}) = " +
            s"(shiftright(b.ahash, $o) & ${(1 << w) - 1})"
        }.mkString(", ")) + "), x -> x)"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "CAST(bit_count(a.ahash ^ b.ahash) AS INT) AS hamming")
      .selectExpr("doc_a", "doc_b", "hamming",
        "CASE WHEN hamming <= 8 THEN 1 ELSE 0 END AS is_dup")
      .orderBy(asc("hamming"), asc("doc_a"), asc("doc_b"))
      .limit(50)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
  }

  test("ahash top-k: viral identical-image cluster collapses to value " +
      "grain and equals the all-pairs formulation") {
    import spark.implicits._
    // 200 identical hashes (the viral cluster — naive would push
    // C(200,2)*bands candidates through a distinct), one 3 bits away,
    // one 9 bits away, a few far values: top-50 is entirely the
    // cluster's (0, 1..50) hamming-0 pairs, which the 51-smallest-
    // member cap must reproduce exactly
    val base = 0x0123456789ABCDEFL
    val ah = ((0 until 200).map(i => (i.toLong, base)) ++ Seq(
        (1000L, base ^ 0x7L), (1001L, base ^ 0x1FFL),
        (1002L, 0x7EDCBA9876543210L), (1003L, 0x0F0F0F0F0F0F0F0FL)))
      .toDF("doc_id", "ahash")
    val got = graft.llm.Multimodal.ahashPairsOf(ah)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val want = naiveAhashTopK(ah)
    assert(want.forall(_._3 == 0) && want.size == 50, "fixture not viral")
    assert(got == want,
      s"collapsed ahash top-k diverged:\n got=${got.take(5)}…\n" +
        s"want=${want.take(5)}…")
  }

  test("ahash top-k: histogram threshold is exact on a dup-free corpus " +
      "whose top-50 sits deep in the hamming tail") {
    import spark.implicits._
    // 300 distinct pseudo-random hashes (deterministic LCG) — no dups,
    // so the cutoff h* must reach deep enough that the top-50 nearest
    // pairs all survive the in-join hamming cut
    var x = 88172645463325252L
    val ah = (0 until 300).map { i =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (i.toLong, x)
    }.toDF("doc_id", "ahash")
    val got = graft.llm.Multimodal.ahashPairsOf(ah)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val want = naiveAhashTopK(ah)
    assert(want.map(_._3).distinct.size > 1, "fixture hamming tail vacuous")
    assert(got == want,
      s"threshold ahash top-k diverged:\n got=${got.take(5)}…\n" +
        s"want=${want.take(5)}…")
  }
}
