package graft

import graft.llm.Curation
import graft.ops.Profile

/** Invariants of the packing manifest, mixing weights, and table
  * profile that the value-equality oracles can't express. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("pack manifest tiles each source stream with no gaps or overlaps") {
    val rows = Curation.packSequences(spark, sfTiny)
      .select("doc_id", "source", "n_tokens", "tok_start", "tok_end",
        "first_seq", "last_seq", "n_seqs")
      .as[(Long, String, Long, Long, Long, Long, Long, Int)].collect()
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val ordered = docs.sortBy(_._1)
      // contiguous intervals: each doc starts where the previous ended
      assert(ordered.head._4 == 0L, src)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._5, s"$src gap at doc ${b._1}")
        case _ =>
      }
      ordered.foreach { case (id, _, n, s, e, f, l, k) =>
        assert(e - s == n, s"interval width of $id")
        assert(f <= l && k == l - f + 1 && k >= 1, s"seq span of $id")
        // a doc spans ceil boundaries only: it cannot skip a sequence
        assert(l == math.max(e - 1, s) / 128, s"last_seq of $id")
      }
    }
  }

  test("mix weights: shares sum to 1, repeat factors capped and inverse to share") {
    val rows = Curation.mixWeights(spark, sfTiny)
      .select("source", "n_docs", "n_tokens", "token_share",
        "repeat_factor", "effective_tokens")
      .as[(String, Long, Long, Double, Double, Long)].collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    val total = rows.map(_._3).sum
    rows.foreach { case (src, nDocs, nTok, share, rf, eff) =>
      assert(nDocs > 0 && nTok > 0, src)
      assert(share == nTok.toDouble / total, src)
      assert(rf > 0.0 && rf <= 4.0, src)
      // a source already at/above its uniform target is never repeated up
      if (share >= 1.0 / rows.length) assert(rf <= 1.0, src)
      assert(eff == math.round(nTok * rf), src)
    }
  }

  test("epoch plan rounds each doc to floor or ceil of its source's factor") {
    val weights = Curation.mixWeights(spark, sfTiny)
      .select("source", "repeat_factor").as[(String, Double)].collect().toMap
    val plan = Curation.epochPlan(spark, sfTiny)
      .select("doc_id", "source", "n_repeats")
      .as[(Long, String, Int)].collect()
    assert(plan.length == 500)
    plan.foreach { case (id, src, k) =>
      val rf = weights(src)
      assert(k == math.floor(rf).toInt || k == math.floor(rf).toInt + 1,
        s"doc $id repeats $k for rf $rf")
    }
    // deterministic: a second run produces identical counts
    val again = Curation.epochPlan(spark, sfTiny)
      .select("doc_id", "n_repeats").as[(Long, Int)].collect().toMap
    plan.foreach { case (id, _, k) => assert(again(id) == k, s"doc $id") }
  }

  test("quality canonical dominates every member of its cluster") {
    val quality = graft.llm.TextAnalysis.textStats(spark, sfTiny)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val labels = graft.llm.Dedup.dedupClusters(spark, sfTiny)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val chosen = graft.llm.Dedup.canonicalByQuality(spark, sfTiny)
      .select("cluster_id", "canonical_doc", "best_quality", "cluster_size")
      .as[(Long, Long, Double, Long)].collect()
    val members = labels.groupBy(_._2)
    assert(chosen.map(_._1).toSet == members.keySet)
    chosen.foreach { case (cid, canon, best, size) =>
      val ms = members(cid).map(_._1)
      assert(ms.contains(canon), s"cluster $cid canonical not a member")
      assert(ms.length == size, s"cluster $cid size")
      assert(best == quality(canon), s"cluster $cid quality mismatch")
      assert(ms.forall(m => quality(m) <= best), s"cluster $cid not argmax")
    }
  }

  test("containment pairs are ordered, bounded, and at least one side >= 0.8") {
    val rows = graft.llm.Dedup.containmentPairs(spark, sfTiny)
      .select("doc_a", "doc_b", "containment_a", "containment_b", "max_containment")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ca, cb, mx) =>
      assert(a < b, s"($a,$b) not ordered")
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0, s"($a,$b)")
      assert(mx == math.max(ca, cb) && mx >= 0.8, s"($a,$b)")
    }
  }

  test("boilerplate chunks appear in >= 2 docs; key skew ratio >= 1") {
    val bp = graft.llm.Curation.chunkBoilerplate(spark, sfTiny)
      .select("n_occurrences", "n_docs").as[(Long, Long)].collect()
    bp.foreach { case (occ, docs) =>
      assert(docs >= 2 && occ >= docs, s"($occ, $docs)")
    }
    val Array((nRows, nKeys, maxK, mean, ratio)) =
      graft.ops.Profile.keySkew(spark, sfTiny)
        .as[(Long, Long, Long, Double, Double)].collect()
    assert(nRows > 0 && nKeys > 0 && maxK >= 1)
    assert(mean == nRows.toDouble / nKeys)
    assert(ratio >= 1.0 && ratio == maxK / mean)
  }

  test("table profile covers every lineitem column with consistent bounds") {
    val prof = Profile.tableProfile(spark, sfTiny)
      .select("column_name", "basis", "n_rows", "n_null", "n_distinct",
        "min_ord", "max_ord")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    val li = spark.read.parquet(s"$sfTiny/lineitem.parquet")
    assert(prof.map(_._1).toSet == li.columns.toSet)
    val nRows = li.count()
    prof.foreach { case (c, basis, n, nNull, nDist, mn, mx) =>
      assert(n == nRows, c)
      assert(nNull >= 0 && nNull <= n, c)
      assert(nDist >= 1 && nDist <= n - nNull, c)
      assert(mn <= mx, c)
      assert(Set("value", "epoch", "length")(basis), c)
    }
    // spot-check one column against a direct computation
    val q = prof.find(_._1 == "l_quantity").get
    val direct = li.selectExpr("count(distinct l_quantity)",
      "CAST(min(l_quantity) AS DOUBLE)", "CAST(max(l_quantity) AS DOUBLE)")
      .as[(Long, Double, Double)].head()
    assert((q._5, q._6, q._7) == direct)
  }
}
