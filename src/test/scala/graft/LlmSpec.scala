package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-extension operator specs on sf0.001 fixtures + typed paths the
  * oracle can't cover (multimodal mapPartitions). */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal typed mapPartitions feature extraction is deterministic") {
    val media = Multimodal.media(spark, sfTiny).as[Multimodal.MediaRecord]
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.length == 500)
    assert(f1.forall(_.feature_dim == Multimodal.FakeCodec.featureDim))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // payload length matches the document text byte length
    val lens = graft.io.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), length(col("text")).as("n")).as[(Long, Int)]
      .collect().toMap
    assert(f1.forall(m => lens(m.doc_id) == m.n_bytes))
  }

  test("minhash signatures: 16 sigs + 4 bands, all hex, stable across runs") {
    val s1 = Dedup.minhashSignatures(spark, sfTiny).collect()
    val s2 = Dedup.minhashSignatures(spark, sfTiny).collect()
    assert(s1.sameElements(s2))
    val row = s1.head
    (0 until 16).foreach(j =>
      assert(row.getAs[String](s"sig_$j").matches("[0-9a-f]{32}")))
  }

  test("minhash pairs are candidates with true jaccard >= 0.5, a<b ordered") {
    val pairs = Dedup.minhashPairs(spark, sfTiny)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(pairs.forall { case (a, b, i, u, j) =>
      a < b && i <= u && j >= 0.5 && math.abs(j - i.toDouble / u) < 1e-12 })
  }

  test("dedup clusters: canonical labels are fixpoints and cover all pairs") {
    val labels = Dedup.dedupClusters(spark, sfTiny)
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.minhashPairs(spark, sfTiny)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(labels.nonEmpty)
    // canonical is the minimum of its cluster and labels itself
    labels.foreach { case (d, c) =>
      assert(c <= d && labels(c) == c)
    }
    // both endpoints of every near-dup pair share a cluster
    pairs.foreach { case (a, b) => assert(labels(a) == labels(b)) }
    // clusters partition the paired docs
    assert(labels.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("simhash: 32-bit range and near-identical docs have small hamming") {
    val sigs = Dedup.simhashSignatures(spark, sfTiny)
      .select("simhash").as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < (1L << 32)))
    val pairs = Dedup.simhashPairs(spark, sfTiny)
      .select("hamming").as[Int].collect()
    assert(pairs.forall(h => h >= 0 && h <= 8))
  }

  test("lsh buckets in range; topk ranks dense from 1 per query") {
    val b = Similarity.lshBuckets(spark, sfTiny).select("bucket").as[Int].collect()
    assert(b.forall(x => x >= 0 && x < 16))
    val tk = Similarity.lshTopK(spark, sfTiny)
      .select("query_id", "rank").as[(Long, Int)].collect()
    tk.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq)
    }
  }

  test("brute-force topk: cosine within [-1,1], rank ordered by cosine desc") {
    val rows = Similarity.cosineTopK(spark, sfTiny)
      .select("query_id", "rank", "cosine").as[(Long, Int, Double)].collect()
    assert(rows.forall { case (_, _, c) => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9 })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("repetition ratio in [0,1) and consistent with gram counts") {
    val rows = TextAnalysis.repetition(spark, sfTiny)
      .select("n_grams", "n_distinct_grams", "n_repeated", "repetition_ratio")
      .as[(Int, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, d, r, ratio) =>
      assert(d <= n && r == n - d)
      assert(ratio >= 0.0 && ratio < 1.0)
      if (n > 0) assert(math.abs(ratio - r.toDouble / n) < 1e-12)
    }
  }

  test("language-id scores are non-negative; quality score in [0,1]") {
    val q = TextAnalysis.textStats(spark, sfTiny)
      .select("quality_score").as[Double].collect()
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
    val l = TextAnalysis.languageId(spark, sfTiny)
      .select("s_en", "s_es", "s_fr", "s_de", "s_zh")
      .as[(Int, Int, Int, Int, Int)].collect()
    assert(l.forall(t => t._1 >= 0 && t._2 >= 0 && t._3 >= 0 && t._4 >= 0 && t._5 >= 0))
  }

  test("corpus split is deterministic, ~80/10/10, and quota bounds hold") {
    val s1 = Curation.sampleSplit(spark, sfTiny).collect()
    val s2 = Curation.sampleSplit(spark, sfTiny).collect()
    assert(s1.sameElements(s2)) // re-run can never reassign
    val bySplit = s1.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 350 && bySplit("val") > 20 && bySplit("test") > 20)
    val quota = Curation.sourceQuota(spark, sfTiny)
      .select("source", "pick_rank").as[(String, Int)].collect()
    quota.groupBy(_._1).foreach { case (_, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1 to ranks.length) && ranks.length <= 50)
    }
  }

  test("exact dedup partitions the corpus (group sizes sum to row count)") {
    val g = Dedup.exactDedup(spark, sfTiny).select("n_docs").as[Long].collect()
    assert(g.sum == 500)
  }

  test("label propagation converges on a diameter-30 chain inside the cap") {
    // Pathological shape for naive propagation: one 31-node chain —
    // O(diameter) would need 30 rounds; pointer jumping lands well
    // under the default 20-round cap.
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.propagateLabels(chain).as[(Long, Long)].collect().toMap
    assert(labels.size == 31)
    assert(labels.values.forall(_ == 0L))
  }

  test("label propagation fails loudly when the round cap is exhausted") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.propagateLabels(chain, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("pii scan detects emails, phones, urls, ssn shapes; clean text stays clean") {
    import graft.llm.TextAnalysis
    val df = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk today"),
      (2L, "call +1 (415) 555-0199 or 020 7946 0958 now"),
      (3L, "see https://example.org/a?b=c and http://x.io"),
      (4L, "ssn 123-45-6789 leaked"),
      (5L, "perfectly clean prose with nothing sensitive"),
      (6L, "not-an-email@ nor http:/broken nor 12-34-56")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScanDf(df).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), (x.getInt(1), x.getInt(2), x.getInt(3), x.getInt(4), x.getInt(5)))).toMap
    assert(r(1L) == ((1, 0, 0, 0, 1)))
    assert(r(2L)._2 == 2 && r(2L)._5 == 1) // both phone shapes
    assert(r(3L)._3 == 2 && r(3L)._5 == 1)
    assert(r(4L)._4 == 1 && r(4L)._5 == 1)
    assert(r(5L) == ((0, 0, 0, 0, 0)))
    assert(r(6L) == ((0, 0, 0, 0, 0)))
  }

  test("label propagation matches a union-find reference on random graphs") {
    // The one operator with a hand-rolled distributed algorithm gets a
    // randomized differential check: min-label propagation (with
    // pointer jumping) must agree with driver-side union-find on the
    // same edge set — any divergence in closure semantics, self-loop
    // handling, or convergence detection shows up here.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(40)
      val edges = Seq.fill(rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // root stays the min
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(x => x -> find(x.toInt).toLong).toMap
        val got = Dedup.propagateLabels(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"trial $trial: n=$n edges=$edges")
      }
    }
  }
}
