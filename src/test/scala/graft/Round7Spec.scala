package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity, TextAnalysis}

/** Properties of the round-7 additions that the value-equality oracles
  * can't express: graph-shape invariants of the kNN/semantic-cluster
  * tier, the classifier's exact JVM recomputation, collocation-lift
  * consistency, and the propagation-lineage regression guard. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  test("knn graph: <= k in-cell neighbors per vector, rank-ordered") {
    val g = Similarity.knnGraph(spark, sfTiny)
      .select("vec_id", "nbr_id", "cell", "rank", "cosine")
      .as[(Long, Long, Long, Int, Double)].collect()
    assert(g.nonEmpty)
    g.groupBy(_._1).foreach { case (v, rows) =>
      assert(rows.length <= 3, s"vec $v has ${rows.length} neighbors")
      assert(rows.map(_._4).sorted.sameElements(1 to rows.length), s"vec $v ranks")
      // cosine non-increasing in rank (ties broken by nbr_id asc)
      val byRank = rows.sortBy(_._4)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2), s"vec $v order")
        case _ =>
      }
      assert(rows.forall(r => r._2 != v), s"vec $v self-edge")
    }
    // neighbors come from the vector's own IVF cell
    val cells = Similarity.ivfCells(spark, sfTiny)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    g.foreach { case (v, n, cell, _, _) =>
      assert(cells(v) == cell && cells(n) == cell, s"edge $v->$n crosses cells")
    }
  }

  test("semantic clusters: mutual edges land in one cluster; singletons label themselves") {
    val labels = Similarity.semanticClusters(spark, sfTiny)
      .select("vec_id", "cluster_id", "is_clustered")
      .as[(Long, Long, Int)].collect()
    val byId = labels.map(r => r._1 -> r._2).toMap
    // every vector present exactly once, labels are component minima
    assert(labels.length == byId.size)
    labels.foreach { case (v, c, flag) =>
      assert(c <= v, s"label above own id for $v")
      if (flag == 0) assert(c == v, s"singleton $v mislabeled $c")
    }
    // recompute the mutual edge set from the knn graph and assert both
    // endpoints share a label (soundness of the collapse)
    val knn = Similarity.knnGraph(spark, sfTiny)
      .select("vec_id", "nbr_id", "cosine").as[(Long, Long, Double)].collect()
    val fwd = knn.map(r => (r._1, r._2)).toSet
    val mutual = knn.filter(r => r._3 >= 0.3 && r._1 < r._2 && fwd((r._2, r._1)))
    assert(mutual.nonEmpty, "fixture produced no mutual edges — spec is vacuous")
    mutual.foreach { case (a, b, _) =>
      assert(byId(a) == byId(b), s"mutual edge ($a,$b) split across clusters")
      assert(labels.find(_._1 == a).get._3 == 1 && labels.find(_._1 == b).get._3 == 1)
    }
  }

  test("label propagation stays O(edges) per round on a 1500-node chain") {
    // Regression guard for the per-round lineage truncation: before
    // propagateLabels checkpointed each round, every round silently
    // re-executed all prior rounds whenever the CacheManager plan-match
    // missed — geometric cost that only surfaced on graphs needing
    // many rounds (observed: 130 s for ROUND FOUR on 302 edges, then
    // OOM). A 1500-node chain needs ~10 pointer-jumping rounds; with
    // per-round checkpoints it completes in seconds, without them it
    // effectively hangs (2^10 recompute) — the suite timeout is the
    // assertion.
    val chain = (0L until 1499L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.propagateLabels(chain).as[(Long, Long)].collect()
    assert(labels.length == 1500)
    assert(labels.forall(_._2 == 0L), "chain must collapse to the min id")
  }

  test("hashed classifier matches an exact JVM recomputation") {
    val got = TextAnalysis.hashedClassifier(spark, sfTiny)
      .select("doc_id", "n_feats", "score", "keep_flag")
      .as[(Long, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.length == got.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val v = java.lang.Long.parseLong(hex, 16)
      (v % 4096L) * 2654435761L % 1001L - 500L
    }
    docs.foreach { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+")
      val score = toks.map(weight).sum
      val (gid, n, s, flag) = got(id)
      assert(gid == id && n == toks.length, s"doc $id n_feats")
      assert(s == score, s"doc $id score: got $s want $score")
      assert(flag == (if (score >= 0) 1 else 0), s"doc $id flag")
    }
  }

  test("collocations: lift consistent with counts, ranked, above the noise floor") {
    val rows = TextAnalysis.collocations(spark, sfTiny)
      .select("rank", "term_a", "term_b", "n_pair", "n_a", "n_b", "lift")
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
    assert(rows.length == 30)
    assert(rows.map(_._1).sameElements(1 to 30))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._7 >= b._7, "lift must be non-increasing in rank")
      case _ =>
    }
    // recompute lift from the emitted counts + corpus totals
    val docs = spark.read.parquet(s"$sfTiny/documents.parquet")
      .select("text").as[String].collect()
    val allToks = docs.flatMap(_.toLowerCase.trim.split("\\s+"))
    val nTok = allToks.length.toLong
    val nPairTotal = docs.map { t =>
      val n = t.toLowerCase.trim.split("\\s+").length; math.max(n - 1, 0)
    }.sum.toLong
    rows.foreach { case (_, _, _, nPair, nA, nB, lift) =>
      assert(nPair >= 5)
      val want = (nPair.toDouble * nTok * nTok) / (nA.toDouble * nB * nPairTotal)
      assert(lift == want, s"lift mismatch: $lift vs $want")
    }
  }

  test("label outliers: a per-label rank permutation flagging the top 5") {
    val rows = Similarity.labelOutliers(spark, sfTiny)
      .select("vec_id", "label", "dist2", "dist_rank", "is_outlier")
      .as[(Long, String, Double, Int, Int)].collect()
    assert(rows.forall(_._3 >= 0.0), "squared distance must be non-negative")
    rows.groupBy(_._2).foreach { case (label, rs) =>
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length), s"$label ranks")
      assert(rs.count(_._5 == 1) == math.min(5, rs.length), s"$label outlier count")
      val byRank = rs.sortBy(_._4)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1), s"$label order")
        case _ =>
      }
    }
  }

  test("kcore: triangle survives peeling, pendant chain does not") {
    // triangle 1-2-3 (the 2-core) with a pendant chain 3-4-5-6: peeling
    // strips the chain end-in, then nothing else — the brute-force
    // expectation is exactly the triangle at degree 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = pairs.toDF("a", "b").selectExpr("a AS src", "b AS dst")
      .unionAll(pairs.toDF("a", "b").selectExpr("b AS src", "a AS dst"))
    val core = graft.sql.Graph.kcore(edges, 2, 8)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(core == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kcore: fixture peeling converges inside the round budget") {
    // the fixed-round contract: one extra round must change nothing on
    // the fixture (if a regenerated corpus ever peels slower, this
    // fails loudly and the round budget gets raised)
    val p = Dedup.minhashPairs(spark, sfTiny).select("doc_a", "doc_b")
    val edges = p.selectExpr("doc_a AS src", "doc_b AS dst")
      .unionAll(p.selectExpr("doc_b AS src", "doc_a AS dst"))
    val at8 = graft.sql.Graph.kcore(edges, 2, 8).as[(Long, Long)].collect().sorted.toSeq
    val at9 = graft.sql.Graph.kcore(edges, 2, 9).as[(Long, Long)].collect().sorted.toSeq
    assert(at8 == at9, "peeling had not converged after 8 rounds")
    // and every member really has core degree >= k
    assert(at8.forall(_._2 >= 2))
  }

  test("incremental assign: occupancy reconciles with the full index") {
    val inc = Similarity.incrementalAssign(spark, sfTiny)
      .select("cell", "old_n", "n_added", "new_n")
      .as[(Long, Long, Long, Long)].collect()
    assert(inc.nonEmpty)
    inc.foreach { case (c, o, a, n) => assert(o + a == n, s"cell $c") }
    // per-cell new_n must equal the full ivfCells occupancy (frozen
    // centroids: batch assignment == full assignment restricted)
    val full = Similarity.ivfCells(spark, sfTiny)
      .groupBy("cell").count().as[(Long, Long)].collect().toMap
    assert(inc.map(r => r._1 -> r._4).toMap == full)
    // and the appended count is exactly the batch-membership count
    val batchN = graft.io.Tables.embeddings(spark, sfTiny)
      .filter("vec_id % 10 = 9").count()
    assert(inc.map(_._3).sum == batchN)
  }

  test("bfs kernel: exact hops and seed tie-break on a path graph") {
    // 0→1→2→3→4 and 10→3: node 3 is reachable from seed 0 in 3 hops
    // and from seed 10 in 1 hop — the packed min must pick (1, 10).
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(0L, 10L).toDF("node")
    val dist = graft.sql.Graph.bfsHops(edges, seeds, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(dist(0L) == 0L && dist(10L) == 10L) // hop 0, own seed
    assert(dist(1L) == 100L) // hop 1 from seed 0
    assert(dist(2L) == 200L)
    assert(dist(3L) == 110L) // hop 1 from seed 10 beats hop 3 from seed 0
    assert(dist(4L) == 210L) // continues from the winning label
    assert(!dist.contains(5L))
  }

  test("bfs fixture converges inside the round budget") {
    val edges = graft.sql.Graph
      .tradeEdgesForTest(spark, sfTiny).localCheckpoint(true)
    val seeds = graft.io.Tables.table(spark, sfTiny, "nation")
      .filter("n_regionkey = 0").selectExpr("n_nationkey AS node")
    def run(r: Int) = graft.sql.Graph.bfsHops(edges, seeds, r)
      .as[(Long, Long)].collect().toMap
    assert(run(6) == run(7), "one extra round changed the labeling")
  }
}

