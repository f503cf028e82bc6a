package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Gen.{Dialect, DuckD, SparkD, intDiv}

/** Graph analytics over relations — PageRank on the international
  * trade graph (nation → nation edges wherever a supplier in one
  * nation ships a line item to a customer in another).
  *
  * Distributed PageRank is join-shaped, which is why it runs at any
  * scale: each iteration is (edges ⋈ ranks on src) → per-dst sum — a
  * shuffle equi-join on the node key plus a map-side-combined hash
  * aggregation. Partition ranks and edges by the same node key and the
  * join co-locates; that IS the large-graph layout (GraphX/Pregel do
  * exactly this under the hood). The iteration count is fixed and the
  * loop unrolls into the plan — at real depth you localCheckpoint
  * every few rounds so the plan stays shallow (the dedupClusters
  * lesson).
  *
  * Determinism discipline: ranks live as BIGINT picounts (10¹² = mass
  * 1.0). Per-edge contributions are integer floor divisions
  * (rank DIV outdeg), incoming mass is a SUM of BIGINTs
  * (order-independent under any partitioning), and the damping step
  * 85·x DIV 100 stays integral. Floor losses are deterministic and
  * identical in both engines — unlike float PageRank, whose
  * accumulation order a cluster cannot pin. Dangling mass (nodes with
  * no out-edges) redistributes uniformly each round, the standard
  * treatment.
  */
object Graph {

  private val R = 1000000000000L // 10^12 picounts = probability 1.0
  private val iterations = 3

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Tables.table(spark, dir, name)

  /** r'(u) = teleport + damp·(incoming(u) + dangling-share); every
    * operand BIGINT, every division a floor DIV. Shared between the
    * Spark plan and the DuckDB oracle so the arithmetic tree is
    * identical. */
  private def nextRankExpr(incoming: String, dangling: String,
      nNodes: String, d: Dialect): String = {
    val teleport = intDiv(intDiv(s"($R * 15)", "100", d), nNodes, d)
    val share = intDiv(dangling, nNodes, d)
    s"$teleport + ${intDiv(s"(85 * ($incoming + $share))", "100", d)}"
  }

  /** Directed trade edges: supplier nation → customer nation, distinct,
    * self-loops excluded. One 5-way equi-join chain, then a distinct on
    * the 625-bounded pair domain. */
  private[graft] def tradeEdgesForTest(spark: SparkSession, dir: String): DataFrame =
    tradeEdges(spark, dir)

  // Session-cached (r13): pagerank and bfs_hops both pay this
  // fact-table join chain; the result is a ≤625-row pair domain.
  // Verify still measures the cold path (PlanCache off there).
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "trade_edges", dir) {
      graft.io.Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
        .join(t(spark, dir, "supplier").selectExpr("s_suppkey", "s_nationkey AS src"),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer").selectExpr("c_custkey", "c_nationkey AS dst"),
          col("o_custkey") === col("c_custkey"))
        .select("src", "dst").filter("src <> dst").distinct()
    }

  /** Fixed-depth PageRank readout: (nation, rank_pico, rank) ordered by
    * rank descending with the name tiebreak. */
  def nationPagerank(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint bounds the PLAN, not just the data (the
    // dedupClusters lesson): without it each unrolled iteration
    // re-expands the edge-extraction lineage — the audited plan had
    // 800+ operators including SIX separate lineitem⋈orders joins,
    // i.e. the fact table scanned once per reference instead of once.
    // Edges/outdeg are node²-bounded and each rank table is
    // node-sized, so the checkpoint itself is trivial; at real graph
    // scale this is persist()/checkpoint every few rounds, same idea.
    val edges = tradeEdges(spark, dir).transform(graft.ops.Checkpoints.cut)
    // No per-round cut here, unlike bfsHops/kCore's stride-2: ranks is
    // referenced TWICE per iteration (contrib + dangling), so the plan
    // doubles per uncut round — 2^3 is fine, 2^10 is not (ADVICE r13).
    // The assertion stops a future iteration bump from silently
    // reintroducing geometric plan re-expansion.
    assert(iterations <= 3,
      "nationPagerank unrolls 2^iterations plan copies; add a stride cut " +
        "(see bfsHops) before raising iterations past 3")
    val nodes = t(spark, dir, "nation").selectExpr("n_nationkey AS node")
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nNodes))
      .selectExpr("node", s"${intDiv(R.toString, "n_nodes", SparkD)} AS r")
    for (iter <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(broadcast(outdeg), Seq("src"))
        .selectExpr("dst", s"${intDiv("r", "outdeg", SparkD)} AS c")
      val incoming = contrib.groupBy("dst").agg(sum("c").as("m"))
      val dangling = ranks.join(broadcast(outdeg.withColumnRenamed("src", "node")),
          Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dangling"))
      ranks = nodes
        .join(incoming.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dangling)).crossJoin(broadcast(nNodes))
        .selectExpr("node",
          s"CAST(${nextRankExpr("coalesce(m, 0)", "dangling", "n_nodes", SparkD)} AS BIGINT) AS r")
    }
    ranks.join(t(spark, dir, "nation"), col("node") === col("n_nationkey"))
      .selectExpr("n_name AS nation", "r AS rank_pico",
        "CAST(r AS DOUBLE) / 1e12 AS rank")
      .orderBy(desc("rank_pico"), asc("nation"))
  }

  val nationPagerankOracle: String = {
    val d = DuckD
    def iter(prev: String, cur: String): String =
      s"""contrib_$cur AS (
            SELECT e.dst, ${intDiv("p.r", "o.outdeg", d)} AS c
            FROM edges e JOIN $prev p ON e.src = p.node
            JOIN outdeg o ON e.src = o.src),
          incoming_$cur AS (
            SELECT dst, sum(c) AS m FROM contrib_$cur GROUP BY dst),
          dangling_$cur AS (
            SELECT coalesce(sum(r), 0) AS dm FROM $prev p
            WHERE NOT EXISTS (SELECT 1 FROM outdeg o WHERE o.src = p.node)),
          $cur AS (
            SELECT n.node,
              CAST(${nextRankExpr("coalesce(i.m, 0)",
                "(SELECT dm FROM dangling_" + cur + ")",
                "(SELECT nn FROM n_nodes)", d)} AS BIGINT) AS r
            FROM nodes n LEFT JOIN incoming_$cur i ON n.node = i.dst)"""
    s"""WITH edges AS (
          SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE s.s_nationkey <> c.c_nationkey),
        nodes AS (SELECT n_nationkey AS node FROM nation),
        outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        n_nodes AS (SELECT count(*) AS nn FROM nodes),
        r0 AS (SELECT node, ${intDiv(R.toString, "(SELECT nn FROM n_nodes)", d)} AS r
               FROM nodes),
        ${iter("r0", "r1")},
        ${iter("r1", "r2")},
        ${iter("r2", "r3")}
        SELECT n.n_name AS nation, r3.r AS rank_pico,
          CAST(r3.r AS DOUBLE) / 1e12 AS rank
        FROM r3 JOIN nation n ON r3.node = n.n_nationkey
        ORDER BY rank_pico DESC, nation"""
  }

  // ---- k-core decomposition of the near-dup graph ----

  private val kcoreK = 2
  private val kcoreRounds = 8

  /** Generic k-core peeling, `rounds` rounds: repeatedly drop nodes
    * whose degree in the surviving induced subgraph is below k.
    * `edges` must be the symmetrized (both-directions) edge list.
    * Each round is two semi-joins (induce the subgraph) and one
    * map-side-combined degree count — join-shaped like PageRank, so it
    * scales as ordinary shuffles on the node key; every round ends in
    * an eager localCheckpoint so the plan stays one-round shallow (the
    * [[graft.llm.Dedup.propagateLabels]] lesson — an unrolled 8-round
    * lineage re-executes every prior round per action).
    *
    * Fixed-round contract: peeling a path graph can need O(n) rounds,
    * so a FIXED `rounds` is not universally the true k-core — but the
    * round count is part of the operator's definition here (both
    * engines run exactly the same rounds, so results always agree),
    * and `Round7Spec` pins that the fixture converges inside the
    * budget (one extra round changes nothing). At real scale you
    * iterate with a convergence check exactly like [[nationPagerank]]
    * / propagateLabels — same per-round plan. */
  private[graft] def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = edges.toDF("src", "dst").transform(graft.ops.Checkpoints.cut)
    var nodes = e.select(col("src").as("doc_id"), lit(0L).as("deg"))
      .distinct().transform(graft.ops.Checkpoints.cut)
    for (round <- 1 to rounds) {
      val induced = e
        .join(nodes.select(col("doc_id").as("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      nodes = induced.groupBy(col("src").as("doc_id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
      // r13: 2-round cut stride — same bounded-unroll trade as
      // [[bfsHops]] (nodes is referenced twice per round by the two
      // semi-joins; one uncut segment costs ≤4 node-grain copies over
      // the cut edge relation, and halves the materialization jobs)
      if (round % 2 == 0 || round == rounds)
        nodes = nodes.transform(graft.ops.Checkpoints.cutRound(_, round))
    }
    nodes.selectExpr("doc_id", "CAST(deg AS BIGINT) AS core_degree")
  }

  /** The 2-core of the MinHash near-dup pair graph: documents whose
    * duplication is STRUCTURAL (each has ≥ 2 surviving dup partners
    * after peeling hangers-on) — the template/boilerplate clumps worth
    * a human look, separated from incidental pairwise matches. Reuses
    * the shared pair relation; output is per-doc with its core degree. */
  def docKcore(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.llm.Dedup.minhashPairs(spark, dir).select("doc_a", "doc_b")
    val edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst")
      .unionAll(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
    kcore(edges, kcoreK, kcoreRounds).orderBy("doc_id")
  }

  /** Oracle: the identical peeling unrolled as a CTE chain over the
    * shared pair CTEs ([[graft.llm.Dedup.closureCtes]] re-yields
    * `edges(src, dst)`; its recursive tail goes unreferenced). */
  val docKcoreOracle: String = {
    val roundCtes = (1 to kcoreRounds).map { r =>
      val prev = if (r == 1) "knodes0" else s"knodes${r - 1}"
      s"""ke$r AS (SELECT e.src FROM edges e
            JOIN $prev a ON e.src = a.doc_id
            JOIN $prev b ON e.dst = b.doc_id),
          knodes$r AS (SELECT src AS doc_id, count(*) AS deg
                       FROM ke$r GROUP BY src HAVING count(*) >= $kcoreK)"""
    }.mkString(",\n        ")
    s"""WITH RECURSIVE ${graft.llm.Dedup.closureCtes},
        knodes0 AS (SELECT DISTINCT src AS doc_id FROM edges),
        $roundCtes
        SELECT doc_id, CAST(deg AS BIGINT) AS core_degree
        FROM knodes$kcoreRounds ORDER BY doc_id"""
  }

  // ---- multi-source BFS hop distances ----

  private val bfsRounds = 6

  /** Multi-source BFS kernel: per node, the lexicographic minimum of
    * (hop, source) over all seeds that reach it, packed as
    * combo = hop·100 + source (sources are nationkeys < 100, so BIGINT
    * min of the packed value IS the lexicographic min — no float, no
    * struct ordering). Each round relaxes every edge once: an equi-join
    * of edges against the frontier-so-far plus a min hash-agg — the
    * Pregel/Bellman-Ford shape that scales as ordinary node-key
    * shuffles. Rounds are fixed ([[kcore]]'s fixed-round contract:
    * both engines run the same rounds so results agree by
    * construction; `Round7Spec` pins that the fixture converges inside
    * the budget — at real scale you iterate with [[graft.llm.Dedup]]'s
    * monotone-checksum convergence test, and the packed combo is
    * monotone non-increasing, so the same trick applies verbatim). */
  private[graft] def bfsHops(edges: DataFrame, sources: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.toDF("src", "dst").transform(graft.ops.Checkpoints.cut)
    var dist = sources.selectExpr("node", "CAST(node AS BIGINT) AS combo")
      .transform(graft.ops.Checkpoints.cut)
    for (round <- 1 to rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst AS node", "combo + 100 AS combo")
      dist = dist.union(relaxed)
        .groupBy("node").agg(min("combo").as("combo"))
      // r13: cut every SECOND round instead of every round. The state
      // is referenced twice per round (carry + relax), so an uncut
      // segment doubles the replanned subtree — a 2-round stride
      // bounds that at 4 copies of node-grain work over the CUT edge
      // relation while halving the per-round materialization jobs
      // (measured: the cuts, not the 25-node data, were the wall).
      if (round % 2 == 0 || round == rounds)
        dist = dist.transform(graft.ops.Checkpoints.cutRound(_, round))
    }
    dist
  }

  /** Nearest-seed labeling of the trade graph: hop distance (and the
    * winning seed) from the region-0 nations along directed trade
    * edges — the "assign every node to its closest seed" pattern that
    * partitions a 100 TB graph around landmark vertices. Unreachable
    * nations surface with hop −1 (totality), seed NULL. */
  def nationBfsHops(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val nation = t(spark, dir, "nation")
    val sources = nation.filter(col("n_regionkey") === 0)
      .selectExpr("n_nationkey AS node")
    val dist = bfsHops(edges, sources, bfsRounds)
    nation.selectExpr("n_nationkey AS node", "n_name")
      .join(dist, Seq("node"), "left")
      .join(nation.selectExpr("n_nationkey AS src_key", "n_name AS nearest_seed"),
        expr("src_key = combo % 100"), "left")
      .selectExpr("n_name AS nation",
        "CAST(CASE WHEN combo IS NULL THEN -1 ELSE combo DIV 100 END AS BIGINT) AS hop",
        "nearest_seed")
      .orderBy("hop", "nation")
  }

  val nationBfsHopsOracle: String = {
    val iters = (1 to bfsRounds).map { r =>
      s"""d$r AS (SELECT node, min(combo) AS combo FROM (
            SELECT node, combo FROM d${r - 1}
            UNION ALL
            SELECT e.dst AS node, p.combo + 100 AS combo
            FROM edges e JOIN d${r - 1} p ON e.src = p.node) u
          GROUP BY node)"""
    }.mkString(",\n        ")
    s"""WITH edges AS (
          SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
          FROM lineitem l
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE s.s_nationkey <> c.c_nationkey),
        d0 AS (SELECT n_nationkey AS node, CAST(n_nationkey AS BIGINT) AS combo
               FROM nation WHERE n_regionkey = 0),
        $iters
        SELECT n.n_name AS nation,
          CAST(CASE WHEN d.combo IS NULL THEN -1 ELSE d.combo // 100 END AS BIGINT) AS hop,
          ns.n_name AS nearest_seed
        FROM nation n
        LEFT JOIN d$bfsRounds d ON n.n_nationkey = d.node
        LEFT JOIN nation ns ON ns.n_nationkey = d.combo % 100
        ORDER BY hop, nation"""
  }
}

