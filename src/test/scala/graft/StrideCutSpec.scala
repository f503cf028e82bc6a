package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sql.Graph

/** Stride-2 checkpoint equivalence (VERDICT r13 #8): the r13 change
  * that cuts loop state every SECOND round (bfsHops, kcore, the
  * distributed markov loop) is a PLAN-SIZE trade only — a
  * localCheckpoint is a materialization barrier, never arithmetic.
  * These fixtures pin the strided engine loops bit-identical to a
  * per-round-cut replica of the same recurrence, so the next optimizer
  * cannot silently widen a stride on a loop whose round count has
  * become data-dependent (a convergence loop replayed from an uncut
  * lineage re-executes prior rounds nondeterministically under
  * retries; a fixed-round loop does not care — this spec is the fence
  * between those two regimes). */
class StrideCutSpec extends SparkSpec {

  // a directed graph with a cycle, a dangling chain and an island,
  // so BFS relaxation and k-core peeling both do nontrivial work
  private lazy val edgeRows = Seq(
    (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
    (4L, 5L), (5L, 3L), (1L, 4L), (6L, 7L), (7L, 6L),
    (8L, 0L), (0L, 8L), (8L, 2L))

  private def edges: DataFrame = {
    import spark.implicits._
    edgeRows.toDF("src", "dst")
  }

  test("bfsHops stride-2 equals a per-round-cut replica") {
    import spark.implicits._
    val sources = Seq(0L, 6L).toDF("node")
    val rounds = 6
    val engine = Graph.bfsHops(edges, sources, rounds)
      .orderBy("node").collect().toSeq

    // replica: identical recurrence, cut EVERY round
    val e = edges.transform(graft.ops.Checkpoints.cut)
    var dist = sources.selectExpr("node", "CAST(node AS BIGINT) AS combo")
      .transform(graft.ops.Checkpoints.cut)
    for (round <- 1 to rounds) {
      val relaxed = e
        .join(dist.withColumnRenamed("node", "src"), Seq("src"))
        .selectExpr("dst AS node", "combo + 100 AS combo")
      dist = dist.union(relaxed)
        .groupBy("node").agg(min("combo").as("combo"))
        .transform(graft.ops.Checkpoints.cutRound(_, round))
    }
    val replica = dist.orderBy("node").collect().toSeq
    assert(engine == replica)
  }

  test("kcore stride-2 equals a per-round-cut replica") {
    val sym = edges.unionAll(edges.selectExpr("dst AS src", "src AS dst"))
    val k = 2
    val rounds = 6
    val engine = Graph.kcore(sym, k, rounds)
      .orderBy("doc_id").collect().toSeq

    val e = sym.toDF("src", "dst").transform(graft.ops.Checkpoints.cut)
    var nodes = e.select(col("src").as("doc_id"), lit(0L).as("deg"))
      .distinct().transform(graft.ops.Checkpoints.cut)
    for (round <- 1 to rounds) {
      val induced = e
        .join(nodes.select(col("doc_id").as("src")), Seq("src"), "left_semi")
        .join(nodes.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      nodes = induced.groupBy(col("src").as("doc_id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .transform(graft.ops.Checkpoints.cutRound(_, round))
    }
    val replica = nodes
      .selectExpr("doc_id", "CAST(deg AS BIGINT) AS core_degree")
      .orderBy("doc_id").collect().toSeq
    assert(engine == replica)
  }
}
