package graft

import org.apache.spark.sql.functions._

/** Durable-checkpoint mode for the iterative family (VERDICT r7 #1).
  *
  * `spark.graft.checkpointDir` flips every lineage cut in the engine
  * (graft.ops.Checkpoints.cut) from executor-local `localCheckpoint` to
  * reliable `checkpoint()` into fault-tolerant storage. The contract:
  * results are BIT-IDENTICAL either way — the mode changes failure
  * recovery, never answers — and the durable run actually writes RDD
  * state under the configured directory (so on a real cluster, a lost
  * executor's blocks are re-readable instead of fatal).
  */
class CheckpointDurabilitySpec extends SparkSpec {

  private def withDurable[A](body: String => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(graft.ops.Checkpoints.ConfKey, dir)
    try body(dir)
    finally spark.conf.unset(graft.ops.Checkpoints.ConfKey)
  }

  private def countFiles(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
  }

  test("label propagation is bit-identical under reliable checkpoint and writes state") {
    import spark.implicits._
    // A 3-component graph incl. an 8-node chain (needs >1 round).
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (20L, 21L), (21L, 22L),
      (30L, 31L)).toDF("doc_a", "doc_b")
    val local = graft.llm.Dedup.propagateLabels(pairs)
      .orderBy("doc_id").collect().toSeq
    val (durable, files) = withDurable { dir =>
      (graft.llm.Dedup.propagateLabels(pairs)
        .orderBy("doc_id").collect().toSeq,
       countFiles(dir))
    }
    assert(durable === local)
    assert(files > 0, "reliable checkpoint wrote no files under checkpointDir")
    // And the labeling itself is the expected fixpoint.
    assert(durable.map(r => (r.getLong(0), r.getLong(1))).forall {
      case (d, c) => if (d <= 8) c == 1L else if (d <= 22) c == 20L else c == 30L
    })
  }

  test("checkpoint interval K: identical results, durable final state") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val local = graft.llm.Dedup.propagateLabels(pairs)
      .orderBy("doc_id").collect().toSeq
    val prLocal = graft.sql.Graph.nationPagerank(spark, sfTiny).collect().toSeq
    withDurable { dir =>
      spark.conf.set(graft.ops.Checkpoints.IntervalKey, "3")
      try {
        // Intermediate rounds are local, every 3rd + the returned
        // relation durable — results bit-identical, and durable state
        // still lands under the dir (the K-bounded recomputation
        // contract: executor loss re-derives at most K-1 local rounds).
        assert(graft.llm.Dedup.propagateLabels(pairs)
          .orderBy("doc_id").collect().toSeq === local)
        assert(graft.sql.Graph.nationPagerank(spark, sfTiny)
          .collect().toSeq === prLocal)
        assert(countFiles(dir) > 0)
      } finally spark.conf.unset(graft.ops.Checkpoints.IntervalKey)
    }
  }

  test("PageRank and BFS are bit-identical under reliable checkpoint") {
    val prLocal = graft.sql.Graph.nationPagerank(spark, sfTiny).collect().toSeq
    val bfsLocal = graft.sql.Graph.nationBfsHops(spark, sfTiny).collect().toSeq
    withDurable { _ =>
      assert(graft.sql.Graph.nationPagerank(spark, sfTiny).collect().toSeq === prLocal)
      assert(graft.sql.Graph.nationBfsHops(spark, sfTiny).collect().toSeq === bfsLocal)
    }
  }
}
