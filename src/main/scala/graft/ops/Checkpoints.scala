package graft.ops

import org.apache.spark.sql.DataFrame

/** One policy point for every lineage cut in the engine.
  *
  * The iterative operators (label propagation, PageRank, BFS, k-core,
  * BPE training) truncate lineage each round so the plan stays
  * one-round shallow instead of geometrically re-expanding. HOW the cut
  * is materialized is a deployment decision, not an operator decision:
  *
  *   - `localCheckpoint(eager = true)` (the default here) stores blocks
  *     in executor storage WITHOUT lineage. Fast — no DFS round-trip —
  *     but on a multi-executor cluster a single lost executor loses
  *     blocks that can never be recomputed, killing a propagation that
  *     may be hours in. Correct for local[?] and for clusters with
  *     reliable node decommissioning only.
  *   - reliable `checkpoint()` writes the RDD to the fault-tolerant
  *     checkpoint directory (HDFS/S3); executor loss is survivable
  *     because every round's state is re-readable from storage. This is
  *     the 100 TB mode.
  *
  * Setting `spark.graft.checkpointDir` switches EVERY cut in the engine
  * to the reliable path — the conf is read per call, so a session can
  * flip modes between jobs. Results are bit-identical either way (both
  * cuts are pure materializations; see `CheckpointDurabilitySpec`),
  * so correctness never depends on the mode — only failure recovery
  * does.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  /** Eagerly materialize `df` and return a lineage-free frame.
    *
    * With `spark.graft.checkpointDir` set: reliable `checkpoint()` into
    * that directory (set on the SparkContext on first use; a changed
    * conf value re-points it). Otherwise: eager `localCheckpoint`.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir appends a UUID subdir per call; only re-set
        // when the configured root actually changed, else every cut
        // would scatter rounds across fresh subdirs (harmless but
        // messy, and it defeats any external cleanup-by-prefix).
        val current = sc.getCheckpointDir
        if (!current.exists(_.startsWith(
            new org.apache.hadoop.fs.Path(dir).toString)))
          sc.setCheckpointDir(dir)
        df.checkpoint() // eager reliable checkpoint
      case None =>
        df.localCheckpoint(true)
    }
  }
}
