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

  val IntervalKey = "spark.graft.checkpointInterval"

  /** Round-indexed cut for iterative loops: durable every
    * `spark.graft.checkpointInterval` rounds (default 1 = every
    * round), executor-local in between. The standard
    * checkpoint-interval trade — measured at sf0.1, every-round
    * durable costs +50 % on PageRank's many tiny rounds, and a K-round
    * interval bounds recomputation after an executor loss to at most
    * K−1 local rounds re-derived from the last durable state. The
    * FINAL round of any loop should still use [[cut]] so the result
    * the caller holds is always durable in durable mode. No-op
    * distinction when checkpointDir is unset (both paths are local). */
  def cutRound(df: DataFrame, round: Int): DataFrame = {
    val every = interval(df.sparkSession)
    if (every <= 1 || round % every == 0) cut(df)
    else df.localCheckpoint(true)
  }

  def interval(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption(IntervalKey).map(_.toInt).getOrElse(1)
}
