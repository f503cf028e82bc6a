package graft.io

import org.apache.spark.sql.DataFrame

/** S3/S4 sinks (SURVEY §2.1): snappy parquet, Hive-style partition
  * layout for downstream partition pruning.
  *
  * 100 TB deviation from the reference (SURVEY §4.2): the reference
  * rewrites the whole dataset every run (`mode=overwrite`); the
  * partitioned writer here defaults to *dynamic* partition overwrite so
  * a re-run replaces only the partitions present in the incoming batch
  * — the idempotency the reference wants without the full rewrite.
  */
object Writers {

  /** S3 — partitioned processed-zone write (01:96-101: y/m/d;
    * 03:117-122 etc.: y/m). */
  def processed(df: DataFrame, path: String, partitionCols: Seq[String],
                dynamicOverwrite: Boolean = true): Unit = {
    val mode = if (dynamicOverwrite) "dynamic" else "static"
    // REBALANCE on the partition columns before the partitioned write:
    // without it every upstream task writes one file into every
    // Hive partition it touches — tasks × partitions tiny files
    // (measured: 2538 files for a 31 MB zone; commit, recoverPartitions
    // and every later scan then pay per-file costs). The AQE rebalance
    // co-locates each partition's rows (→ one file per partition dir)
    // while still SPLITTING a skewed partition across tasks at the
    // advisory size, so a hot month at 100 TB doesn't serialize into
    // one writer — exactly the adaptive write-distribution trade
    // `repartition(cols)` alone gets wrong on skew.
    // per-WRITE option, not the session conf: a library function must
    // not flip a global knob — leaving `dynamic` set on the shared
    // session turned unrelated `INSERT OVERWRITE`s on v2 tables into
    // OverwritePartitionsDynamic plans they don't support
    df.hint("rebalance", partitionCols: _*)
      .write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .option("partitionOverwriteMode", mode)
      .option("compression", "snappy")
      .parquet(path)
  }

  /** S4 — unpartitioned curated-zone write (03:143-146). */
  def curated(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("compression", "snappy")
      .parquet(path)

  /** Small-file compaction — the maintenance pass every long-lived
    * zone needs: event-driven ingests (the reference re-runs a job per
    * S3 object) accrete thousands of tiny files, and at 100 TB scan
    * cost is dominated by file count, not bytes. Sizes the output file
    * count from the ACTUAL on-disk bytes of the file-backed leaves
    * (`FileIndex.sizeInBytes`) and rewrites at roughly
    * `targetFileBytes` per file. For a plan with no file-backed leaf
    * (e.g. an in-memory join) the planner's `stats.sizeInBytes` is a
    * default-huge estimate, not a measurement — falling back to it
    * naively would attempt `repartition(Int.MaxValue)`; instead the
    * fallback is clamped to `maxFiles`. Returns the chosen file count. */
  def compacted(df: DataFrame, path: String,
                targetFileBytes: Long = 128L * 1024 * 1024,
                maxFiles: Int = 10000): Int = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val fileBytes = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] =>
        lr.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
    }
    val bytes: BigInt =
      if (fileBytes.nonEmpty) BigInt(fileBytes.sum)
      else df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = (bytes.toDouble / targetFileBytes).ceil
      .max(1).min(maxFiles).toInt
    df.repartition(n)
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
    n
  }

  /** Clustered + sorted zone layout: hash-distribute by `clusterCol`
    * (co-locating each key's rows in one file) and sort rows WITHIN
    * each output file by `sortCols`. Two 100 TB effects, both from
    * layout alone: (1) parquet row-group min/max stats on the sort
    * columns become selective, so point/range reads skip row groups
    * (data skipping needs no index — just sorted runs); (2) runs of
    * similar values compress far better (delta/RLE encodings engage).
    * `repartition(col)` + `sortWithinPartitions` is the exact
    * DataFrame idiom — a global `orderBy` would add a pointless total
    * sort barrier; only per-file order matters for skipping. */
  def sortedZone(df: DataFrame, path: String, clusterCol: String,
                 sortCols: Seq[String], numFiles: Int = 0): Unit = {
    val c = org.apache.spark.sql.functions.col(clusterCol)
    // numFiles = 0 lets AQE size the shuffle (production default); an
    // explicit count pins the layout when file granularity is the point
    val clustered =
      if (numFiles > 0) df.repartition(numFiles, c) else df.repartition(c)
    clustered
      .sortWithinPartitions(sortCols.map(
        org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }
}
