package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 (second half) — persistent catalog registration, the engine-side
  * analogue of the reference's post-job Glue-crawler refresh
  * (`lambda/blinkit-etl-orchestrator.py:83-97`): after a zone is
  * written, register it in the session catalog so every downstream
  * query reads it BY NAME instead of by path.
  *
  * Two registration forms mirror the two zones:
  *  - the curated zone is saved as a MANAGED parquet table
  *    (`saveAsTable` into the warehouse dir);
  *  - the processed zone — already written partitioned by the S3-style
  *    writer — is registered as an EXTERNAL table over its path, then
  *    `recoverPartitions` discovers the Hive-layout partitions from the
  *    directory tree, which is literally what the crawler does.
  *
  * At 100 TB both operations are metadata-only (no data movement): the
  * catalog entry is what lets Catalyst prune partitions by name-level
  * predicates across sessions.
  *
  * Durability note: these calls target whatever external catalog the
  * session was built with. The test environment uses the in-memory
  * catalog (one per SparkContext — Spark's SharedState holds a single
  * ExternalCatalog per JVM, so suites can't mix implementations); in
  * production, build the session with `enableHiveSupport()` (the
  * hive-metastore + derby jars ship with Spark) or a JDBC-backed
  * metastore and the SAME code paths persist across applications —
  * the API surface is catalog-implementation-agnostic.
  */
object Catalog {

  /** Curated zone → managed table (crawler's "create table" path). */
  def saveManaged(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(name)

  /** Processed zone → external table over an existing partitioned
    * path + partition recovery (crawler's "update partitions" path). */
  def registerExternal(spark: SparkSession, name: String, path: String): Unit = {
    registerExternalUnpartitioned(spark, name, path)
    spark.catalog.recoverPartitions(name)
  }

  /** Unpartitioned external zone (e.g. a curated table written by
    * [[Writers.curated]] that should stay at its path rather than be
    * copied into the warehouse) — registration without the partition
    * recovery step, which Spark rejects on unpartitioned tables. */
  def registerExternalUnpartitioned(spark: SparkSession, name: String,
                                    path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(s"CREATE TABLE `$name` USING parquet LOCATION '$path'")
  }
}
