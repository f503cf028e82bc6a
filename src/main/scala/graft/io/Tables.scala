package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers over the driver-generated parquet corpus
  * (TESTDATA.md). One parquet file per table under `sfDir`.
  *
  * At 100 TB these would be multi-file partitioned datasets; the read
  * path is identical (`spark.read.parquet(dir)`), and all downstream
  * pipelines rely on Catalyst column pruning + filter pushdown into the
  * parquet scan rather than eager materialization, so nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Raw scan (keeps the `_metadata` hidden column resolvable). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The fixture tables are single-file / single-row-group parquet, so
    * the scan is one task and every pre-shuffle projection would run
    * single-threaded. A round-robin repartition right after the scan
    * restores parallelism for the compute-heavy per-row work (hashing,
    * shingling, dot products). On a real multi-file 100 TB dataset the
    * scan itself provides the parallelism and this becomes a no-op
    * choice — the repartition is the local-fixture mitigation, not the
    * scale design. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  // dimension-sized tables skip the spread: their downstream ops either
  // broadcast or shuffle anyway, and the extra exchange is pure cost
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = spread(table(spark, d, "orders"))
  def lineitem(spark: SparkSession, d: String): DataFrame = spread(table(spark, d, "lineitem"))

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this reader
    * converts the nano-long to a microsecond timestamp (integer `div`,
    * no double round-trip — nanos exceed 2^53). No spread: the events
    * pipelines shuffle at their first dedup/join/agg anyway (measured
    * net loss with it). */
  def events(spark: SparkSession, d: String): DataFrame =
    table(spark, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

  def documents(spark: SparkSession, d: String): DataFrame =
    spread(table(spark, d, "documents"))
  def embeddings(spark: SparkSession, d: String): DataFrame =
    spread(table(spark, d, "embeddings"))
}
