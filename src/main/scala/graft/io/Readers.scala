package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/S2 sources (SURVEY §2.1).
  *
  * CSV reads take an explicit schema (never inferSchema — the
  * reference's `inferSchema=true` forces a full pre-scan per read,
  * 01:37 ×11 repo-wide; at 100 TB that doubles every ingest). Glob
  * paths work unchanged (`dir` may be a directory, a glob, or a single
  * file — Spark's FileIndex handles all three and parallelizes by
  * file/split).
  */
object Readers {

  /** S1 — header CSV with declared schema. */
  def csv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** S1 variant tagged with source-file provenance (S5, replacing
    * input_file_name with the `_metadata` column, reference 05:31-37). */
  def csvWithProvenance(spark: SparkSession, schema: StructType, path: String): DataFrame =
    csv(spark, schema, path)
      .withColumn("source_file",
        org.apache.spark.sql.functions.col("_metadata.file_path"))

  /** S2 — literal in-memory table with explicit schema (03:54-70). */
  def literal(spark: SparkSession, schema: StructType, rows: Seq[org.apache.spark.sql.Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)

  /** S1 hardening the reference lacks entirely (inferSchema silently
    * widens types around bad rows): PERMISSIVE read with malformed
    * lines captured in a quarantine column, so one bad upload can
    * neither fail a 100 TB ingest (FAILFAST) nor silently vanish
    * (DROPMALFORMED). Returns (clean rows, quarantined raw lines). */
  def csvQuarantined(spark: SparkSession, schema: StructType,
                     path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache() // corrupt-column reads require the same scan to see both sides
    val clean = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantined = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, quarantined)
  }
}
