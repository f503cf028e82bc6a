package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables

/** Structured Streaming over the events table: the reference's
  * "streaming" is event-driven micro-batch (S3 event → Lambda → Glue,
  * SURVEY §2.9); the Spark-native equivalent is a file-source stream
  * with watermarked windowed aggregation.
  *
  * [[hourlyAggBatch]] is the batch-equivalent query (oracle-checked in
  * SparkEntry); [[hourlyAggStream]] is the same logical aggregation as
  * a streaming plan — the unit spec runs it with a memory sink and
  * asserts it converges to the batch result.
  *
  * Scale notes: the windowed aggregation is a streaming hash aggregate
  * keyed on (window, event_type); the 1-hour watermark bounds state.
  * Money-style sums use the same cent-quantization as the batch layer.
  */
object EventsStream {

  /** Exact sum of a 2-decimal double as integer cents. */
  private def centSum(c: String) =
    (sum(round(col(c) * 100).cast("long")) / 100.0)

  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start_s", "event_type")

  val hourlyAggBatchOracle: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_s,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Raw parquet schema of events (ts as nano-long, matching the
    * nanosAsLong reader conf). */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The same aggregation as an unbounded streaming plan with a
    * watermark; drive it with Trigger.AvailableNow or
    * processAllAvailable over the fixture directory. */
  def hourlyAggStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a directory
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
}
