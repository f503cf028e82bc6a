package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming deduplication with bounded state:
  * dropDuplicatesWithinWatermark keeps only watermark-lifetime state
  * (vs unbounded dropDuplicates) — the streaming form of P10 at scale. */
class StreamingDedupSpec extends SparkSpec {

  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("streaming dedup on (user_id, event_type) emits no duplicate keys per window") {
    val q = spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfTiny)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("event_id", "user_id", "event_type")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.table("dedup_out")
    val n = out.count()
    val batchTotal = graft.io.Tables.events(spark, sfTiny).count()
    // dedup must reduce the stream and never emit more than the input
    assert(n > 0 && n < batchTotal)
    // within any single emitted batch there are at most (users x types)
    // keys alive per watermark window; sanity: every (user, type) pair
    // appears far fewer times than its raw frequency
    val rawPairs = graft.io.Tables.events(spark, sfTiny)
      .groupBy("user_id", "event_type").count().agg(max("count")).head().getLong(0)
    val dedupPairs = out.groupBy("user_id", "event_type").count()
      .agg(max("count")).head().getLong(0)
    assert(dedupPairs < rawPairs)
  }
}
