package graft

import graft.streaming.EventsStream

/** Structured Streaming parity: the streaming hourly aggregation over
  * the events fixture must converge to the batch-equivalent result
  * (memory sink + processAllAvailable drives the file source to
  * completion synchronously). */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg == batch windowed agg on sf0.001") {
    val q = EventsStream.hourlyAggStream(spark, sfTiny)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly_out")
      .orderBy("window_start_s", "event_type").collect()
    val batch = EventsStream.hourlyAggBatch(spark, sfTiny).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("foreachBatch sink writes the partitioned processed zone from a stream") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val enriched = EventsStream.rawEventsStream(spark, sfTiny)
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
    val q = EventsStream.streamToProcessed(enriched, dir, Seq("year", "month")).start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(dir)
    val expected = graft.io.Tables.events(spark, sfTiny).count()
    assert(back.count() == expected)
    assert(new java.io.File(s"$dir/year=2024").isDirectory)
  }

  test("stream-stream interval join == batch attribution on sf0.001") {
    val q = EventsStream.purchaseAttributionStream(spark, sfTiny)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("attribution_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("attribution_out")
      .orderBy("purchase_id", "click_id").collect()
    val batch = EventsStream.purchaseAttributionBatch(spark, sfTiny).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }
}
