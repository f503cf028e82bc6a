package graft

import graft.streaming.EventsStream

/** Structured Streaming parity: the streaming hourly aggregation over
  * the events fixture must converge to the batch-equivalent result
  * (memory sink + processAllAvailable drives the file source to
  * completion synchronously). */
class StreamingSpec extends SparkSpec {

  test("AvailableNow resumes from its checkpoint: old files are never reprocessed") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    val schema = new StructType().add("id", LongType).add("s", StringType)

    // one AvailableNow pass; returns how many rows this RUN processed
    // (the exactly-once contract: a resumed run must pay only for the
    // files that appeared since the last checkpoint commit — at 100 TB
    // re-listing is survivable, re-READING the zone is not)
    def run(): Long = {
      var processed = 0L
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.outputMode("append")
        .foreachBatch { (b: DataFrame, _: Long) =>
          processed += b.count()
          b.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
      processed
    }

    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(in)
    assert(run() == 2)
    Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(in)
    assert(run() == 3, "resumed run must process ONLY the new file")
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L, 5L))
    assert(run() == 0, "a no-new-data run must process nothing")
  }

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

  test("stream-static broadcast join == batch join on sf0.001") {
    // the enrichment shape: a streaming fact joined to a static
    // broadcast dim needs no state and no watermark — the static side
    // is just a local relation in every micro-batch plan
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dim = Seq(("purchase", "rev"), ("refund", "rev"),
      ("view", "eng"), ("click", "eng"), ("cart_add", "eng"))
      .toDF("event_type", "bucket")
    val streamed = {
      val q = EventsStream.rawEventsStream(spark, sfTiny)
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("static_join_out").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("static_join_out").orderBy("bucket").collect()
    }
    val batch = graft.io.Tables.events(spark, sfTiny)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("streaming sliding-window agg == batch sliding agg on sf0.001") {
    val q = EventsStream.slidingWindowStream(spark, sfTiny)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sliding_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sliding_out")
      .orderBy("window_start_s", "event_type").collect()
    val batch = EventsStream.slidingWindowAgg(spark, sfTiny).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("streaming session_window == batch session_window on sf0.001") {
    val q = EventsStream.sessionWindowStream(spark, sfTiny)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("session_win_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_win_out")
      .orderBy("user_id", "session_start_us").collect()
    val batch = EventsStream.sessionWindows(spark, sfTiny).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.sameElements(batch))
  }

  test("VARIANT extraction runs inside a streaming query == batch result") {
    // the VARIANT path (try_parse_json → variant_get) is a per-row
    // projection, so it must be streamable with zero semantic drift —
    // the third JSON tier alongside get_json_object (string) and
    // from_json (typed struct), all three asserted equal here
    import spark.implicits._
    val streamed = {
      val q = EventsStream.rawEventsStream(spark, sfTiny)
        .selectExpr("event_type",
          "variant_get(try_parse_json(props), '$.k', 'bigint') AS k")
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.sum("k").as("sum_k"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("var_stream_out").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("var_stream_out").orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1)))
    }
    val ev = graft.io.Tables.events(spark, sfTiny)
    def agg(kExpr: String) = ev
      .selectExpr("event_type", s"$kExpr AS k")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.sum("k").as("sum_k"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val viaVariant = agg("variant_get(try_parse_json(props), '$.k', 'bigint')")
    val viaString = agg("CAST(get_json_object(props, '$.k') AS BIGINT)")
    val viaStruct = agg(
      "CAST(from_json(props, 'k BIGINT').k AS BIGINT)")
    assert(streamed.length > 0)
    assert(streamed.sameElements(viaVariant))
    assert(viaVariant.sameElements(viaString), "variant tier != string tier")
    assert(viaVariant.sameElements(viaStruct), "variant tier != struct tier")
  }

  test("idempotent foreachBatch sink survives a batch replay; append sink does not") {
    // Exactly-once for foreachBatch is the SINK's job: after a crash
    // between sink write and checkpoint commit, the engine re-delivers
    // the same (batchId, data) — a sink keyed by batchId (overwrite of
    // batch=<id>/) absorbs the replay; a blind append double-counts.
    // This is the other half of the CDC fold property in RefreshSpec:
    // that one proves state composition, this one proves re-delivery
    // safety.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_replay").toString
    val idem = s"$root/idem"; val naive = s"$root/naive"
    val replayable =
      scala.collection.mutable.Map[Long, Seq[(Long, Long)]]()
    def writeIdem(rows: Seq[(Long, Long)], id: Long): Unit =
      rows.toDF("k", "cents").write.mode("overwrite")
        .parquet(s"$idem/batch=$id")
    def writeNaive(rows: Seq[(Long, Long)], id: Long): Unit =
      rows.toDF("k", "cents").write.mode("append").parquet(naive)

    val in = MemoryStream[(Long, Long)]
    val q = in.toDF().toDF("k", "cents")
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        replayable(id) = rows
        writeIdem(rows, id)
        writeNaive(rows, id)
      }.start()
    try {
      in.addData((1L, 100L), (2L, 200L)); q.processAllAvailable()
      in.addData((1L, 300L)); q.processAllAvailable()
    } finally q.stop()

    def total(path: String): Long =
      spark.read.parquet(path).agg(
        org.apache.spark.sql.functions.sum("cents")).head().getLong(0)
    val before = total(idem)
    assert(before == 600L && total(naive) == 600L)

    // crash-replay of the LAST committed batch, as the engine would
    val lastId = replayable.keys.max
    writeIdem(replayable(lastId), lastId)
    writeNaive(replayable(lastId), lastId)
    assert(total(idem) == before, "batchId-keyed overwrite must absorb replay")
    assert(total(naive) == before + 300L,
      "the naive append sink double-counts on replay — the hazard the " +
        "idempotent layout exists to remove")
  }
}
