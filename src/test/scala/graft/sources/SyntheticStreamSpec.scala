package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The connector's micro-batch stream: exactly-once replay of the
  * ledger across admission-controlled batches, offset serde, and
  * pushdown composing with the streaming path. */
class SyntheticStreamSpec extends graft.SparkSpec {

  test("stream replays the ledger exactly once across rate-limited batches") {
    val q = spark.readStream.format(classOf[SyntheticSource].getName)
      .option("rows", "10000").option("slices", "4")
      .option("maxRowsPerBatch", "3000")
      .load()
      .writeStream.format("memory").queryName("synth_stream")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not finish")
    val r = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT id) AS nd,
           min(id) AS lo, max(id) AS hi, sum(value) AS sv
         FROM synth_stream""").head()
    val wantSum = (0L until 10000L).map(SyntheticSource.lcg).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((10000L, 10000L, 0L, 9999L, wantSum)))
    // admission control actually chunked the backlog: 10000 rows at
    // 3000/batch needs at least 4 data batches
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 4, s"expected >= 4 rate-limited batches, saw $dataBatches")
  }

  test("static filter pushdown composes with the stream") {
    val q = spark.readStream.format(classOf[SyntheticSource].getName)
      .option("rows", "10000").option("slices", "4")
      .load()
      .where(col("id") >= 9900L)
      .writeStream.format("memory").queryName("synth_stream_f")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val r = spark.sql(
      "SELECT count(*), min(id), max(id) FROM synth_stream_f").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((100L, 9900L, 9999L)))
  }

  test("offsets serialize as the plain watermark number") {
    val st = new SyntheticMicroBatchStream(0L, 100L, 4, Array("id"), 10L)
    assert(st.initialOffset().json() === "0")
    val adv = st.latestOffset(SyntheticOffset(40L), st.getDefaultReadLimit)
    assert(adv.asInstanceOf[SyntheticOffset].id === 50L)
    assert(st.deserializeOffset("50").asInstanceOf[SyntheticOffset].id === 50L)
    // final partial batch clamps at the table end
    val last = st.latestOffset(SyntheticOffset(95L), st.getDefaultReadLimit)
    assert(last.asInstanceOf[SyntheticOffset].id === 100L)
    // batch planning covers [start, end) exactly, in order
    val parts = st.planInputPartitions(SyntheticOffset(40L), SyntheticOffset(50L))
      .map(_.asInstanceOf[SyntheticPartition])
    assert(parts.map(_.start).min === 40L && parts.map(_.end).max === 50L)
  }
}
