package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The arbitrary-stateful-processing V2 API (`transformWithState`,
  * Spark 4): typed per-key state handles on the RocksDB store — the
  * successor surface to the `flatMapGroupsWithState` sessionizer in
  * [[graft.streaming.Sessionize]]. The spec drives a running per-user
  * counter over the events fixture and asserts the final state equals
  * the batch groupBy — the stream/batch parity bar every stateful
  * operator in this repo clears. */
object TransformWithStateSpec {
  case class Ev(user_id: Long, event_id: Long)

  class RunningCount extends StatefulProcessor[Long, Ev, (Long, Long)] {
    @transient private var countState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[(Long, Long)] = {
      val n = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(n)
      Iterator.single((key, n))
    }
  }
}

class TransformWithStateSpec extends SparkSpec {
  import TransformWithStateSpec._

  test("transformWithState running counts == batch groupBy counts") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = graft.streaming.EventsStream.rawEventsStream(spark, sfTiny)
        .selectExpr("user_id", "event_id").as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new RunningCount, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events")
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      try q.processAllAvailable() finally q.stop()
      // update mode emits one row per key per micro-batch; the LAST
      // emission per key is its final running count
      val streamed = spark.table("tws_out")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val batch = graft.io.Tables.events(spark, sfTiny)
        .groupBy("user_id").count().orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.sameElements(batch))
    } finally spark.conf.set(providerKey, prev)
  }
}
