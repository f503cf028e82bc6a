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

  case class TypedEv(user_id: Long, event_type: String)

  /** MapState tier: per-user map of event_type → running count; each
    * batch re-emits the touched entries flattened to rows (maps never
    * leave the operator raw — entry order is engine-dependent). */
  class TypeCounts
      extends StatefulProcessor[Long, TypedEv, (Long, String, Long)] {
    @transient private var m: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      m = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[TypedEv],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      val touched = scala.collection.mutable.Set[String]()
      rows.foreach { e =>
        val n = (if (m.containsKey(e.event_type)) m.getValue(e.event_type)
          else 0L) + 1L
        m.updateValue(e.event_type, n)
        touched += e.event_type
      }
      touched.iterator.map(t => (key, t, m.getValue(t))).toList.iterator
    }
  }

  case class TimedEv(user_id: Long, ts: java.sql.Timestamp)

  /** Event-time timer tier: count rows per key; the first row arms a
    * timer 10 s after its event time; when the WATERMARK passes it,
    * handleExpiredTimer emits the (key, count) summary exactly once —
    * the idle-key flush every TTL'd session store needs. */
  class TimerSummary
      extends StatefulProcessor[Long, TimedEv, (Long, Long, Boolean)] {
    @transient private var countState: ValueState[Long] = _
    @transient private var armed: ValueState[Boolean] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      countState = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Boolean](
        "armed", Encoders.scalaBoolean, TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[TimedEv],
        timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
      var n = if (countState.exists()) countState.get() else 0L
      var maxTs = Long.MinValue
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      countState.update(n)
      if (!armed.exists() || !armed.get()) {
        getHandle.registerTimer(maxTs + 10000L)
        armed.update(true)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[(Long, Long, Boolean)] =
      Iterator.single((key, countState.get(), true))
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

  test("transformWithState MapState per-user type counts == batch counts") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = graft.streaming.EventsStream.rawEventsStream(spark, sfTiny)
        .selectExpr("user_id", "event_type").as[TypedEv]
        .groupByKey(_.user_id)
        .transformWithState(new TypeCounts, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n")
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_map_out").start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("tws_map_out")
        .groupBy("user_id", "event_type")
        .agg(org.apache.spark.sql.functions.max("n").as("n"))
        .orderBy("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val batch = graft.io.Tables.events(spark, sfTiny)
        .groupBy("user_id", "event_type").count()
        .orderBy("user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.sameElements(batch))
    } finally spark.conf.set(providerKey, prev)
  }

  test("transformWithState event-time timer flushes idle keys exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Long)] // (user, epoch seconds)
      val q = in.toDF().toDF("user_id", "sec")
        .selectExpr("user_id", "CAST(sec AS TIMESTAMP) AS ts")
        .withWatermark("ts", "0 seconds")
        .as[TimedEv]
        .groupByKey(_.user_id)
        .transformWithState(new TimerSummary, TimeMode.EventTime(),
          OutputMode.Append())
        .toDF("user_id", "n_events", "flushed")
        .writeStream.outputMode("append")
        .format("memory").queryName("tws_timer_out").start()
      try {
        // batch 1: u1 ×2 (timer armed at 1010+10), u2 ×1 (1005+10)
        in.addData((1L, 1000L), (1L, 1010L), (2L, 1005L))
        q.processAllAvailable()
        // batch 2: u3 advances the watermark to 2000; the engine then
        // runs a no-data batch whenever the watermark moves, exactly
        // so due event-time timers fire — u1 (1020) and u2 (1015) flush
        in.addData((3L, 2000L))
        q.processAllAvailable()
        // batch 3: a later u3 row pushes the watermark past u3's own
        // timer (2010); the follow-up no-data batch flushes u3 too
        in.addData((3L, 3000L))
        q.processAllAvailable()
      } finally q.stop()
      // EXACTLY one flush row per key, each carrying the full count —
      // never zero (lost timer) and never two (re-fired timer)
      val flushed = spark.table("tws_timer_out").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(flushed.toSeq == Seq((1L, 2L, true), (2L, 1L, true), (3L, 2L, true)),
        s"got ${flushed.toSeq}")
    } finally spark.conf.set(providerKey, prev)
  }
}
