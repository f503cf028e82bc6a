package graft

import graft.streaming.EventsStream

/** Invariants for the forward-fill, sliding-window, and histogram
  * operators that the oracle equality can't express on its own. */
class WindowOpsSpec extends SparkSpec {

  test("carry-forward: null before first purchase, then sticky until the next") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_locf").toString
    // nanos-long ts, matching the fixture's physical schema
    val sec = 1000000000L
    Seq(
      (1L, 1L * sec, 7L, "view", 1.0, "{}"),
      (2L, 2L * sec, 7L, "purchase", 10.0, "{}"),
      (3L, 3L * sec, 7L, "view", 2.0, "{}"),
      (4L, 4L * sec, 7L, "purchase", 20.0, "{}"),
      (5L, 5L * sec, 7L, "click", 3.0, "{}"),
      (6L, 1L * sec, 8L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsStream.purchaseCarryForward(spark, dir)
      .select("event_id", "carried_purchase").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(1L).isEmpty, "no purchase seen yet")
    assert(got(2L).contains(10.0), "a purchase carries its own value")
    assert(got(3L).contains(10.0), "carried across later events")
    assert(got(4L).contains(20.0), "replaced by the next purchase")
    assert(got(5L).contains(20.0))
    assert(got(6L).isEmpty, "fills never leak across users")
  }

  test("sliding windows: 4x coverage, and hour-aligned slices equal the tumbling agg") {
    val sliding = EventsStream.slidingWindowAgg(spark, sfTiny)
      .select("window_start_s", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val raw = graft.io.Tables.events(spark, sfTiny).count()
    assert(sliding.map(_._3).sum == 4 * raw,
      "every event must appear in exactly duration/slide = 4 windows")
    // a sliding window that starts on an exact hour covers the same
    // events as the tumbling hourly window — the two operators must
    // agree on that shared slice bit-for-bit
    val tumbling = EventsStream.hourlyAggBatch(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val aligned = sliding.filter(_._1 % 3600 == 0)
    assert(aligned.sortBy(t => (t._1, t._2)).sameElements(
      tumbling.sortBy(t => (t._1, t._2))))
  }

  test("histogram: buckets cover every row once and shares sum to one") {
    val h = graft.ops.Profile.priceHistogram(spark, sfTiny)
      .select("bucket", "n_rows", "share").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(h.length == 22)
    assert(h.map(_._2).sum == graft.io.Tables.lineitem(spark, sfTiny).count())
    assert(math.abs(h.map(_._3).sum - 1.0) < 1e-9)
    assert(h.map(_._1).sameElements(0L until 22L))
  }
}
