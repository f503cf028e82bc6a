package graft

import java.sql.Timestamp
import graft.streaming.EventsStream

/** The fixture arrives in event-time order, so its lateness audit is
  * an honest all-zeros — this spec drives the LATE branch with
  * crafted out-of-order arrivals and checks the drop set against the
  * streaming watermark definition by hand. */
class WatermarkLatenessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("out-of-order arrivals below the watermark are counted as late") {
    // arrival order = event_id; watermark = running max(ts) - 1h
    val rows = Seq(
      (1L, ts(0)),    // max 0
      (2L, ts(120)),  // max 120 -> watermark 60
      (3L, ts(50)),   // 50 < 60: LATE by 10 min
      (4L, ts(61)),   // 61 >= 60: on time
      (5L, ts(300)),  // max 300 -> watermark 240
      (6L, ts(239)),  // LATE by 1 min
      (7L, ts(240)),  // exactly at watermark: NOT late (strict <)
      (8L, ts(241)))
    val df = rows.toDF("event_id", "ts")
    val out = EventsStream.watermarkLatenessOf(df)
      .selectExpr("n_events", "n_late", "max_late_us")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sum == 8)
    assert(out.map(_._2).sum == 2, "exactly events 3 and 6 are late")
    assert(out.map(_._3).max == 10L * 60 * 1000000, "worst lateness 10 min")
  }

  test("in-order arrivals are never late (the fixture's honest zero)") {
    val df = (1L to 100L).map(i => (i, ts(i))).toDF("event_id", "ts")
    val out = EventsStream.watermarkLatenessOf(df)
      .selectExpr("sum(n_late)").as[Long].collect().head
    assert(out == 0)
  }
}
