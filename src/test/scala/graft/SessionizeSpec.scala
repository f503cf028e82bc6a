package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessionState

/** Sessionization: pure fold logic, and streaming
  * flatMapGroupsWithState parity with the batch window construction. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("foldSessions: gap splits, continuation extends, state carries over") {
    val (closed, open) = Sessionize.foldSessions(None, Seq(0L, 100L, 2000L, 2100L, 10000L))
    assert(closed == Seq(SessionState(0, 100, 2), SessionState(2000, 2100, 2)))
    assert(open.contains(SessionState(10000, 10000, 1)))
    // continuation from existing state within gap
    val (c2, o2) = Sessionize.foldSessions(Some(SessionState(0, 100, 2)), Seq(1000L))
    assert(c2.isEmpty && o2.contains(SessionState(0, 1000, 3)))
  }

  test("streaming emits exactly the batch sessions, modulo each user's open tail") {
    val q = Sessionize.sessionsStream(spark, sfTiny)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sessions_out")
      .select("user_id", "session_start_s", "session_end_s", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = Sessionize.sessionsBatch(spark, sfTiny)
      .select("user_id", "session_seq", "session_start_s", "session_end_s", "n_events")
      .as[(Long, Long, Long, Long, Long)].collect()
    val batchAll = batch.map(r => (r._1, r._3, r._4, r._5)).toSet
    val lastSeq = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val closedByGap = batch.filter(r => r._2 < lastSeq(r._1))
      .map(r => (r._1, r._3, r._4, r._5)).toSet
    val openTails = batchAll -- closedByGap

    // Every emitted session is a true batch session; every gap-closed
    // session is emitted; only open tails may be withheld (or emitted
    // via event-time timeout, depending on micro-batch splits).
    assert(streamed.subsetOf(batchAll))
    assert(closedByGap.subsetOf(streamed))
    assert((batchAll -- streamed).subsetOf(openTails))
    assert(streamed.nonEmpty)
  }
}
