package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.io.Tables

/** Sessionization of the events stream (30-minute inactivity gap).
  *
  * Batch form: the classic lag + cumulative-sum window construction —
  * fully relational, oracle-checkable, and the shape that scales (two
  * window passes over a user-partitioned shuffle, then one hash
  * aggregate; all integer arithmetic, so results are exact).
  *
  * Streaming form: `flatMapGroupsWithState` with event-time timeout —
  * the Spark-native custom-state operator (SURVEY §2.9 / the builder
  * north star). State per user is the open session; closed sessions are
  * emitted as they close, the open one on timeout. The unit spec drives
  * it with a single AvailableNow-style batch and checks it against the
  * batch form.
  */
object Sessionize {

  val gapSeconds = 1800L

  /** Batch sessionization; epoch seconds floor-truncated on both
    * engines (DuckDB's CAST would round). */
  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("s"))
    val byUser = Window.partitionBy("user_id").orderBy("s", "event_id")
    ev.withColumn("prev_s", lag(col("s"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull || col("s") - col("prev_s") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("s")).as("session_start_s"),
        max(col("s")).as("session_end_s"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_s", col("session_end_s") - col("session_start_s"))
      .orderBy("user_id", "session_seq")
  }

  val sessionsBatchOracle: String =
    s"""WITH ev AS (SELECT user_id, event_id,
            CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s FROM events),
        lagged AS (SELECT *, lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS prev_s
                   FROM ev),
        flags AS (SELECT *, CASE WHEN prev_s IS NULL OR s - prev_s > $gapSeconds
                                 THEN 1 ELSE 0 END AS is_new FROM lagged),
        sess AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
                 FROM flags)
        SELECT user_id, session_seq, min(s) AS session_start_s,
               max(s) AS session_end_s, count(*) AS n_events,
               max(s) - min(s) AS duration_s
        FROM sess GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq"""

  private val pathPrefix = 8
  private val pathTopK = 20

  /** Top user-journey paths: sessions rendered as ordered event-type
    * strings (first [[pathPrefix]] events — the prefix cap bounds the
    * key width on unbounded sessions), ranked by frequency — the
    * "what do sessions actually look like" readout behind funnel
    * design. Reuses the session assignment; the ordered path string
    * is assembled engine-agnostically (sort the (rank, type) pairs
    * inside the row, then join — Spark's collect_list is unordered by
    * contract, so the order lives in the DATA, not the aggregation).
    * Path keys are corpus-frequency-bounded; one hash agg ranks them. */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("s"))
    val byUser = Window.partitionBy("user_id").orderBy("s", "event_id")
    val sess = ev.withColumn("prev_s", lag(col("s"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_s").isNull || col("s") - col("prev_s") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val ranked = sess.withColumn("rk", row_number().over(
        Window.partitionBy("user_id", "session_seq").orderBy("s", "event_id")))
      .filter(col("rk") <= pathPrefix)
    val paths = ranked.groupBy("user_id", "session_seq")
      .agg(collect_list(struct(col("rk"), col("event_type").as("et"))).as("evs"))
      .selectExpr(
        "array_join(transform(array_sort(evs), p -> p.et), '>') AS path")
    paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(pathTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n_sessions"), asc("path"))).cast("long"))
      .select("rank", "path", "n_sessions")
      .orderBy("rank")
  }

  val topPathsOracle: String =
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
            CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s FROM events),
        lagged AS (SELECT *, lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS prev_s
                   FROM ev),
        flags AS (SELECT *, CASE WHEN prev_s IS NULL OR s - prev_s > $gapSeconds
                                 THEN 1 ELSE 0 END AS is_new FROM lagged),
        sess AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
                 FROM flags),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
                     ORDER BY s, event_id) AS rk FROM sess),
        paths AS (SELECT user_id, session_seq,
            string_agg(event_type, '>' ORDER BY rk) AS path
          FROM ranked WHERE rk <= $pathPrefix GROUP BY user_id, session_seq),
        top AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
                ORDER BY n_sessions DESC, path LIMIT $pathTopK)
        SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path) AS BIGINT) AS rank,
          path, n_sessions
        FROM top ORDER BY rank"""

  // ---- streaming form ----

  /** ts is carried (not just epoch seconds) because the watermarked
    * event-time column must reach the stateful operator's input. */
  case class Ev(user_id: Long, event_id: Long, s: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_s: Long,
                        session_end_s: Long, n_events: Long)

  /** Fold sorted event seconds into sessions; returns (closed, open). */
  def foldSessions(state: Option[SessionState], ss: Seq[Long])
  : (Seq[SessionState], Option[SessionState]) = {
    var open = state
    val closed = Seq.newBuilder[SessionState]
    ss.foreach { s =>
      open match {
        case Some(cur) if s - cur.end <= gapSeconds =>
          open = Some(cur.copy(end = s, n = cur.n + 1))
        case Some(cur) =>
          closed += cur
          open = Some(SessionState(s, s, 1))
        case None =>
          open = Some(SessionState(s, s, 1))
      }
    }
    (closed.result(), open)
  }

  private def onUser(userId: Long, rows: Iterator[Ev],
                     state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s =>
        SessionOut(userId, s.start, s.end, s.n)).iterator
      state.remove()
      out
    } else {
      val (closed, open) =
        foldSessions(state.getOption, rows.map(_.s).toSeq.sorted)
      open match {
        case Some(o) =>
          state.update(o)
          state.setTimeoutTimestamp(o.end * 1000 + gapSeconds * 1000)
        case None => state.remove()
      }
      closed.map(s => SessionOut(userId, s.start, s.end, s.n)).iterator
    }
  }

  /** ts type follows the fixture vintage — see [[Tables.normalizeTs]]. */
  private def eventsRawSchema(spark: SparkSession, dir: String): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", graft.io.Tables.eventsTsType(spark, dir)),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** Unbounded sessionization: closed sessions stream out as they
    * close; the per-user open session is bounded state with an
    * event-time timeout (watermark-driven), so state size is
    * O(active users) at any scale. */
  def sessionsStream(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    import spark.implicits._
    graft.io.Tables.normalizeTs(spark.readStream
      .schema(eventsRawSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("s"),
        col("ts"))
      .as[Ev]
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser)
  }
}
