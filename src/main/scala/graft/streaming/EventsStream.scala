package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.Tables

/** Structured Streaming over the events table: the reference's
  * "streaming" is event-driven micro-batch (S3 event → Lambda → Glue,
  * SURVEY §2.9); the Spark-native equivalent is a file-source stream
  * with watermarked windowed aggregation.
  *
  * [[hourlyAggBatch]] is the batch-equivalent query (oracle-checked in
  * SparkEntry); [[hourlyAggStream]] is the same logical aggregation as
  * a streaming plan — the unit spec runs it with a memory sink and
  * asserts it converges to the batch result.
  *
  * Scale notes: the windowed aggregation is a streaming hash aggregate
  * keyed on (window, event_type); the 1-hour watermark bounds state.
  * Money-style sums use the same cent-quantization as the batch layer.
  */
object EventsStream {

  /** Exact sum of a 2-decimal double as integer cents. */
  private def centSum(c: String) =
    (sum(round(col(c) * 100).cast("long")) / 100.0)

  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start_s", "event_type")

  val hourlyAggBatchOracle: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_s,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
       FROM events GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Robust anomaly flagging over the hourly event counts: per type,
    * hours whose count deviates from the type's median by more than
    * 3 MADs (median absolute deviation) are flagged — the
    * outlier-resistant alternative to mean/stddev z-scores (one bad
    * hour inflates a stddev but barely moves a median). The MAD floor
    * of 0.5 keeps the all-quiet (MAD = 0) case from flagging every
    * hour.
    *
    * Plan shape at scale: the only big shuffle is the (window, type)
    * hash agg over raw events (map-side combined); both median
    * relations are per-type rows — broadcast back — and exact
    * percentile is computed over hours-per-type, thousands of rows,
    * not raw events. Interpolated percentile over integer counts and
    * half-integer deviations is binary-fraction arithmetic, so the
    * doubles are cross-engine exact (the category-quartiles pairing). */
  def hourlyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val h = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n"))
    val med = h.groupBy("event_type")
      .agg(expr("percentile(n, 0.5)").as("med"))
    val dev = h.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("n") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .selectExpr("event_type", "window_start_s", "n", "med", "mad",
        "CAST(CASE WHEN dev > 3 * greatest(mad, CAST(0.5 AS DOUBLE)) " +
          "THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly")
      .orderBy("event_type", "window_start_s")
  }

  val hourlyAnomalyOracle: String =
    """WITH h AS (SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start_s,
            event_type, count(*) AS n FROM events GROUP BY 1, 2),
        m AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM h GROUP BY 1),
        d AS (SELECT h.*, m.med, abs(h.n - m.med) AS dev
              FROM h JOIN m USING (event_type)),
        m2 AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        SELECT d.event_type, d.window_start_s, d.n, d.med, m2.mad,
          CAST(CASE WHEN d.dev > 3 * greatest(m2.mad, CAST(0.5 AS DOUBLE))
            THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
        FROM d JOIN m2 USING (event_type)
        ORDER BY d.event_type, d.window_start_s"""

  /** First-order transition matrix over each user's event stream: for
    * every consecutive (prev → next) event-type pair (per user,
    * ordered by time with event_id as the total-order tiebreak), the
    * transition count and the row-normalized probability — the
    * behavioral summary session-model features are built from. Plan
    * shape: one window lag keyed by user_id (the same shuffle every
    * sessionization pays), then a hash agg onto the tiny type×type
    * grid; the probability is one division over the per-prev window
    * on that grid. Integer counts → exact doubles. */
  /** (a, b, n_ab) adjacent-type transition counts — the per-user lag
    * window plus one hash agg, session-cached (r13): typeTransitions
    * and markovStationary compute the identical relation. Verify
    * still measures the cold path (PlanCache off there). */
  private def transCounts(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "event_trans", dir) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type").as("a"), col("event_type").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .transform(graft.ops.Checkpoints.cut)
    }

  def typeTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    transCounts(spark, dir)
      .selectExpr("a AS prev_type", "b AS next_type",
        "n_ab AS n_transitions")
      .withColumn("p_transition",
        col("n_transitions") /
          sum(col("n_transitions")).over(Window.partitionBy("prev_type"))
            .cast("double"))
      .orderBy("prev_type", "next_type")
  }

  val typeTransitionsOracle: String =
    """WITH s AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events),
        g AS (SELECT prev_type, event_type AS next_type,
                count(*) AS n_transitions
              FROM s WHERE prev_type IS NOT NULL
              GROUP BY prev_type, event_type)
        SELECT prev_type, next_type, n_transitions,
          n_transitions / CAST(sum(n_transitions)
            OVER (PARTITION BY prev_type) AS DOUBLE) AS p_transition
        FROM g ORDER BY prev_type, next_type"""

  /** Rolling 7-day totals over the daily event aggregate — the RANGE
    * window-frame form (value-based bounds over epoch seconds), which
    * unlike a ROWS frame stays correct when days are missing from the
    * series. Plan shape: raw events die in the per-day map-side agg;
    * the window runs over one row per day, so the unpartitioned
    * ordered frame is bounded by the calendar, not the data (at
    * multi-tenant scale you'd partition the window by tenant). All
    * sums are integer (counts + cents), so rolling totals are exact. */
  def rolling7d(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.orderBy("day_s").rangeBetween(-6L * 86400, 0)
    daily
      .withColumn("n_events_7d", sum(col("n_events")).over(w))
      .withColumn("cents_7d", sum(col("cents")).over(w))
      .selectExpr("day_s", "n_events",
        "cents / CAST(100 AS DOUBLE) AS day_value",
        "n_events_7d", "cents_7d / CAST(100 AS DOUBLE) AS value_7d")
      .orderBy("day_s")
  }

  val rolling7dOracle: String =
    """WITH daily AS (SELECT
            CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_s,
            count(*) AS n_events,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY 1),
        r AS (SELECT *,
            CAST(sum(n_events) OVER (ORDER BY day_s
              RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_events_7d,
            CAST(sum(cents) OVER (ORDER BY day_s
              RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_7d
          FROM daily)
        SELECT day_s, n_events, cents / CAST(100 AS DOUBLE) AS day_value,
          n_events_7d, cents_7d / CAST(100 AS DOUBLE) AS value_7d
        FROM r ORDER BY day_s"""

  /** Daily active / new / cumulative-distinct users — the growth
    * dashboard triple. Cumulative COUNT(DISTINCT) over a window is
    * the textbook trap (Spark would need collect_set state linear in
    * users; engines that allow it pay the same); the scalable rewrite
    * used here is FIRST-SEEN decomposition: cumulative distinct users
    * at day d ≡ users whose first day ≤ d, so one per-user min-day
    * aggregate + a per-day count + a running sum over the (tiny) day
    * spine replaces the unbounded distinct state. Active counts come
    * from the (day, user) distinct relation — map-side combined
    * before its exchange. All integers; the oracle runs the SAME
    * rewrite, so the identity it rests on is cross-checked. */
  def userGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUser = Tables.events(spark, dir)
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        col("user_id"))
      .distinct()
    val active = dayUser.groupBy("day_s")
      .agg(count(lit(1)).as("n_active"))
    val firstSeen = dayUser.groupBy("user_id")
      .agg(min("day_s").as("day_s"))
      .groupBy("day_s").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day_s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(firstSeen, Seq("day_s"), "left")
      .selectExpr("day_s", "n_active", "coalesce(n_new, 0) AS n_new")
      .withColumn("n_cum_users", sum(col("n_new")).over(w))
      .orderBy("day_s")
  }

  val userGrowthOracle: String =
    """WITH du AS (SELECT DISTINCT
          CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_s,
          user_id
        FROM events),
        active AS (SELECT day_s, count(*) AS n_active FROM du GROUP BY day_s),
        fs AS (SELECT user_id, min(day_s) AS day_s FROM du GROUP BY user_id),
        nw AS (SELECT day_s, count(*) AS n_new FROM fs GROUP BY day_s),
        j AS (SELECT a.day_s, a.n_active, coalesce(nw.n_new, 0) AS n_new
              FROM active a LEFT JOIN nw ON a.day_s = nw.day_s)
        SELECT day_s, n_active, n_new,
          CAST(sum(n_new) OVER (ORDER BY day_s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_cum_users
        FROM j ORDER BY day_s"""

  /** The ROWS-frame twin of [[rolling7d]]: a per-type 3-observation
    * trailing window (2 PRECEDING + CURRENT) over the daily series —
    * positional frames are the right tool when the question is "the
    * last k observations" rather than "the last k calendar days"
    * (they differ exactly when days are missing, which the scaladoc
    * of [[rolling7d]] pins from the other side). The average divides
    * the exact integer frame-sum by the frame's own row count, so
    * partial leading frames (1 or 2 rows) are correct, not padded.
    * One exchange: the (type, day) agg; the window repartitions by
    * event_type, a handful of rows per partition. */
  def movingAvg3(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day_s")
      .rowsBetween(-2, 0)
    daily
      .withColumn("n_3d", sum(col("n_events")).over(w))
      .withColumn("w_rows", count(lit(1)).over(w))
      .selectExpr("event_type", "day_s", "n_events", "n_3d", "w_rows",
        "CAST(n_3d AS DOUBLE) / w_rows AS avg_3obs")
      .orderBy("event_type", "day_s")
  }

  val movingAvg3Oracle: String =
    """WITH daily AS (SELECT event_type,
            CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day_s,
            count(*) AS n_events
          FROM events GROUP BY 1, 2),
        r AS (SELECT *,
            CAST(sum(n_events) OVER w AS BIGINT) AS n_3d,
            CAST(count(*) OVER w AS BIGINT) AS w_rows
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY day_s
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        SELECT event_type, day_s, n_events, n_3d, w_rows,
          CAST(n_3d AS DOUBLE) / w_rows AS avg_3obs
        FROM r ORDER BY event_type, day_s"""

  /** MapType surface: per user, a map of event_type → count built with
    * `map_from_entries(collect_list(struct(…)))`, then keyed lookups
    * (`element_at`) and `map` introspection project SCALARS out — the
    * output never exposes raw map bytes, because map entry ORDER is
    * engine- and partitioning-dependent even when the mapping is
    * identical (the reason the rest of the corpus avoids map-typed
    * outputs). The per-(user, type) pre-aggregate keeps collect_list
    * bounded by the type cardinality, never the event count. */
  def typeCountMap(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("event_type"), col("n"))))).as("m"))
      .selectExpr("user_id",
        "CAST(size(m) AS INTEGER) AS n_types",
        "CAST(coalesce(element_at(m, 'purchase'), 0) AS BIGINT) AS n_purchase",
        "CAST(coalesce(element_at(m, 'view'), 0) AS BIGINT) AS n_view")
      .orderBy("user_id")

  val typeCountMapOracle: String =
    """SELECT user_id,
         CAST(count(DISTINCT event_type) AS INTEGER) AS n_types,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_view
       FROM events GROUP BY user_id ORDER BY user_id"""

  /** Per-user first/last event summary via `min_by`/`max_by` — the
    * argmin/argmax aggregates that replace the "self-join back to the
    * row at the extreme timestamp" anti-pattern (two scans + a join)
    * with ONE map-side-combined hash agg. The ordering key is a
    * zero-padded (micros, event_id) string, a total order both
    * engines compare identically (DuckDB's arg_min takes only scalar
    * keys, so the composite is encoded, not a struct). */
  /** `events_decay_engagement`: per-user engagement with exponential
    * time decay at a one-week half-life — the recency-weighted score
    * ranking/retention features use — computed WITHOUT a single
    * floating-point sum. Per (user, age-week k ≤ 30) the weight is
    * 2^(30−k) as a BIGINT shift, so the accumulated score is an exact
    * integer in half-life units scaled by 2^30; the float score is one
    * exact dyadic division at readout (score_scaled < 2^53 holds up to
    * ~8M events/user — past that, drop the cap to fewer weeks or widen
    * the scale; the bound is documented, not silently crossed: the
    * readout column would lose ulps, the scaled BIGINT never does).
    * The usual exp()-based form is libm-ordered float addition — the
    * exact thing the engine's no-libm discipline exists to avoid.
    * Ages anchor to the corpus max day (one-row broadcast). */
  def decayEngagement(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .selectExpr("user_id",
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT) AS d")
    val ref = days.agg(max("d").as("ref_d"))
    days.crossJoin(broadcast(ref))
      .selectExpr("user_id", "least((ref_d - d) DIV 7, CAST(30 AS BIGINT)) AS k")
      .groupBy("user_id", "k").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(sum("cnt").as("n_events"),
        sum(expr("cnt * shiftleft(CAST(1 AS BIGINT), CAST(30 - k AS INT))"))
          .as("score_scaled"))
      .selectExpr("user_id", "CAST(n_events AS BIGINT) AS n_events",
        "CAST(score_scaled AS BIGINT) AS score_scaled",
        "score_scaled / CAST(1073741824 AS DOUBLE) AS score")
      .orderBy("user_id")
  }

  val decayEngagementOracle: String =
    """WITH days AS (SELECT user_id,
            CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
          FROM events),
        ref AS (SELECT max(d) AS ref_d FROM days),
        ks AS (SELECT user_id, least((ref_d - d) // 7, 30) AS k
          FROM days CROSS JOIN ref),
        per AS (SELECT user_id, k, count(*) AS cnt FROM ks GROUP BY 1, 2)
        SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
          CAST(sum(cnt * (CAST(1 AS BIGINT) << CAST(30 - k AS INT))) AS BIGINT)
            AS score_scaled,
          CAST(sum(cnt * (CAST(1 AS BIGINT) << CAST(30 - k AS INT))) AS BIGINT)
            / CAST(1073741824 AS DOUBLE) AS score
        FROM per GROUP BY user_id ORDER BY user_id"""

  /** `events_user_fano`: dispersion of each user's daily event counts
    * by the Fano factor (variance/mean; Poisson arrivals sit at 1) —
    * the regularity signal that complements the bot screen: scripted
    * traffic is UNDER-dispersed (metronomic, F < 1), campaign-driven
    * humans are over-dispersed bursts (F > 1). Days without events
    * count as zeros over the corpus's M-day span, so
    * M²·var = M·ΣC² − S² over exact BIGINT daily sums and the
    * dispersion class is the integer comparison of M·ΣC² − S² against
    * M·S — no float enters the verdict; the Fano readout itself is
    * one division. User-grain output, day-grain shuffles. */
  def userFano(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day")
      .groupBy("user_id", "day").agg(count(lit(1)).as("c"))
    val span = daily.agg(countDistinct("day").as("m"))
    daily.groupBy("user_id")
      .agg(count(lit(1)).as("n_days_active"),
        sum("c").as("s"), sum(expr("c * c")).as("q2"))
      .crossJoin(broadcast(span))
      .selectExpr("user_id",
        "CAST(n_days_active AS BIGINT) AS n_days_active",
        "CAST(s AS BIGINT) AS n_events",
        "CAST((m * q2 - s * s) AS DOUBLE) / (CAST(m AS DOUBLE) * s) AS fano",
        """CASE WHEN m * q2 - s * s < m * s THEN 'under_dispersed'
                WHEN m * q2 - s * s > m * s THEN 'over_dispersed'
                ELSE 'poissonian' END AS dispersion""")
      .orderBy("user_id")
  }

  val userFanoOracle: String =
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS c
         FROM events GROUP BY 1, 2),
       span AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS m FROM daily),
       per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days_active,
           CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q2
         FROM daily GROUP BY user_id)
       SELECT user_id, n_days_active, s AS n_events,
         CAST((m * q2 - s * s) AS DOUBLE) / (CAST(m AS DOUBLE) * s) AS fano,
         CASE WHEN m * q2 - s * s < m * s THEN 'under_dispersed'
              WHEN m * q2 - s * s > m * s THEN 'over_dispersed'
              ELSE 'poissonian' END AS dispersion
       FROM per CROSS JOIN span ORDER BY user_id"""

  def userFirstLast(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .selectExpr("user_id", "event_type",
        "concat(lpad(CAST(unix_micros(ts) AS STRING), 20, '0'), '|', " +
          "lpad(CAST(event_id AS STRING), 12, '0')) AS ord",
        "unix_micros(ts) AS us")
      .groupBy("user_id")
      .agg(expr("min_by(event_type, ord)").as("first_type"),
        expr("max_by(event_type, ord)").as("last_type"),
        count(lit(1)).as("n_events"),
        expr("CAST((max(us) - min(us)) DIV 1000000 AS BIGINT)").as("span_s"))
      .orderBy("user_id")

  val userFirstLastOracle: String =
    """WITH e AS (SELECT user_id, event_type,
            lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
              || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events)
        SELECT user_id, arg_min(event_type, ord) AS first_type,
          arg_max(event_type, ord) AS last_type, count(*) AS n_events,
          CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS span_s
        FROM e GROUP BY user_id ORDER BY user_id"""

  /** Sessionization via Spark's NATIVE `session_window` operator — the
    * declarative twin of the lag+cumsum construction in
    * [[graft.streaming.Sessionize]]. Semantics differ at the boundary:
    * session_window merges events when the gap is STRICTLY less than
    * 30 minutes and works at full microsecond precision (the lag form
    * uses floored seconds and closes only when the gap exceeds the
    * threshold), so this query carries its own micros-exact oracle
    * rather than reusing the lag one. The session end is
    * last_event + gap by definition. Plan shape: one hash-partition
    * exchange on user_id + sort, then Spark's dedicated
    * UpdatingSessionsExec pass — same shuffle bill as the window form,
    * but the operator is streaming-ready (the identical expression
    * runs under watermark in a `writeStream`). */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .selectExpr("user_id",
        "unix_micros(session_window.start) AS session_start_us",
        "unix_micros(session_window.end) AS session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")

  val sessionWindowsOracle: String =
    """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events),
        lagged AS (SELECT *, lag(us) OVER
            (PARTITION BY user_id ORDER BY us) AS prev_us FROM ev),
        flags AS (SELECT *, CASE WHEN prev_us IS NULL
              OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM lagged),
        sess AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
            ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS seq FROM flags)
        SELECT user_id, min(us) AS session_start_us,
          max(us) + 1800000000 AS session_end_us,
          count(*) AS n_events
        FROM sess GROUP BY user_id, seq
        ORDER BY user_id, session_start_us"""

  /** Per-type top-5 event values via the native bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]): each task heaps its slice in O(k)
    * state, partial heaps merge associatively, and only k longs per
    * group cross the shuffle — versus a rank window, which would
    * shuffle and sort EVERY event row per type. The heap's array
    * output is exploded back to (rank, value) rows so the oracle — a
    * full-sort rank window in DuckDB — proves the heap multiset equals
    * the true top-k at every rank. Cent-quantized values make equal
    * elements exactly equal, so rank→value is deterministic under
    * ties. */
  def topValuesPerType(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    Tables.events(spark, dir)
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS cents")
      .groupBy("event_type")
      .agg(expr("graft_topk(cents, 5)").as("top_cents"))
      .select(col("event_type"), posexplode(col("top_cents")))
      .selectExpr("event_type", "CAST(pos + 1 AS INTEGER) AS rank",
        "col AS cents")
      .orderBy("event_type", "rank")
  }

  val topValuesPerTypeOracle: String =
    """WITH g AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        r AS (SELECT event_type, cents, row_number() OVER
            (PARTITION BY event_type ORDER BY cents DESC) AS rank FROM g)
        SELECT event_type, CAST(rank AS INTEGER) AS rank, cents
        FROM r WHERE rank <= 5 ORDER BY event_type, rank"""

  /** Last-observation-carried-forward: every event row annotated with
    * the most recent purchase value seen so far in its user's stream
    * (null until the first purchase) — the forward-fill primitive
    * feature pipelines use to densify sparse signals. Mechanically the
    * WINDOW twin of the as-of join ([[purchaseAttributionAsOf]]): one
    * `last(..., ignoreNulls)` pass over a user-keyed sort instead of a
    * range join between two relations. At scale that trade matters —
    * LOCF pays one shuffle+sort of the single stream and streams
    * through it once, where the as-of join pays two shuffles plus the
    * join; when the "observations" live IN the stream being filled,
    * the window form wins. The carried value is copied verbatim (no
    * arithmetic), so determinism is structural. */
  def purchaseCarryForward(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
      .withColumn("carried_purchase",
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w))
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(unix_timestamp(ts) AS BIGINT) AS ts_s", "carried_purchase")
      .orderBy("user_id", "ts_s", "event_id")
  }

  val purchaseCarryForwardOracle: String =
    """SELECT user_id, event_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
         last_value(CASE WHEN event_type = 'purchase' THEN value END
             IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS carried_purchase
       FROM events ORDER BY user_id, ts_s, event_id"""

  /** Sliding-window aggregation: 1-hour windows advancing every 15
    * minutes, so each event lands in exactly 4 overlapping windows —
    * the smoothing form dashboards use where tumbling windows
    * ([[hourlyAggBatch]]) would alias. Spark expands each row into its
    * duration/slide = 4 window copies before the hash agg (the
    * documented cost multiplier of overlap); map-side combine still
    * collapses to one row per (window, type) per task. Window starts
    * are epoch-aligned multiples of the slide, so the oracle
    * reconstructs membership from floor-of-epoch-seconds arithmetic —
    * exact for integer-aligned windows even though the raw timestamps
    * carry fractional seconds. */
  def slidingWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start_s", "event_type")

  val slidingWindowAggOracle: String =
    """WITH e AS (SELECT
            CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
            event_type, value FROM events),
        x AS (SELECT ((es // 900) * 900) - (k.k * 900) AS window_start_s,
                event_type, value
              FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k)
        SELECT window_start_s, event_type, count(*) AS n_events,
          CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0
            AS total_value
        FROM x GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Calendar-spine gap fill: one row per (event_type, day) for EVERY
    * day in the stream's span — days with no events appear with zero
    * counts instead of silently missing (the difference between "no
    * data" and "no row" that breaks downstream time-series models),
    * plus running totals per type. Plan shape at scale: the events
    * table dies in one map-side-combined (type, day) hash agg; the
    * spine is `sequence(min_day, max_day)` exploded from a single-row
    * bounds aggregate crossed with the tiny distinct-type relation —
    * both broadcast-sized regardless of data volume (days × types,
    * not rows). The cumulative window runs over one row per day per
    * type. Total on empty input: a null-bounds sequence explodes to
    * zero spine rows. */
  def dailyGapFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    val spine = ev
      .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      .filter("d0 IS NOT NULL")
      .selectExpr("explode(sequence(d0, d1, interval 1 day)) AS day_d")
      .selectExpr("CAST(day_d AS TIMESTAMP) AS day")
    val grid = spine.crossJoin(ev.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("day")
    grid.join(daily, Seq("event_type", "day"), "left")
      .selectExpr("event_type", "day",
        "CAST(coalesce(n, 0) AS BIGINT) AS n_events",
        "CAST(coalesce(cents, 0) AS BIGINT) AS cents")
      .withColumn("cum_events", sum(col("n_events")).over(w))
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .selectExpr("event_type", "unix_timestamp(day) AS day_s", "n_events",
        "cents / CAST(100 AS DOUBLE) AS day_value",
        "CAST(cum_events AS BIGINT) AS cum_events",
        "cum_cents / CAST(100 AS DOUBLE) AS cum_value")
      .orderBy("event_type", "day_s")
  }

  val dailyGapFillOracle: String =
    """WITH d AS (SELECT event_type,
            date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
            count(*) AS n,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY 1, 2),
        spine AS (SELECT unnest(generate_series(
            (SELECT CAST(min(ts) AS DATE) FROM events),
            (SELECT CAST(max(ts) AS DATE) FROM events),
            INTERVAL 1 DAY)) AS day),
        ty AS (SELECT DISTINCT event_type FROM events),
        g AS (SELECT ty.event_type, spine.day,
                CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
                CAST(coalesce(d.cents, 0) AS BIGINT) AS cents
              FROM spine CROSS JOIN ty
              LEFT JOIN d ON d.event_type = ty.event_type
                AND d.day = spine.day)
        SELECT event_type, CAST(epoch(day) AS BIGINT) AS day_s, n_events,
          cents / CAST(100 AS DOUBLE) AS day_value,
          CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) AS cum_events,
          CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY day)
            AS BIGINT) / CAST(100 AS DOUBLE) AS cum_value
        FROM g ORDER BY event_type, day_s"""

  /** Per-decile user-value report: users are ranked by lifetime event
    * value (cent-quantized, ties broken by user_id for a total order)
    * and cut into ten ntile buckets; each decile row carries its user
    * count, value total, and share — the standard whale-curve report.
    * Plan shape: per-user agg (map-side combined) kills the event
    * volume; the decile cut rides [[graft.ops.Scale.withNtile]] — the
    * two-phase exact rank whose only global window runs over the
    * value-range BUCKET grain, so the user dimension never sorts in
    * one partition (the old `ntile(10).over(Window.orderBy(...))`
    * did exactly that at 1e8 users). The grand total stays a
    * partition-less window — but over the DECILE rollup, whose grain
    * is ≤ 10 rows by construction (re-aggregating the per-user
    * relation for the total would scan events twice; a 10-row window
    * costs nothing at any corpus size). */
  def userValueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
    graft.ops.Scale.withNtile(perUser, 10,
        Seq(expr("(-cents) DIV 65536")),
        Seq(desc("cents"), asc("user_id")), "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"),
        sum("n_events").as("n_events"), sum("cents").as("cents"))
      .withColumn("total_cents", sum(col("cents")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .selectExpr("decile", "n_users", "n_events",
        "cents / CAST(100 AS DOUBLE) AS total_value",
        "cents / CAST(total_cents AS DOUBLE) AS value_share")
      .orderBy("decile")
  }

  val userValueDecilesOracle: String =
    """WITH u AS (SELECT user_id, count(*) AS n_events,
            CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY user_id),
        t AS (SELECT *, ntile(10) OVER (ORDER BY cents DESC, user_id) AS decile
              FROM u),
        g AS (SELECT decile, count(*) AS n_users,
                CAST(sum(n_events) AS BIGINT) AS n_events,
                CAST(sum(cents) AS BIGINT) AS cents
              FROM t GROUP BY decile),
        tt AS (SELECT *, CAST(sum(cents) OVER () AS BIGINT) AS total_cents FROM g)
        SELECT decile, n_users, n_events,
          cents / CAST(100 AS DOUBLE) AS total_value,
          cents / CAST(total_cents AS DOUBLE) AS value_share
        FROM tt ORDER BY decile"""

  /** Raw parquet schema of events; `ts` follows the fixture vintage
    * (nano-long or TIMESTAMP_NTZ — see [[Tables.normalizeTs]]), probed
    * from the file footer because a file-source stream must declare
    * its schema up front. */
  private def eventsRawSchema(spark: SparkSession, dir: String): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", Tables.eventsTsType(spark, dir)),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** Raw events file-source stream with proper timestamps (file source
    * needs a directory; the glob narrows it to the events fixture). */
  def rawEventsStream(spark: SparkSession, dir: String): DataFrame =
    Tables.normalizeTs(spark.readStream
      .schema(eventsRawSchema(spark, dir))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))

  /** The same aggregation as an unbounded streaming plan with a
    * watermark; drive it with Trigger.AvailableNow or
    * processAllAvailable over the fixture directory. */
  def hourlyAggStream(spark: SparkSession, dir: String): DataFrame =
    rawEventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming twin of [[slidingWindowAgg]] — identical expression
    * under a watermark; the spec drives it to completion and asserts
    * batch parity. */
  def slidingWindowStream(spark: SparkSession, dir: String): DataFrame =
    rawEventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), centSum("value").as("total_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming twin of [[sessionWindows]]: the same `session_window`
    * expression is legal under a watermark — the operator the batch
    * form was chosen for. */
  def sessionWindowStream(spark: SparkSession, dir: String): DataFrame =
    rawEventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .selectExpr("user_id",
        "unix_micros(session_window.start) AS session_start_us",
        "unix_micros(session_window.end) AS session_end_us", "n_events")

  /** The VARIANT tier of semi-structured handling (Spark 4's native
    * open-schema type, the engine-level successor to string JSON):
    * each event's fields are composed into ONE nested JSON document
    * (ints only — float-to-text formatting is engine-dependent and
    * has no place in a deterministic fixture), ~1% of documents are
    * deterministically truncated to exercise the failure channel,
    * then `try_parse_json` produces a VARIANT (NULL on malformed —
    * never a throw) and `variant_get` extracts typed values through
    * nested paths. Why VARIANT instead of get_json_object at 100 TB:
    * the document parses ONCE into a binary-encoded value that all
    * downstream path extractions share, instead of re-tokenizing the
    * string per path; shredded storage keeps extraction columnar.
    * The DuckDB oracle walks the same documents with its JSON type
    * (json_valid + json_extract), pinning cross-engine agreement of
    * the parse-reject set and every extracted value. */
  def propsVariantMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .selectExpr("event_type",
        "concat('{\"u\":', CAST(user_id AS STRING), " +
          "',\"c\":', CAST(CAST(round(value * 100) AS BIGINT) AS STRING), " +
          "',\"p\":', props, '}') AS j")
      .selectExpr("event_type",
        "CASE WHEN event_type = 'error' THEN substr(j, 1, length(j) - 1) " +
          "ELSE j END AS jm")
      .selectExpr("event_type", "try_parse_json(jm) AS v")
      .selectExpr("event_type",
        "CASE WHEN v IS NULL THEN 1 ELSE 0 END AS bad",
        "variant_get(v, '$.p.k', 'bigint') AS k",
        "variant_get(v, '$.c', 'bigint') AS cents",
        "variant_get(v, '$.u', 'bigint') AS u")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("bad").as("n_bad_json"),
        sum("k").as("sum_k"), sum("cents").as("sum_cents"),
        countDistinct(col("u")).as("n_users"))
      .orderBy("event_type")

  val propsVariantMetricsOracle: String =
    """WITH doc AS (SELECT event_type,
          concat('{"u":', CAST(user_id AS VARCHAR),
            ',"c":', CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
            ',"p":', props, '}') AS j
          FROM events),
        mal AS (SELECT event_type,
          CASE WHEN event_type = 'error' THEN substr(j, 1, length(j) - 1)
            ELSE j END AS jm FROM doc),
        ext AS (SELECT event_type,
          CASE WHEN json_valid(jm) THEN 0 ELSE 1 END AS bad,
          CASE WHEN json_valid(jm)
            THEN CAST(json_extract_string(jm, '$.p.k') AS BIGINT) END AS k,
          CASE WHEN json_valid(jm)
            THEN CAST(json_extract_string(jm, '$.c') AS BIGINT) END AS cents,
          CASE WHEN json_valid(jm)
            THEN CAST(json_extract_string(jm, '$.u') AS BIGINT) END AS u
          FROM mal)
        SELECT event_type, count(*) AS n_events,
          CAST(sum(bad) AS BIGINT) AS n_bad_json,
          CAST(sum(k) AS BIGINT) AS sum_k,
          CAST(sum(cents) AS BIGINT) AS sum_cents,
          count(DISTINCT u) AS n_users
        FROM ext GROUP BY event_type ORDER BY event_type"""

  /** String-JSON tier kept alongside the VARIANT tier: the codegen'd
    * JSON-path extraction promotes `props` to a typed column without
    * a parse UDF, then aggregates. At scale this is the
    * "schema-on-read for the messy column" pattern — extraction
    * happens inside the scan projection, nothing materializes the raw
    * JSON twice. */
  def propsJsonMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .selectExpr("event_type",
        "CAST(get_json_object(props, '$.k') AS INT) AS k")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .selectExpr("event_type", "n_events", "sum_k", "min_k", "max_k",
        "CAST(sum_k AS DOUBLE) / n_events AS avg_k")
      .orderBy("event_type")

  val propsJsonMetricsOracle: String =
    """WITH k_t AS (SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events),
        agg AS (SELECT event_type, count(*) AS n_events,
          CAST(sum(k) AS BIGINT) AS sum_k,
          min(k) AS min_k, max(k) AS max_k
        FROM k_t GROUP BY event_type)
        SELECT event_type, n_events, sum_k, min_k, max_k,
          CAST(sum_k AS DOUBLE) / n_events AS avg_k
        FROM agg ORDER BY event_type"""

  /** Two-phase salted aggregation surfaced as a real query: event_type
    * has ~5 values, so at 100 TB every reducer key is pathologically
    * hot — exactly the case `ops.Scale.saltedAgg` exists for. The
    * value sum is cent-quantized to a long first (decomposable AND
    * exact, so the salted two-phase result is bit-identical to the
    * direct group-by the oracle runs). */
  def typeTotalsSalted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    graft.ops.Scale.saltedAgg(ev, Seq("event_type"), "cents")
      .selectExpr("event_type",
        "CAST(sum_cents AS BIGINT) / CAST(100 AS DOUBLE) AS total_value",
        "n_rows")
      .orderBy("event_type")
  }

  val typeTotalsSaltedOracle: String =
    """SELECT event_type,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE) AS total_value,
         count(*) AS n_rows
       FROM events GROUP BY event_type ORDER BY event_type"""

  // ---- skew-safe salted join (Scale.saltedJoin), oracle-checked ----

  /** The per-type weight dim the salted join replicates — shared by the
    * Spark literal relation and the oracle VALUES so they can't drift. */
  private val typeWeightRows = Seq(
    ("click", 2), ("error", 0), ("purchase", 10), ("signup", 5), ("view", 1))

  /** [[graft.ops.Scale.saltedJoin]] surfaced as a query whose oracle is
    * the PLAIN join: `event_type` is the pathological key (5 values
    * over the whole event log — the worst case for a shuffle join,
    * where every row of a type lands on one task), so the large side
    * is salted and the 5-row dim replicated across the salt space.
    * Results must be bit-identical to the unsalted join; the weighted
    * sum runs on cents×weight integers so combine order can't leak in. */
  def saltedJoinTotals(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val dim = spark.createDataFrame(typeWeightRows).toDF("event_type", "weight")
    graft.ops.Scale.saltedJoin(ev, dim, "event_type", salts = 8)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents") * col("weight")).as("weighted_cents"))
      .selectExpr("event_type", "n_rows",
        "CAST(weighted_cents AS BIGINT) / CAST(100 AS DOUBLE) AS weighted_value")
      .orderBy("event_type")
  }

  val saltedJoinTotalsOracle: String = {
    val vals = typeWeightRows
      .map { case (t, w) => s"('$t', $w)" }.mkString(", ")
    s"""WITH dim AS (SELECT * FROM (VALUES $vals) v(event_type, weight)),
        ev AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
        SELECT e.event_type, count(*) AS n_rows,
          CAST(sum(e.cents * d.weight) AS BIGINT) / CAST(100 AS DOUBLE) AS weighted_value
        FROM ev e JOIN dim d ON e.event_type = d.event_type
        GROUP BY e.event_type ORDER BY e.event_type"""
  }

  // ---- stream-stream interval join: purchase → click attribution ----

  private val attributionWindowUs: Long = 6L * 3600 * 1000 * 1000

  /** Each purchase joined to every click by the same user in the
    * preceding 6 hours — the classic event-attribution interval join.
    * Equi-key is `user_id` (high-cardinality → a well-distributed
    * shuffle join at scale); the time range is a secondary predicate.
    * Comparisons run on integer epoch-micros so both engines see
    * identical arithmetic. */
  private def attributionJoined(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("us").as("c_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("value"), col("us").as("p_us"))
    purchases
      .join(clicks, col("p_user") === col("c_user")
        && col("c_us") <= col("p_us")
        && col("p_us") <= col("c_us") + attributionWindowUs)
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        (col("p_us") - col("c_us")).as("lag_us"), col("value"))
  }

  def purchaseAttributionBatch(spark: SparkSession, dir: String): DataFrame =
    attributionJoined(spark, dir).orderBy("purchase_id", "click_id")

  /** As-of form: each purchase attributed to its single MOST RECENT
    * in-window click — the nearest-preceding-event (as-of) join Spark
    * has no native operator for, composed as the bounded interval join
    * plus a per-purchase top-1 window (rank by smallest lag; click_id
    * desc breaks exact-timestamp ties deterministically). The interval
    * bound is what keeps the composition scalable: the window operates
    * on in-window candidates only, never on the full click history. */
  def purchaseAttributionAsOf(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id").orderBy(asc("lag_us"), desc("click_id"))
    attributionJoined(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("purchase_id", "click_id", "user_id", "lag_us", "value")
      .orderBy("purchase_id")
  }

  // ---- staged conversion funnel: view → click → purchase ----

  /** Ordered-stage funnel over the event log — the product-analytics
    * staple: users who viewed, clicked AFTER their first view, and
    * purchased AFTER that first qualifying click, with exact
    * integer-microsecond stage-to-stage latency sums. Each stage is an
    * equi-join on `user_id` (high-cardinality → well-distributed
    * shuffle) followed by a map-side-combined min aggregation; the
    * earlier stage's timestamp rides in the grouping key (it is
    * functionally dependent on the user), so no re-join is needed to
    * compute latencies. The final stage counts are three single-row
    * aggregates — driver-light at any scale. */
  def funnelBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("t_view"))
      .groupBy("user_id", "t_view").agg(min("us").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c.select("user_id", "t_click"), Seq("user_id"))
      .filter(col("us") >= col("t_click"))
      .groupBy("user_id", "t_click").agg(min("us").as("t_purchase"))
    val stage1 = v.agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"),
        lit(null).cast("long").as("latency_us_sum"))
    val stage2 = c.agg(count(lit(1)).as("n_users"),
        sum(col("t_click") - col("t_view")).as("latency_us_sum"))
      .select(lit("2_click").as("stage"), col("n_users"), col("latency_us_sum"))
    val stage3 = p.agg(count(lit(1)).as("n_users"),
        sum(col("t_purchase") - col("t_click")).as("latency_us_sum"))
      .select(lit("3_purchase").as("stage"), col("n_users"), col("latency_us_sum"))
    stage1.unionByName(stage2).unionByName(stage3).orderBy("stage")
  }

  val funnelBatchOracle: String =
    """WITH ev AS (SELECT user_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        v AS (SELECT user_id, min(us) AS t_view FROM ev
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT ev.user_id, v.t_view, min(us) AS t_click FROM ev
              JOIN v ON ev.user_id = v.user_id
              WHERE event_type = 'click' AND us >= t_view
              GROUP BY ev.user_id, v.t_view),
        p AS (SELECT ev.user_id, c.t_click, min(us) AS t_purchase FROM ev
              JOIN c ON ev.user_id = c.user_id
              WHERE event_type = 'purchase' AND us >= t_click
              GROUP BY ev.user_id, c.t_click)
       SELECT * FROM (
         SELECT '1_view' AS stage, count(*) AS n_users,
                CAST(NULL AS BIGINT) AS latency_us_sum FROM v
         UNION ALL
         SELECT '2_click', count(*),
                CAST(sum(t_click - t_view) AS BIGINT) FROM c
         UNION ALL
         SELECT '3_purchase', count(*),
                CAST(sum(t_purchase - t_click) AS BIGINT) FROM p)
       ORDER BY stage"""

  val purchaseAttributionAsOfOracle: String =
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        c AS (SELECT event_id AS click_id, user_id, us AS c_us FROM ev
              WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id, value, us AS p_us FROM ev
              WHERE event_type = 'purchase'),
        j AS (SELECT p.purchase_id, c.click_id, p.user_id,
                p.p_us - c.c_us AS lag_us, p.value
              FROM p JOIN c ON p.user_id = c.user_id
                AND c.c_us <= p.p_us AND p.p_us <= c.c_us + $attributionWindowUs)
        SELECT purchase_id, click_id, user_id, lag_us, value FROM j
        QUALIFY row_number() OVER (PARTITION BY purchase_id
          ORDER BY lag_us, click_id DESC) = 1
        ORDER BY purchase_id"""

  val purchaseAttributionBatchOracle: String =
    s"""WITH ev AS (SELECT event_id, user_id, event_type, value,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        c AS (SELECT event_id AS click_id, user_id, us AS c_us FROM ev
              WHERE event_type = 'click'),
        p AS (SELECT event_id AS purchase_id, user_id, value, us AS p_us FROM ev
              WHERE event_type = 'purchase')
        SELECT p.purchase_id, c.click_id, p.user_id,
          p.p_us - c.c_us AS lag_us, p.value
        FROM p JOIN c ON p.user_id = c.user_id
          AND c.c_us <= p.p_us AND p.p_us <= c.c_us + $attributionWindowUs
        ORDER BY purchase_id, click_id"""

  /** Production sink shape: stream → partitioned processed zone via
    * foreachBatch, reusing the batch writer (dynamic partition
    * overwrite makes per-batch re-runs idempotent — each micro-batch
    * replaces exactly the partitions it carries, the streaming
    * equivalent of the reference's per-event job runs). */
  def streamToProcessed(stream: DataFrame, path: String,
                        partitionCols: Seq[String]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.io.Writers.processed(batch, path, partitionCols)
      }

  /** The same attribution as a STREAM-STREAM inner join: both sides
    * watermarked, and the event-time range condition is what lets the
    * state store evict clicks older than the join window — bounded
    * state, the requirement for an unbounded run. The purchase-side
    * watermark exceeds the click watermark + window so no late match
    * is dropped under AvailableNow processing. */
  def purchaseAttributionStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = rawEventsStream(spark, dir)
    val clicks = raw.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("value"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "7 hours")
    purchases
      .join(clicks, expr(
        "p_user = c_user AND c_ts <= p_ts AND p_ts <= c_ts + interval 6 hours"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"),
        col("value"))
  }

  // ---- bot-likeness scoring ----

  /** Per-user automation signals from inter-arrival timing: event
    * count, mean gap, and the coefficient-of-variation verdict — a
    * near-constant gap (CV² below 1/25) is the machine signature no
    * content feature sees, the standard first-pass bot screen on a
    * 100 TB event log. Gaps are exact BIGINT micros off one lag
    * window (user-keyed — the same shuffle sessionization pays);
    * moments are exact integer sums; CV² is compared by integer-free
    * DOUBLE cross-multiply of exact sums (n·Σg² − (Σg)² < (Σg)²/25
    * ⟺ 25·(n·Σg² − (Σg)²) < (Σg)², both sides products of exact
    * values in DOUBLE — the n² overflow dodge), so no per-row float
    * ever decides the flag. Users with < 5 events abstain (flag 0,
    * too little evidence). */
  def botScore(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) - prev_us AS g")
    gaps.groupBy("user_id").agg(
        count(lit(1)).as("n_gaps"),
        sum("g").as("sg"),
        sum(expr("CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0))")).as("sgg"))
      .selectExpr("user_id", "n_gaps", "sg",
        "CAST(sg AS DOUBLE) / n_gaps / 1e6 AS mean_gap_s",
        """CASE WHEN n_gaps >= 4 AND sg > 0
             AND 25.0 * (CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg)
                 < CAST(sg AS DOUBLE) * sg
           THEN 1 ELSE 0 END AS bot_flag""")
      .orderBy("user_id")
  }

  val botScoreOracle: String =
    """WITH g_t AS (SELECT user_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS g
         FROM events),
       m AS (SELECT user_id, count(*) AS n_gaps,
           CAST(sum(g) AS BIGINT) AS sg,
           sum(CAST(g AS HUGEINT) * g) AS sgg
         FROM g_t WHERE g IS NOT NULL GROUP BY user_id)
       SELECT user_id, n_gaps, sg,
         CAST(sg AS DOUBLE) / n_gaps / 1e6 AS mean_gap_s,
         CASE WHEN n_gaps >= 4 AND sg > 0
             AND 25.0 * (CAST(n_gaps AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * sg)
                 < CAST(sg AS DOUBLE) * sg
           THEN 1 ELSE 0 END AS bot_flag
       FROM m ORDER BY user_id"""

  // ---- Markov stationary distribution ----

  private val markovIters = 4
  private val MR = 1000000000000L // picocounts, mass 1.0

  /** Stationary distribution of the user-journey Markov chain: the
    * long-run share of time a session spends in each event type, from
    * fixed-iteration power method over the [[typeTransitions]] matrix
    * — the summary number a "where do users end up" readout wants.
    * Same determinism contract as [[graft.sql.Graph.nationPagerank]]:
    * mass lives in BIGINT picocounts, each π'_b = Σ_a π_a·n_ab DIV n_a
    * is floor arithmetic, iterations are fixed and identical in both
    * engines — bit-equal by construction where float power iteration
    * is partitioning-dependent. The matrix is type²-bounded (a handful
    * of rows at any event volume — the fact table dies in the lag
    * window + first agg); types with no outgoing transitions keep
    * their mass (self-loop treatment, the absorbing-state convention). */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    val trans = transCounts(spark, dir)
    // Bounded-domain dispatch (the containmentFrom pattern): the
    // event-type domain is enum-like — when it fits 64 values the
    // whole chain state is ≤ 64 mass cells and ≤ 64² transition
    // counts, a DRIVER-BOUNDED collect at any event volume (the
    // multimodal-ahash ≤65-row precedent), and the 4 power-method
    // rounds are 4·64² integer ops better done in-process than as
    // ~10 cluster jobs over 5-row relations (r13: 3.2 s of pure
    // scheduling at sf0.1). An unbounded type domain keeps the
    // distributed loop — same arithmetic, same results
    // (MarkovStationarySpec pins both paths to one imperative
    // replay). limit(65) keeps the probe itself O(1): 65 rows back
    // means "too many", nothing corpus-sized ever reaches the driver.
    val typeProbe = Tables.events(spark, dir)
      .select(col("event_type").as("t")).distinct()
      .limit(65).collect().map(_.getString(0))
    if (typeProbe.length <= 64) {
      val types = typeProbe.sorted
      val tRows = trans.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val outTot = tRows.groupBy(_._1).map { case (a, rs) =>
        a -> rs.map(_._3).sum }
      var pi: Map[String, Long] =
        if (types.isEmpty) Map.empty
        else types.map(_ -> MR / types.length).toMap
      for (_ <- 1 to markovIters) {
        val inflow = scala.collection.mutable.HashMap.empty[String, Long]
        // (m * n_ab) DIV n_a in ANSI BIGINT arithmetic: multiplyExact
        // mirrors the engine's overflow-throws semantics exactly
        tRows.foreach { case (a, b, nAb) =>
          val c = Math.multiplyExact(pi(a), nAb) / outTot(a)
          inflow(b) = inflow.getOrElse(b, 0L) + c
        }
        // absorbing states (no outgoing row) keep their own mass
        pi = pi.map { case (t, m) =>
          t -> (if (outTot.contains(t)) inflow.getOrElse(t, 0L)
                else inflow.getOrElse(t, 0L) + m)
        }
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("stationary_pico",
          org.apache.spark.sql.types.LongType)))
      val rows = types.map(t =>
        org.apache.spark.sql.Row(t, pi.getOrElse(t, 0L)))
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toSeq, 1), schema)
        .selectExpr("event_type", "stationary_pico",
          "CAST(stationary_pico AS DOUBLE) / 1e12 AS stationary")
        .orderBy(desc("stationary_pico"), asc("event_type"))
    } else markovStationaryLoop(spark, dir, trans)
  }

  /** The distributed power-method loop — the shape that survives an
    * unbounded type domain; [[markovStationary]] dispatches here past
    * 64 types. 2-round cut stride (the Graph.bfsHops trade): pi is
    * referenced twice per round (inflow + absorbing carry), so an
    * uncut segment costs at most 4 type-grain copies over the CUT
    * transition table while halving the materialization jobs of a
    * 4-round fixed loop over a type-squared-bounded relation. */
  private[graft] def markovStationaryLoop(spark: SparkSession, dir: String,
      trans: DataFrame): DataFrame = {
    val outTot = trans.groupBy("a").agg(sum("n_ab").as("n_a"))
    val types = Tables.events(spark, dir).select(col("event_type").as("t"))
      .distinct().transform(graft.ops.Checkpoints.cut)
    val nTypes = types.agg(count(lit(1)).as("nt"))
    var pi = types.crossJoin(broadcast(nTypes))
      .selectExpr("t", s"CAST($MR DIV nt AS BIGINT) AS m")
    for (iter <- 1 to markovIters) {
      val moved = trans.join(broadcast(outTot), Seq("a"))
        .join(pi.withColumnRenamed("t", "a"), Seq("a"))
        .selectExpr("b AS t", "(m * n_ab) DIV n_a AS c")
        .groupBy("t").agg(sum("c").as("inflow"))
      // absorbing states (no outgoing row) keep their own mass
      val kept = pi.join(outTot.withColumnRenamed("a", "t"), Seq("t"), "left_anti")
        .selectExpr("t", "m AS inflow")
      pi = types
        .join(moved.unionByName(kept).groupBy("t").agg(sum("inflow").as("m0")),
          Seq("t"), "left")
        .selectExpr("t", "CAST(coalesce(m0, 0) AS BIGINT) AS m")
      if (iter % 2 == 0 || iter == markovIters)
        pi = pi.transform(graft.ops.Checkpoints.cut)
    }
    pi.selectExpr("t AS event_type", "m AS stationary_pico",
        "CAST(m AS DOUBLE) / 1e12 AS stationary")
      .orderBy(desc("stationary_pico"), asc("event_type"))
  }

  val markovStationaryOracle: String = {
    def iter(prev: String, cur: String): String =
      s"""moved_$cur AS (
            SELECT t.b AS ty, sum((p.m * t.n_ab) // o.n_a) AS inflow
            FROM trans t JOIN outtot o ON t.a = o.a
            JOIN $prev p ON p.ty = t.a GROUP BY t.b),
          kept_$cur AS (
            SELECT p.ty, p.m AS inflow FROM $prev p
            WHERE NOT EXISTS (SELECT 1 FROM outtot o WHERE o.a = p.ty)),
          $cur AS (
            SELECT ty0.ty, CAST(coalesce(u.m0, 0) AS BIGINT) AS m
            FROM types ty0 LEFT JOIN (
              SELECT ty, sum(inflow) AS m0 FROM (
                SELECT * FROM moved_$cur UNION ALL SELECT * FROM kept_$cur) z
              GROUP BY ty) u ON ty0.ty = u.ty)"""
    val chain = (1 to markovIters)
      .map(i => iter(if (i == 1) "p0" else s"p${i - 1}", s"p$i"))
      .mkString(",\n        ")
    s"""WITH s AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM events),
        trans AS (SELECT prev_type AS a, event_type AS b, count(*) AS n_ab
          FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        outtot AS (SELECT a, sum(n_ab) AS n_a FROM trans GROUP BY a),
        types AS (SELECT DISTINCT event_type AS ty FROM events),
        ntypes AS (SELECT count(*) AS nt FROM types),
        p0 AS (SELECT ty, CAST($MR // (SELECT nt FROM ntypes) AS BIGINT) AS m
               FROM types),
        $chain
        SELECT ty AS event_type, m AS stationary_pico,
          CAST(m AS DOUBLE) / 1e12 AS stationary
        FROM p$markovIters
        ORDER BY stationary_pico DESC, event_type"""
  }

  // ---- funnel conversion latency percentiles ----

  /** Signup → first-purchase latency distribution: per converting
    * user, the exact microsecond delay from first signup to the first
    * purchase at-or-after it, summarized as discrete p50/p90 (the
    * value AT rank ⌈q·n⌉ under a total order — no interpolation, so
    * both engines select the identical element) plus the exact mean.
    * This is the time-to-convert readout the stage-count funnel
    * (`events_funnel`) doesn't give. Plan: two user-keyed min-aggs
    * and one user equi-join — the rank runs over converting USERS
    * (audience-sized, i.e. the same dimension-grain class VERDICT r8
    * flagged), so it rides the two-phase
    * [[graft.ops.Scale.globalRank]] rather than a one-partition
    * window sort; delays are exact BIGINT micros end to end. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.io.Tables.events(spark, dir)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(su, Seq("user_id"))
      .filter(col("ts") >= col("s_ts"))
      .groupBy("user_id", "s_ts").agg(min("ts").as("p_ts"))
      .selectExpr("user_id",
        "unix_micros(p_ts) - unix_micros(s_ts) AS delay_us")
    val ranked = graft.ops.Scale.globalRank(conv,
      Seq(expr("delay_us DIV 2147483648")), // ~36-min buckets over the delay range
      Seq(asc("delay_us"), asc("user_id")), "rk")
    val n = ranked.agg(count(lit(1)).as("n_converted"))
    ranked.crossJoin(broadcast(n))
      .selectExpr("n_converted", "rk", "delay_us")
      .agg(
        max(expr("n_converted")).as("n_converted"),
        max(expr("CASE WHEN rk = CAST(ceil(0.5 * n_converted) AS INT) THEN delay_us END")).as("p50_delay_us"),
        max(expr("CASE WHEN rk = CAST(ceil(0.9 * n_converted) AS INT) THEN delay_us END")).as("p90_delay_us"),
        sum("delay_us").as("delay_sum_us"))
      .selectExpr("n_converted", "p50_delay_us", "p90_delay_us",
        "CAST(delay_sum_us AS DOUBLE) / n_converted / 1e6 AS mean_delay_s")
  }

  val funnelLatencyOracle: String =
    """WITH su AS (SELECT user_id, min(ts) AS s_ts
          FROM events WHERE event_type = 'signup' GROUP BY user_id),
       conv AS (SELECT e.user_id,
           epoch_us(CAST(min(e.ts) AS TIMESTAMP)) - epoch_us(CAST(su.s_ts AS TIMESTAMP)) AS delay_us
         FROM events e JOIN su ON e.user_id = su.user_id
         WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
         GROUP BY e.user_id, su.s_ts),
       ranked AS (SELECT *, row_number() OVER
           (ORDER BY delay_us, user_id) AS rk FROM conv),
       n_t AS (SELECT count(*) AS n_converted FROM ranked)
       SELECT max(n_converted) AS n_converted,
         CAST(max(CASE WHEN rk = CAST(ceil(0.5 * n_converted) AS INTEGER)
           THEN delay_us END) AS BIGINT) AS p50_delay_us,
         CAST(max(CASE WHEN rk = CAST(ceil(0.9 * n_converted) AS INTEGER)
           THEN delay_us END) AS BIGINT) AS p90_delay_us,
         CAST(sum(delay_us) AS DOUBLE) / max(n_converted) / 1e6 AS mean_delay_s
       FROM ranked CROSS JOIN n_t"""

  // ---- RANGE-interval window frame ----

  /** Trailing one-hour per-user value sum — the RANGE frame the ROWS
    * moving averages cannot express: the frame is bounded by event
    * TIME (all events within 3600 s), not row count, so bursts widen
    * the frame and quiet periods shrink it. Values quantize to exact
    * cents before the frame sum; the frame key is integer epoch
    * seconds (floor of the micros timestamp — identical truncation in
    * both engines), and ties inside a second are no hazard because a
    * RANGE frame includes every peer row regardless of intra-peer
    * order. One shuffle on user_id at any volume; each partition
    * sorts its own user's events. */
  def rangeWindowSum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.table(spark, dir, "events")
      .selectExpr("event_id", "user_id",
        "unix_timestamp(ts) AS epoch_s",
        "CAST(round(value * 100) AS BIGINT) AS value_c")
    val w = Window.partitionBy("user_id").orderBy("epoch_s")
      .rangeBetween(-3600L, 0L)
    ev.withColumn("hour_sum_c", sum("value_c").over(w))
      .withColumn("hour_events", count(lit(1)).over(w))
      .selectExpr("event_id", "user_id", "epoch_s", "value_c",
        "hour_sum_c", "hour_events",
        "CAST(hour_sum_c AS DOUBLE) / 100.0 AS hour_sum")
      .orderBy("event_id")
  }

  val rangeWindowSumOracle: String =
    """WITH ev AS (SELECT event_id, user_id,
          epoch_us(ts) // 1000000 AS epoch_s,
          CAST(round(value * 100) AS BIGINT) AS value_c
        FROM events)
       SELECT event_id, user_id, epoch_s, value_c,
         CAST(sum(value_c) OVER w AS BIGINT) AS hour_sum_c,
         CAST(count(*) OVER w AS BIGINT) AS hour_events,
         CAST(sum(value_c) OVER w AS DOUBLE) / 100.0 AS hour_sum
       FROM ev
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
       ORDER BY event_id"""

  // ---- PIVOT (long -> wide event-type matrix) ----

  /** Per-user event-type count matrix via the PIVOT relational
    * operator — the long→wide reshape feeding feature stores and BI
    * exports. The pivot VALUES are pinned explicitly (the five fixture
    * event types): an unpinned pivot plans a distinct-scan first AND
    * makes the output schema data-dependent, which breaks both
    * determinism and pruning — pin your pivot columns. Compiles to
    * one conditional-sum hash agg (same plan as the CASE form), so it
    * is map-side combined and scale-indifferent. */
  def eventTypePivot(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .selectExpr("user_id", "click AS n_click", "error AS n_error",
        "purchase AS n_purchase", "signup AS n_signup", "view AS n_view")
      .orderBy("user_id")

  val eventTypePivotOracle: String =
    """SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
         CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
       FROM events GROUP BY user_id ORDER BY user_id"""

  // ---- day-over-day distribution drift ----

  /** Event-type distribution drift, day over day — the
    * data-drift monitor a production pipeline runs on every ingest
    * (upstream schema changes, bot floods, and logger bugs all show
    * up as a type-mix shift before they show up anywhere else): per
    * day, Pearson's chi-square of today's type counts against
    * expected counts scaled from YESTERDAY's distribution, flagged at
    * the 5% critical value for df=4 (9.488). Exactness discipline:
    * each type's chi-square term is ONE fixed IEEE tree over exact
    * integer counts — (c·n_prev − p·n_today)²/(p·n_today·n_prev) —
    * quantized to micro BEFORE the cross-type sum (the ANOVA lesson:
    * a float sum across groups is order-dependent), so the per-day
    * statistic is an exact BIGINT sum and the flag an integer
    * comparison. Day×type grain (calendar-bounded) at any event
    * volume; types absent on either day contribute the p=0 guard. */
  def typeDrift(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val totals = daily.groupBy("day_s").agg(sum("c").as("n_day"))
    // prev-day relations SHIFTED forward one day, so both lookups are
    // plain equi-joins on (day, type) / (day) — a type absent
    // yesterday surfaces as p IS NULL (the no-verdict guard), never as
    // a silently dropped row, and nothing fans out across the calendar
    val joined = daily
      .join(totals, Seq("day_s"))
      .join(daily.selectExpr("day_s + 86400 AS day_s", "event_type",
        "c AS p"), Seq("day_s", "event_type"), "left_outer")
      .join(totals.selectExpr("day_s + 86400 AS day_s",
        "n_day AS n_prev"), Seq("day_s"), "left_outer")
    joined
      .selectExpr("day_s", "n_day", "n_prev",
        """CASE WHEN p IS NULL OR p = 0 OR n_prev IS NULL THEN NULL
           ELSE CAST(round(
             (CAST(c AS DOUBLE) * n_prev - CAST(p AS DOUBLE) * n_day) *
             (CAST(c AS DOUBLE) * n_prev - CAST(p AS DOUBLE) * n_day) /
             (CAST(p AS DOUBLE) * n_day * n_prev) * 1e6) AS BIGINT)
           END AS term_micro""")
      .groupBy("day_s")
      .agg(max("n_day").as("n_events"),
        sum("term_micro").as("chi2_micro"),
        count(lit(1)).as("n_types"),
        sum(expr("CASE WHEN term_micro IS NULL THEN 1 ELSE 0 END"))
          .as("n_unmatched"))
      .filter("n_unmatched = 0") // first day / type gaps: no verdict
      .selectExpr("day_s", "n_events", "chi2_micro",
        "CAST(chi2_micro AS DOUBLE) / 1e6 AS chi2",
        "CASE WHEN chi2_micro > 9488000 THEN 1 ELSE 0 END AS drift_flag")
      .orderBy("day_s")
  }

  val typeDriftOracle: String =
    """WITH daily AS (SELECT
          CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
            AS day_s,
          event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
       totals AS (SELECT day_s, CAST(sum(c) AS BIGINT) AS n_day
         FROM daily GROUP BY day_s),
       j AS (SELECT d.day_s, d.event_type, d.c, t.n_day,
           p.c AS p, pt.n_day AS n_prev
         FROM daily d
         JOIN totals t ON d.day_s = t.day_s
         LEFT JOIN daily p ON p.event_type = d.event_type
           AND p.day_s = d.day_s - 86400
         LEFT JOIN totals pt ON pt.day_s = d.day_s - 86400),
       terms AS (SELECT day_s, n_day,
           CASE WHEN p IS NULL OR p = 0 OR n_prev IS NULL THEN NULL
           ELSE CAST(round(
             (CAST(c AS DOUBLE) * n_prev - CAST(p AS DOUBLE) * n_day) *
             (CAST(c AS DOUBLE) * n_prev - CAST(p AS DOUBLE) * n_day) /
             (CAST(p AS DOUBLE) * n_day * n_prev) * 1e6) AS BIGINT)
           END AS term_micro
         FROM j),
       agg AS (SELECT day_s, max(n_day) AS n_events,
           CAST(sum(term_micro) AS BIGINT) AS chi2_micro,
           sum(CASE WHEN term_micro IS NULL THEN 1 ELSE 0 END) AS n_unmatched
         FROM terms GROUP BY day_s)
       SELECT day_s, n_events, chi2_micro,
         CAST(chi2_micro AS DOUBLE) / 1e6 AS chi2,
         CASE WHEN chi2_micro > 9488000 THEN 1 ELSE 0 END AS drift_flag
       FROM agg WHERE n_unmatched = 0
       ORDER BY day_s"""

  // ---- watermark lateness audit ----

  /** Which events would a 1-hour watermark DROP — the batch-checkable
    * audit of the streaming semantics the watermark specs pin: with
    * arrival order = event_id (the fixture's ingestion order), the
    * watermark after event k is max(event-time so far) − 1 h, and an
    * event is late iff its own event time sits below the watermark
    * already established on arrival. Reported per event-time day so
    * an operator can see WHEN lateness clusters (backfills, clock
    * skew, mobile uploads) and size the delay before turning on the
    * real `withWatermark` drop.
    *
    * The running maximum over arrival order is the two-phase
    * distributed prefix scan (the chopBoundaries discipline): 4096-id
    * arrival buckets → per-bucket max → bucket-grain prefix max
    * (bounded window) → broadcast → within-bucket running max; never
    * a single-partition global window over the fact table. */
  def watermarkLateness(spark: SparkSession, dir: String): DataFrame =
    watermarkLatenessOf(Tables.events(spark, dir).select("event_id", "ts"))

  /** Core audit over any (event_id, ts) relation — split out so the
    * spec can drive the LATE branch with crafted out-of-order arrivals
    * (the fixture ingests in time order, so its late count is the
    * honest zero and the drop path needs synthetic disorder). */
  private[graft] def watermarkLatenessOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lateUs = 3600L * 1000000L
    val ev = events
      .selectExpr("event_id", "ts",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "event_id DIV 4096 AS b")
    val bucketMax = ev.groupBy("b").agg(max("us").as("bmax"))
      .withColumn("prev_max", max("bmax").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)))
      .select("b", "prev_max")
    ev.join(broadcast(bucketMax), Seq("b"))
      .withColumn("run_max", greatest(
        coalesce(col("prev_max"), lit(Long.MinValue)),
        max("us").over(Window.partitionBy("b").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, 0))))
      .selectExpr(
        "unix_timestamp(date_trunc('day', ts)) AS day_s",
        s"CASE WHEN us < run_max - $lateUs THEN 1 ELSE 0 END AS is_late",
        s"CASE WHEN us < run_max - $lateUs THEN run_max - $lateUs - us " +
          "ELSE 0 END AS late_by_us")
      .groupBy("day_s")
      .agg(count(lit(1)).as("n_events"),
        sum("is_late").cast("long").as("n_late"),
        max("late_by_us").as("max_late_us"))
      .selectExpr("day_s", "n_events", "n_late", "max_late_us",
        "CAST(n_late AS DOUBLE) / n_events AS late_rate")
      .orderBy("day_s")
  }

  val watermarkLatenessOracle: String =
    """WITH ev AS (SELECT event_id,
          CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
            AS day_s,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
       rm AS (SELECT *, max(us) OVER (ORDER BY event_id
           ROWS UNBOUNDED PRECEDING) AS run_max
         FROM ev),
       f AS (SELECT day_s,
           CASE WHEN us < run_max - 3600000000 THEN 1 ELSE 0 END AS is_late,
           CASE WHEN us < run_max - 3600000000
             THEN run_max - 3600000000 - us ELSE 0 END AS late_by_us
         FROM rm)
       SELECT day_s, count(*) AS n_events,
         CAST(sum(is_late) AS BIGINT) AS n_late,
         CAST(max(late_by_us) AS BIGINT) AS max_late_us,
         CAST(sum(is_late) AS DOUBLE) / count(*) AS late_rate
       FROM f GROUP BY day_s ORDER BY day_s"""
}
