package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch — the fixed-size frequency summary that answers
  * "how often does key x occur?" over a stream/corpus in O(d·w) memory
  * regardless of cardinality. Estimates only ever OVER-count (each cell
  * is a superset sum of its key's count), and the error is bounded by
  * the colliding mass per row; taking the MIN across d independent rows
  * drives the over-count to the minimum collision seen.
  *
  * This implementation is pure relational algebra, which is exactly why
  * it scales: incrementing is a projection (key → d (row, bucket)
  * cells), the sketch is ONE map-side-combined hash aggregation over
  * d·w cells (sketch merge across partitions = the agg's combine — CMS
  * is a commutative monoid), and point queries are an equi-join against
  * the tiny cell relation. Hashing is the classic (a·x + b) mod p mod w
  * universal family with p = 2³¹−1 and fixed odd constants, all BIGINT
  * arithmetic — deterministic and identical in any engine.
  *
  * The query audits the sketch against truth: exact top-k user counts
  * (the heavy hitters) joined with their CMS estimates; `over` is the
  * per-key collision mass, ≥ 0 by construction (the spec pins the
  * never-undercount invariant corpus-wide, not just top-k).
  */
object Sketches {

  /** (a, b) per hash row — small fixed odd/prime constants; any fixed
    * family works, these are pinned so both engines compute the same
    * sketch. */
  private val rows = Seq((31L, 7L), (37L, 11L), (41L, 13L), (43L, 17L))
  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val W = 256         // buckets per row

  private def bucketExpr(x: String, i: Int): String = {
    val (a, b) = rows(i)
    s"((($a * $x + $b) % $P) % $W)"
  }

  /** CASE dispatch on the row index (used after the 4-way explode). */
  private def bucketByRow(x: String, i: String): String =
    rows.indices.map(r => s"WHEN $i = $r THEN ${bucketExpr(x, r)}")
      .mkString("CASE ", " ", " END")

  private val K = 20 // heavy hitters audited

  /** Heavy-hitter audit: exact top-[[K]] user event counts vs their
    * count-min estimates from a d=4 × w=[[W]] sketch. */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.io.Tables.events(spark, dir).select("user_id")
    val rowsIdx = expr(s"explode(sequence(0, ${rows.size - 1}))")
    // the sketch: d·w cells, one hash agg (merge == combine)
    val cells = ev.select(col("user_id"), rowsIdx.as("i"))
      .select(col("i"), expr(bucketByRow("user_id", "i")).as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cell_n"))
    // exact heavy hitters (the audit target)
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy(desc("exact_n"), asc("user_id")).limit(K)
    // point queries: min over rows of the addressed cells
    exact.select(col("user_id"), col("exact_n"), rowsIdx.as("i"))
      .select(col("user_id"), col("exact_n"), col("i"),
        expr(bucketByRow("user_id", "i")).as("bucket"))
      .join(cells, Seq("i", "bucket"))
      .groupBy("user_id", "exact_n")
      .agg(min("cell_n").as("cms_n"))
      .selectExpr("user_id", "exact_n", "cms_n",
        "cms_n - exact_n AS over")
      .orderBy(desc("exact_n"), asc("user_id"))
  }

  val cmsHeavyHittersOracle: String = {
    val cellSelects = rows.indices.map { r =>
      s"SELECT $r AS i, ${bucketExpr("user_id", r)} AS bucket FROM events"
    }.mkString(" UNION ALL ")
    val probeSelects = rows.indices.map { r =>
      s"SELECT user_id, exact_n, $r AS i, ${bucketExpr("user_id", r)} AS bucket FROM exact"
    }.mkString(" UNION ALL ")
    s"""WITH cells AS (
          SELECT i, bucket, count(*) AS cell_n
          FROM ($cellSelects) GROUP BY i, bucket),
        exact AS (
          SELECT user_id, count(*) AS exact_n FROM events
          GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT $K),
        probes AS ($probeSelects)
        SELECT p.user_id, p.exact_n, min(c.cell_n) AS cms_n,
          min(c.cell_n) - p.exact_n AS over
        FROM probes p JOIN cells c ON p.i = c.i AND p.bucket = c.bucket
        GROUP BY p.user_id, p.exact_n
        ORDER BY p.exact_n DESC, p.user_id"""
  }

  // ---- HLL-sketch sliding-window distinct users ----

  private val slideDays = 6 // window = anchor day and the 6 before it

  /** Distinct users per sliding 7-day window, the sketch-merge way: raw
    * events aggregate ONCE into per-day HLL sketches (DataSketches
    * `hll_sketch_agg`, lgK = 12 → ~1.6 % RSE), and each window is a
    * UNION of 7 day-grain sketches — so the windowed fan-out touches a
    * days-sized relation, never the events again. That is the only
    * shape that survives 100 TB: the exact form re-shuffles every
    * (day, user) row into all 7 windows it belongs to and re-distincts
    * per window, multiplying the heavy shuffle by the window length,
    * while the sketch path pays one event-scale agg total.
    *
    * Oracle-gated through the bounds-AUDIT pattern (the
    * `*_approx_audit` discipline): the output carries the EXACT
    * distinct count (computed via the fan-out — affordable at audit
    * scale) plus a within-bound flag on the sketch estimate; DuckDB
    * recomputes the exact columns and pins the flag at literal 1. HLL
    * union is commutative/idempotent and the estimate depends only on
    * the merged register state, so the flag is deterministic under any
    * partitioning; the 20 % + 3 slack bound is ≥ 12σ for lgK = 12. */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.io.Tables.events(spark, dir)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id")
    val daySketch = ev.groupBy("day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    val days = daySketch.select(col("day").as("anchor"))
    val approx = broadcast(days)
      .join(daySketch, expr(s"day BETWEEN date_sub(anchor, $slideDays) AND anchor"))
      .groupBy("anchor").agg(
        count(lit(1)).as("window_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"))
    val exact = broadcast(days)
      .join(ev.distinct(), expr(s"day BETWEEN date_sub(anchor, $slideDays) AND anchor"))
      .groupBy("anchor").agg(countDistinct("user_id").as("exact_users"))
    approx.join(exact, Seq("anchor"))
      .selectExpr("anchor AS day", "window_days", "exact_users",
        "CAST(abs(approx_users - exact_users) <= greatest(CAST(3 AS BIGINT), " +
          "CAST(ceil(0.2 * exact_users) AS BIGINT)) AS INT) AS within_bound")
      .orderBy("day")
  }

  private val kmvK = 64

  /** KMV (bottom-k) distinct sketch per event type: keep the [[kmvK]]
    * smallest user-id hashes and estimate N̂ = (k−1)·2³²/h₍k₎
    * (Bar-Yossef et al. 2002) — the OTHER mergeable distinct sketch
    * next to HLL, with a property HLL lacks: the kept hashes are a
    * uniform SAMPLE of the distinct set (so the same 8·k bytes answer
    * "how many" AND "show me a few"). Mergeability rides the native
    * [[graft.functions.TopKAgg]] heap (bottom-k = top-k of the
    * negated hash; merge folds heaps, partitioning-independent), so
    * the whole sketch is one map-side-combined agg. Bounds-AUDIT
    * gated: exact distinct + within-bound flag (k = 64 → RSE ≈ 13 %,
    * the 50 % + 3 bound is ≈ 4σ); groups with < k distinct hashes
    * are EXACT by construction. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    import graft.llm.Gen.hexPrefix32
    val hashes = graft.io.Tables.events(spark, dir)
      .selectExpr("event_type",
        s"${hexPrefix32("md5(CAST(user_id AS STRING))")} AS h")
      .distinct()
    val grp = hashes.groupBy("event_type").agg(
      count(lit(1)).as("n_hashes"),
      expr(s"graft_topk(-h, $kmvK)").as("negs"))
    grp.selectExpr("event_type", "n_hashes",
        // h_(k) = the k-th smallest hash = -(last kept element)
        "-element_at(negs, size(negs)) AS hk")
      .selectExpr("event_type", "n_hashes",
        s"""CASE WHEN n_hashes < $kmvK THEN n_hashes
             ELSE CAST(floor(($kmvK - 1) * 4294967296.0 / hk) AS BIGINT)
           END AS est""")
      .selectExpr("event_type", "n_hashes", "est",
        "CAST(abs(est - n_hashes) <= greatest(CAST(3 AS BIGINT), " +
          "CAST(ceil(0.5 * n_hashes) AS BIGINT)) AS INT) AS within_bound")
      .orderBy("event_type")
  }

  val kmvDistinctOracle: String = {
    import graft.llm.Gen.hexPrefix32
    s"""WITH hs AS (SELECT DISTINCT event_type,
           ${hexPrefix32("md5(CAST(user_id AS VARCHAR))")} AS h
         FROM events),
       rk AS (SELECT event_type, h, row_number() OVER
           (PARTITION BY event_type ORDER BY h) AS r
         FROM hs),
       g AS (SELECT event_type, count(*) AS n_hashes FROM hs GROUP BY event_type),
       kth AS (SELECT event_type, h AS hk FROM rk WHERE r = $kmvK),
       est_t AS (SELECT g.event_type, CAST(g.n_hashes AS BIGINT) AS n_hashes,
           CASE WHEN g.n_hashes < $kmvK THEN g.n_hashes
             ELSE CAST(floor(($kmvK - 1) * 4294967296.0 / kth.hk) AS BIGINT)
           END AS est
         FROM g LEFT JOIN kth ON g.event_type = kth.event_type)
       SELECT event_type, n_hashes, CAST(est AS BIGINT) AS est,
         CAST(abs(est - n_hashes) <= greatest(CAST(3 AS BIGINT),
           CAST(ceil(0.5 * n_hashes) AS BIGINT)) AS INTEGER) AS within_bound
       FROM est_t ORDER BY event_type"""
  }

  /** DAU/WAU stickiness: per day, exact daily active users over the
    * trailing-7-day actives, the product-analytics staple. The exact
    * WAU side reuses [[slidingDistinct]]'s day-grain fan-out (at
    * 100 TB swap in its sketch path); DAU rides the same distinct
    * (day, user) relation. Ratio is the only float. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.io.Tables.events(spark, dir)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id").distinct()
    val dau = ev.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val days = dau.select(col("day").as("anchor"))
    val wau = broadcast(days)
      .join(ev, expr(s"day BETWEEN date_sub(anchor, $slideDays) AND anchor"))
      .groupBy("anchor").agg(countDistinct("user_id").as("wau"))
    dau.join(wau.withColumnRenamed("anchor", "day"), Seq("day"))
      .selectExpr("day", "dau", "wau",
        "CAST(dau AS DOUBLE) / wau AS stickiness")
      .orderBy("day")
  }

  val stickinessOracle: String =
    s"""WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ev GROUP BY day),
        wau AS (SELECT d.day AS day, count(DISTINCT e.user_id) AS wau
                FROM dau d JOIN ev e
                ON e.day BETWEEN d.day - $slideDays AND d.day
                GROUP BY d.day)
        SELECT dau.day, dau.dau, wau.wau,
          CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
        FROM dau JOIN wau ON dau.day = wau.day ORDER BY dau.day"""

  val slidingDistinctOracle: String =
    s"""WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        days AS (SELECT DISTINCT day AS anchor FROM ev),
        win AS (SELECT d.anchor, e.day, e.user_id
                FROM days d JOIN ev e
                ON e.day BETWEEN d.anchor - $slideDays AND d.anchor)
        SELECT anchor AS day,
          count(DISTINCT day) AS window_days,
          count(DISTINCT user_id) AS exact_users,
          1 AS within_bound
        FROM win GROUP BY anchor ORDER BY day"""

  // ---- CMS inner-product join-size estimation ----

  /** `orders_join_size_sketch`: equi-join cardinality estimation from
    * COUNT-MIN INNER PRODUCTS (Cormode & Muthukrishnan 2005 §4.2 /
    * the AGMS family) — the statistic a cost-based optimizer needs
    * before it picks a join strategy: |O ⋈ L| = Σ_k c_O(k)·c_L(k),
    * estimated as min over hash rows of Σ_b cmsO[r][b]·cmsL[r][b]
    * without touching per-key truth. Two theorems make the audit
    * deterministic under any partitioning (CMS cells are plain sums):
    * the estimate NEVER undercounts (collisions only add cross
    * terms), and the overshoot is at most Σ cross-products of
    * colliding keys — audited here against the generous closed-form
    * slack n_O·n_L/W per row. The exact side is the per-key
    * count-product sum (one keyed agg per relation + one equi-join on
    * the key grid — the key-grain relation the sketch exists to
    * avoid at 100 TB, computed here only because the audit needs
    * truth). */
  def joinSizeSketch(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.io.Tables.table(spark, dir, "orders")
      .selectExpr("o_orderkey AS k")
    val l = graft.io.Tables.table(spark, dir, "lineitem")
      .selectExpr("l_orderkey AS k")
    val rowsIdx = expr(s"explode(sequence(0, ${rows.size - 1}))")
    def cms(df: org.apache.spark.sql.DataFrame, name: String) =
      df.select(col("k"), rowsIdx.as("i"))
        .select(col("i"), expr(bucketByRow("k", "i")).as("bucket"))
        .groupBy("i", "bucket").agg(count(lit(1)).as(name))
    val co = cms(o, "c_o")
    val cl = cms(l, "c_l")
    val est = co.join(cl, Seq("i", "bucket"))
      .groupBy("i").agg(sum(expr("c_o * c_l")).as("row_ip"))
      .agg(min("row_ip").as("est_join"))
    val exact = o.groupBy("k").agg(count(lit(1)).as("n_o"))
      .join(l.groupBy("k").agg(count(lit(1)).as("n_l")), Seq("k"))
      .agg(coalesce(sum(expr("n_o * n_l")), lit(0L)).as("exact_join"))
    val sizes = o.agg(count(lit(1)).as("n_o_rows"))
      .crossJoin(broadcast(l.agg(count(lit(1)).as("n_l_rows"))))
    est.crossJoin(broadcast(exact)).crossJoin(broadcast(sizes))
      .selectExpr("CAST(n_o_rows AS BIGINT) AS n_o_rows",
        "CAST(n_l_rows AS BIGINT) AS n_l_rows",
        "CAST(exact_join AS BIGINT) AS exact_join",
        "CAST(est_join AS BIGINT) AS est_join",
        "est_join - exact_join AS overshoot",
        "CASE WHEN est_join >= exact_join THEN 1 ELSE 0 END AS never_under",
        s"CASE WHEN (est_join - exact_join) * $W <= n_o_rows * n_l_rows " +
          "THEN 1 ELSE 0 END AS within_slack")
  }

  val joinSizeSketchOracle: String = {
    def cmsSql(table: String, keyCol: String, name: String): String = {
      val selects = rows.indices.map { r =>
        s"SELECT $r AS i, ${bucketExpr(keyCol, r)} AS bucket FROM $table"
      }.mkString(" UNION ALL ")
      s"SELECT i, bucket, count(*) AS $name FROM ($selects) GROUP BY i, bucket"
    }
    s"""WITH co AS (${cmsSql("orders", "o_orderkey", "c_o")}),
        cl AS (${cmsSql("lineitem", "l_orderkey", "c_l")}),
        ip AS (SELECT co.i, sum(co.c_o * cl.c_l) AS row_ip
          FROM co JOIN cl ON co.i = cl.i AND co.bucket = cl.bucket
          GROUP BY co.i),
        est AS (SELECT min(row_ip) AS est_join FROM ip),
        xo AS (SELECT o_orderkey AS k, count(*) AS n_o
          FROM orders GROUP BY 1),
        xl AS (SELECT l_orderkey AS k, count(*) AS n_l
          FROM lineitem GROUP BY 1),
        ex AS (SELECT coalesce(sum(xo.n_o * xl.n_l), 0) AS exact_join
          FROM xo JOIN xl ON xo.k = xl.k),
        sz AS (SELECT (SELECT count(*) FROM orders) AS n_o_rows,
          (SELECT count(*) FROM lineitem) AS n_l_rows)
        SELECT CAST(n_o_rows AS BIGINT) AS n_o_rows,
          CAST(n_l_rows AS BIGINT) AS n_l_rows,
          CAST(exact_join AS BIGINT) AS exact_join,
          CAST(est_join AS BIGINT) AS est_join,
          CAST(est_join - exact_join AS BIGINT) AS overshoot,
          CASE WHEN est_join >= exact_join THEN 1 ELSE 0 END AS never_under,
          CASE WHEN (est_join - exact_join) * $W <= n_o_rows * n_l_rows
            THEN 1 ELSE 0 END AS within_slack
        FROM est, ex, sz"""
  }
}
