package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for skew and co-location (SURVEY §4.4):
  *
  *   - [[saltedAgg]]: two-phase aggregation — partial aggregate on
  *     (keys + salt) spreads a hot key over `salts` reducers, then the
  *     final aggregate combines the partials. Identical results to a
  *     direct groupBy for decomposable aggregates (sum/count/min/max).
  *   - [[saltedJoin]]: skew-safe equi-join — the large (skewed) side is
  *     salted with a deterministic hash of its whole row; the small
  *     side is replicated across all salt values, so a hot key's rows
  *     land on `salts` tasks instead of one. AQE's skew-join handles
  *     moderate skew automatically; this is the explicit fallback for
  *     pathological keys.
  *   - [[bucketedTable]]: write-side bucketing — co-locates future
  *     joins/aggregations on the bucket key with NO exchange at read
  *     time (the 100 TB answer to repeated joins on the same key).
  */
object Scale {

  /** Deterministic salt in [0, salts) from a hash of `cols`. */
  def saltCol(salts: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Two-phase (salted) sum+count aggregation over `keys`.
    *
    * The salt hashes only (keys + valueCol), not the whole row: any
    * deterministic per-row spread works for decomposable aggregates,
    * and at 100 TB a full-width hash makes salt cost scale with scan
    * width for no extra spread. (Determinism matters: a rand() salt
    * can double-count rows under shuffle-fetch retry, SPARK-23207.
    * Caveat: a hot key whose values are ALSO constant defeats this
    * spread — add another cheap column to `saltCol` in that case.) */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      saltCol(salts, (keys :+ valueCol).map(col)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Skew-safe inner equi-join of a large skewed side with a small
    * side on `key`: large gets a row-hash salt, small is replicated
    * `salts` times. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      saltCol(salts, large.columns.map(col).toSeq))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(replicatedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed table; subsequent joins or
    * aggregations on `bucketCol` between tables bucketed the same way
    * need no shuffle (plans show SortMergeJoin with no Exchange). */
  def bucketedTable(df: DataFrame, name: String, buckets: Int,
                    bucketCol: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(name)

  /** Bloom-assisted semi-join: build a bloom filter over the FILTERED
    * dimension's keys as a DATA value (one aggregate row, a few hundred
    * KB), broadcast it, and drop non-joining fact rows BEFORE the join
    * shuffle. The exact join over the survivors repairs the bloom's
    * false positives, so the RESULT is exact — only the shuffle volume
    * is probabilistic. This is the hand-rolled form of Spark's
    * runtime-filter rewrite (pinned in `PlanContractSpec`), worth
    * owning as an operator because a materialized filter can be built
    * ONCE and reused across many queries/days, which the per-query
    * rewrite cannot. At sf0.1 the pre-filter passes ~1/5 of lineitem;
    * at 100 TB that ratio is the shuffle you didn't pay. */
  def bloomJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    graft.io.Views.register(dir, "bj_dim", graft.io.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey"))
    graft.io.Views.register(dir, "bj_fact", graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_orderkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents"))
    // might_contain requires the filter bytes as a scalar subquery (or
    // literal) — the plan broadcasts the one-row bloom aggregate to
    // every fact task. Capacity covers the sf0.1 dim (~30k keys) with
    // wide margin.
    spark.sql(
      """WITH bloom AS (SELECT graft_bloom_agg(xxhash64(o_orderkey),
             CAST(1000000 AS BIGINT), CAST(8000000 AS BIGINT)) AS bf
           FROM bj_dim),
         pre AS (SELECT l_orderkey, cents FROM bj_fact
           WHERE graft_might_contain((SELECT bf FROM bloom),
             xxhash64(l_orderkey)))
         SELECT count(*) AS n_lines,
           sum(cents) / CAST(100 AS DOUBLE) AS urgent_revenue
         FROM pre JOIN bj_dim ON pre.l_orderkey = bj_dim.o_orderkey""")
  }

  /** Oracle = the plain join: passing proves the bloom pre-filter
    * changed nothing but the work. */
  val bloomJoinOracle: String =
    """SELECT count(*) AS n_lines,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           / CAST(100 AS DOUBLE) AS urgent_revenue
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderpriority = '1-URGENT'"""

  /** Adaptive salting: read the skew diagnostic FIRST — a one-row
    * aggregate over the per-key counts — and take the two-phase salted
    * plan only when max/mean crosses `threshold`. The single-row
    * `head()` is an execution-strategy read, the same
    * runtime-statistics pattern AQE itself uses to re-plan; it is not
    * a data-path collect (the data never leaves the cluster). Returns
    * the chosen plan plus the decision, so callers (and the oracle,
    * which recomputes the ratio in SQL) can verify WHICH strategy ran,
    * not just that the numbers came out right. */
  def adaptiveSaltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
      threshold: Double): (DataFrame, Boolean) = {
    val perKey = df.groupBy(keys.map(col): _*).count()
    val stats = perKey.agg(max("count").as("mx"), avg("count").as("mn")).head()
    val salted = !stats.isNullAt(0) &&
      stats.getLong(0) / stats.getDouble(1) > threshold
    val out = if (salted) saltedAgg(df, keys, valueCol)
      else df.groupBy(keys.map(col): _*)
        .agg(sum(col(valueCol)).as(s"sum_$valueCol"),
          count(lit(1)).as("n_rows"))
    (out, salted)
  }

  /** [[adaptiveSaltedAgg]] surfaced as a query over the events table.
    * The oracle recomputes the max/mean skew ratio in SQL and emits
    * the SAME used_salting boolean, so the adaptive decision itself is
    * oracle-checked, not just the totals. */
  def adaptiveSaltedTotals(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val (agged, salted) = adaptiveSaltedAgg(ev, Seq("event_type"), "cents", 2.0)
    agged.selectExpr("event_type",
        "CAST(sum_cents AS BIGINT) / CAST(100 AS DOUBLE) AS total_value",
        "n_rows", s"CAST($salted AS BOOLEAN) AS used_salting")
      .orderBy("event_type")
  }

  val adaptiveSaltedTotalsOracle: String =
    """WITH ev AS (SELECT event_type,
          CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        pk AS (SELECT event_type, count(*) AS c FROM ev GROUP BY event_type),
        st AS (SELECT max(c) AS mx, avg(c) AS mn FROM pk),
        g AS (SELECT event_type, sum(cents) AS sc, count(*) AS n_rows
              FROM ev GROUP BY event_type)
        SELECT g.event_type,
          CAST(sc AS BIGINT) / CAST(100 AS DOUBLE) AS total_value, n_rows,
          (SELECT mx / mn > 2.0 FROM st) AS used_salting
        FROM g ORDER BY event_type"""

  import graft.llm.Gen.{Dialect, DuckD, SparkD, intDiv}

  /** Morton (z-order) bit interleave of two `bits`-bit non-negative
    * keys, as pure integer div/mod arithmetic — no engine bit-op
    * dialect, so the SAME formula (modulo integer-division spelling)
    * runs in Spark and DuckDB and stays inside whole-stage codegen. */
  private def zorderExpr(x: String, y: String, bits: Int, d: Dialect): String =
    (0 until bits).flatMap { i =>
      val p = (1L << i).toString
      Seq(s"(${intDiv(x, p, d)} % 2) * ${1L << (2 * i)}",
        s"(${intDiv(y, p, d)} % 2) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** Z-order locality report: interleave (partkey, suppkey) into a
    * 32-bit Morton key and show that every bucket of the z-keyspace
    * confines BOTH dimensions — each bucket (top 10 z-bits = top 5
    * bits of each dim) bounds partkey AND suppkey within a 2^11-wide
    * range, which is the property that makes z-clustering prune 2-D
    * predicates. [[graft.io.Writers.sortedZone]] clusters one key;
    * sorting by `zkey` instead clusters BOTH at once: parquet row-group
    * min/max stay narrow on partkey and suppkey simultaneously, so a
    * scan filtered on either dimension (or both) skips most row
    * groups. That trade is exactly why lakehouse OPTIMIZE ... ZORDER
    * exists; here it is an inspectable 32-term integer expression, not
    * an engine intrinsic. */
  def zorderLocality(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val z = zorderExpr("xk", "yk", 16, SparkD)
    graft.io.Tables.lineitem(spark, dir)
      .selectExpr("l_partkey % 65536 AS xk", "l_suppkey % 65536 AS yk")
      .selectExpr("xk", "yk", s"$z AS zkey")
      .selectExpr("zkey DIV 4194304 AS z_bucket", "xk", "yk")
      .groupBy("z_bucket")
      .agg(count(lit(1)).as("n_rows"),
        (max("xk") - min("xk")).as("x_span"),
        (max("yk") - min("yk")).as("y_span"))
      .orderBy("z_bucket")
  }

  val zorderLocalityOracle: String = {
    val z = zorderExpr("xk", "yk", 16, DuckD)
    s"""WITH k AS (SELECT l_partkey % 65536 AS xk, l_suppkey % 65536 AS yk
          FROM lineitem),
        zk AS (SELECT xk, yk, $z AS zkey FROM k),
        b AS (SELECT (zkey // 4194304) AS z_bucket, xk, yk FROM zk)
        SELECT z_bucket, count(*) AS n_rows,
          max(xk) - min(xk) AS x_span, max(yk) - min(yk) AS y_span
        FROM b GROUP BY z_bucket ORDER BY z_bucket"""
  }

  // ---- two-phase global ordered prefix (exact rank / ntile / cumsum
  //      without a one-partition WindowExec over the data grain) ----

  /** EXACT global inclusive prefix sum of `value` in the total order
    * `order`, computed in two phases so no full-grain relation ever
    * sorts in one partition (`Window.orderBy` with no partition key
    * moves ALL rows to one task — fine on a 10-row rollup, fatal on a
    * 1e9-row dimension):
    *
    *   1. rows are assigned to ORDER-ALIGNED buckets (`buckets` must
    *      be monotone non-decreasing along `order` when compared as a
    *      sorted tuple — e.g. `(-cents) DIV 1048576` for a
    *      `cents DESC` order; integer truncating division is monotone
    *      for negatives too);
    *   2. per-bucket totals roll up map-side-combined, and the bucket
    *      offsets take ONE tiny global window over the BUCKET GRAIN
    *      (bounded by the value domain / bucket width, never by row
    *      count — the [[graft.sql.Analytics.lineitemWinsorized]]
    *      prefix-percentile construction, generalized);
    *   3. offsets broadcast back and each row finishes with a window
    *      PARTITIONED by bucket — every sort is bucket-local.
    *
    * The result is bucket-width-INDEPENDENT: widths tune partition
    * sizes, never values, so the oracle hash can't see the knob.
    *
    * Tie-skew sharp edge: a bucket holds every row sharing its key
    * range, so a single hot VALUE (1e8 customers with n_orders = 1)
    * makes a hot bucket. The fix is a second bucket column derived
    * from the TIE-BREAK order column (`custkey DIV 65536`) — sound
    * ONLY when the preceding bucket columns pin the exact values of
    * all preceding order columns (otherwise the composite bucket is
    * not monotone along the order). Low-cardinality axes therefore
    * bucket by the exact value + a tie-break range; near-unique axes
    * bucket by a value range alone. */
  def orderedPrefixSum(df: DataFrame, buckets: Seq[Column],
      order: Seq[Column], value: Column, out: String,
      totalOut: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bnames = buckets.indices.map(i => s"__pb${i}_$out")
    val withB = buckets.zip(bnames).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c) }
    val bcols = bnames.map(col)
    val bsums = withB.groupBy(bcols: _*).agg(sum(value).as(s"__bsum_$out"))
    // `totalOut`: the GRAND total rides the same tiny bucket-grain
    // window pass (full-frame sum of the per-bucket sums) — a second
    // aggregate over `df` would re-execute its whole lineage, and an
    // empty-partition window over the data grain is the very plan
    // this helper exists to avoid.
    val offs = totalOut.foldLeft(bsums) { (d, t) =>
      d.withColumn(t, sum(s"__bsum_$out").over(Window.orderBy(bcols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }
      .withColumn(s"__off_$out", coalesce(
        sum(s"__bsum_$out").over(Window.orderBy(bcols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop(s"__bsum_$out")
    withB.join(broadcast(offs), bnames)
      .withColumn(out, col(s"__off_$out") + sum(value).over(
        Window.partitionBy(bcols: _*).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .drop(s"__off_$out").drop(bnames: _*)
  }

  /** EXACT global 1-based rank (row_number) in the total order
    * `order` — [[orderedPrefixSum]] of the constant 1. */
  def globalRank(df: DataFrame, buckets: Seq[Column],
      order: Seq[Column], out: String): DataFrame =
    orderedPrefixSum(df, buckets, order, lit(1L), out)

  /** Standard-SQL ntile from an exact rank: the first `n % k` tiles
    * get `n DIV k + 1` rows, the rest `n DIV k` (both Spark's NTile
    * and DuckDB's ntile implement exactly this split). The closed
    * form needs only (rank, n), so it rides [[globalRank]] with no
    * further shuffle. The ELSE branch divides by `n DIV k`, which is
    * 0 when n < k — but then `threshold = n` and the first branch
    * covers every rank, so the guarded division never evaluates. */
  def ntileFromRank(k: Int, rank: String, n: String): Column =
    expr(
      s"""CASE WHEN $rank <= ($n % $k) * (($n DIV $k) + 1)
            THEN ($rank - 1) DIV (($n DIV $k) + 1) + 1
            ELSE ($n % $k)
              + ($rank - ($n % $k) * (($n DIV $k) + 1) - 1) DIV ($n DIV $k)
              + 1 END""").cast("int")

  /** ntile(k) over the total order `order`, computed scalably:
    * [[globalRank]] + a broadcast one-row count + [[ntileFromRank]].
    * Replaces `ntile(k).over(Window.orderBy(...))` value-for-value. */
  def withNtile(df: DataFrame, k: Int, buckets: Seq[Column],
      order: Seq[Column], out: String): DataFrame = {
    val rk = s"__rank_$out"
    val nc = s"__n_$out"
    // n rides orderedPrefixSum's totalOut (the full-frame sum of the
    // per-bucket row counts) instead of a separate df.agg(count) —
    // that agg was a THIRD reference to df's lineage, and nested
    // ntile calls (RFM's three) compounded the re-planned/re-executed
    // subtree geometrically (3^k vs 2^k copies; measured as a
    // 316-Exchange physical plan on rfm_customer_scores).
    orderedPrefixSum(df, buckets, order, lit(1L), rk, totalOut = Some(nc))
      .withColumn(out, ntileFromRank(k, rk, nc))
      .drop(rk, nc)
  }
}
