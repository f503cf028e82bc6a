package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF (point-in-time) join — the full §7.3 (d) mechanism:
  * custom logical node + planner Strategy + physical operator. Spark's
  * DataFrame API has no as-of join, so the composed form
  * ([[graft.streaming.EventsStream.purchaseAttributionAsOf]]) joins
  * every left row to EVERY earlier right row of its key and keeps
  * rank 1 — at 100 TB that intermediate is O(matches), quadratic in
  * the per-key event count for active keys. The native operator is
  * the plan a time-series engine would pick: co-partition both sides
  * on the key, sort within partitions by (key, time) — both declared
  * via `requiredChildDistribution` / `requiredChildOrdering`, so
  * EnsureRequirements inserts exactly the exchanges and sorts a
  * sort-merge join would get, AQE included — then ONE forward merge
  * walk per partition emits, for each left row, the LATEST right row
  * with rt ≤ lt. Nothing quadratic, no window state beyond one
  * candidate row per key.
  *
  * v1 scope (documented, analysis-checked): key/time/tie-break are
  * BIGINT attributes; semantics are LEFT OUTER as-of with ties on rt
  * broken toward the greatest tie-break attribute (the right side is
  * expected deduplicated to one row per (key, time) — the query
  * enforces it with a pre-aggregate, which also makes the DuckDB
  * `ASOF LEFT JOIN` oracle deterministic). */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lkIdx >= 0 && ltIdx >= 0 && rkIdx >= 0 && rtIdx >= 0,
      "as-of key/time attributes must be direct child outputs")
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      var candidate: InternalRow = null
      var candKey: Long = 0L
      lIt.map { lRow =>
        val lkv = lRow.getLong(lkIdx)
        val ltv = lRow.getLong(ltIdx)
        if (candidate != null && candKey != lkv) candidate = null
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val peek = rBuf.head
          val rkv = peek.getLong(rkIdx)
          val rtv = peek.getLong(rtIdx)
          if (rkv < lkv || (rkv == lkv && rtv <= ltv)) {
            val row = rBuf.next()
            if (rkv == lkv) { candidate = row.copy(); candKey = rkv }
          } else advancing = false
        }
        joined(lRow, if (candidate != null) candidate else nullRight)
        proj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** Inject the strategy once per session (idempotent). */
  def inject(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** DataFrame-level entry: as-of join `leftDf` to `rightDf` on
    * `leftKey = rightKey`, pairing each left row with the latest right
    * row whose `rightTime` ≤ its `leftTime`. All four columns must be
    * BIGINT; output column names must not collide (rename the right
    * side first, as with any join). */
  def asOf(spark: SparkSession, leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    inject(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        sys.error(s"as-of column $name not found"))
    Seq(attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime)).foreach(a =>
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of v1 requires BIGINT key/time columns; ${a.name} is ${a.dataType}"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }

  /** `events_asof_native`: last-click purchase attribution through the
    * NATIVE operator — each purchase paired with the user's latest
    * click at-or-before it. The right side is pre-reduced to one row
    * per (user, microsecond) with the max event id (determinism for
    * both engines: ties cannot reach the as-of pick). Oracle: DuckDB's
    * built-in `ASOF LEFT JOIN` — an independent native implementation
    * of the same operator, which makes this one of the few queries
    * where BOTH engines run a special-purpose physical operator rather
    * than a rewrite of one. */
  def lastClickNative(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("us").as("c_us"))
      .agg(max("event_id").as("click_id"))
    asOf(spark, purchases, clicks, "user_id", "c_user", "p_us", "c_us")
      .selectExpr("purchase_id", "user_id", "p_us", "click_id", "c_us",
        "p_us - c_us AS lag_us")
      .orderBy("purchase_id")
  }

  val lastClickNativeOracle: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
          epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
              FROM ev WHERE event_type = 'purchase'),
        c AS (SELECT user_id AS c_user, us AS c_us, max(event_id) AS click_id
              FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.purchase_id, p.user_id, p.p_us, c.click_id, c.c_us,
          p.p_us - c.c_us AS lag_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.c_user AND c.c_us <= p.p_us
        ORDER BY p.purchase_id"""
}
