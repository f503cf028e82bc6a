package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The typed Dataset tier: case-class rows + a custom
  * [[org.apache.spark.sql.expressions.Aggregator]] — the API surface
  * for pipelines that want compile-time row types instead of Column
  * strings. The aggregator's buffer is the same decomposable
  * (count, integer-cents) state the untyped layer uses everywhere
  * ([[graft.curated.Aggregations]]), so the typed path inherits the
  * bit-stable arithmetic for free: `reduce` and `merge` are exact
  * integer monoid ops, and the division to money happens once in
  * `finish`.
  *
  * Scale note: an Aggregator compiles to a regular DeclarativeAggregate
  * -backed physical agg with partial aggregation (unlike
  * `groupByKey.mapGroups`, which disables map-side combine and ships
  * every row — the classic typed-API scale trap; this is the form to
  * reach for instead). */
object Typed {

  case class OrderRow(status: String, cents: Long)
  case class RevState(n: Long, cents: Long)
  case class RevOut(n_orders: Long, revenue: Double, avg_price: Double)

  /** (count, cent-sum) monoid → (n, revenue, avg). */
  object RevenueAgg extends Aggregator[OrderRow, RevState, RevOut] {
    override def zero: RevState = RevState(0L, 0L)
    override def reduce(b: RevState, a: OrderRow): RevState =
      RevState(b.n + 1, b.cents + a.cents)
    override def merge(a: RevState, b: RevState): RevState =
      RevState(a.n + b.n, a.cents + b.cents)
    override def finish(r: RevState): RevOut =
      RevOut(r.n, r.cents / 100.0, (r.cents / 100.0) / r.n)
    override def bufferEncoder: Encoder[RevState] = Encoders.product[RevState]
    override def outputEncoder: Encoder[RevOut] = Encoders.product[RevOut]
  }

  /** Per-status order revenue through the typed path. The oracle is
    * plain SQL over the same cents quantization — passing proves the
    * Aggregator's reduce/merge/finish against the relational form. */
  def typedRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.io.Tables.orders(spark, dir)
      .selectExpr("o_orderstatus AS status",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
      .as[OrderRow]
      .groupByKey(_.status)
      .agg(RevenueAgg.toColumn.name("rev"))
      .toDF("o_orderstatus", "rev")
      .selectExpr("o_orderstatus", "rev.n_orders AS n_orders",
        "rev.revenue AS revenue", "rev.avg_price AS avg_price")
      .orderBy("o_orderstatus")
  }

  val typedRevenueOracle: String =
    """WITH g AS (SELECT o_orderstatus, count(*) AS n_orders,
            CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
              AS cents
          FROM orders GROUP BY 1)
        SELECT o_orderstatus, n_orders, cents / 100.0 AS revenue,
          (cents / 100.0) / n_orders AS avg_price
        FROM g ORDER BY o_orderstatus"""
}
