package graft.sql

/** DuckDB oracle SQL fragments mirroring graft.etl.Entities and the
  * pipelines, composed into the full per-query statements exported via
  * SparkEntry.oracleSql. Table names are the bare fixture table names
  * (driver registers `lineitem`, `orders`, … over the sfDir parquet).
  *
  * Every fragment must be arithmetic-identical (same ops, same
  * association order) to the Spark expression it mirrors so double
  * results match bit-for-bit; aggregate outputs over non-exact doubles
  * are rounded on both sides (SURVEY §7.4.7).
  */
object OracleSql {

  /** Mirrors Entities.orders. */
  val ordersEntity: String =
    """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
       o_orderdate AS order_date, o_orderstatus AS delivery_status,
       o_orderkey % 50 AS delivery_partner_id,
       o_orderdate + INTERVAL 1440 MINUTE AS promised_time,
       o_orderdate + INTERVAL (1080 + o_orderkey % 1440) MINUTE AS delivered_time,
       (o_orderkey % 30) / 4.0 + 1.5 AS distance_km
       FROM orders"""

  /** Mirrors Entities.orderItems. */
  val orderItemsEntity: String =
    """SELECT l_orderkey AS order_id, l_partkey AS product_id,
       l_linenumber AS line_number, l_quantity AS quantity,
       l_extendedprice / l_quantity AS unit_price
       FROM lineitem"""

  /** Mirrors Entities.products. */
  val productsEntity: String =
    """SELECT p_partkey AS product_id, p_name AS product_name,
       p_type AS category, p_retailprice AS price,
       10.0 + p_partkey % 30 AS margin_percentage
       FROM part"""

  /** Mirrors Entities.customers. */
  val customersEntity: String =
    """SELECT c_custkey AS customer_id, c_mktsegment AS area,
       CASE WHEN c_acctbal < 0 THEN 'at_risk'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS customer_segment
       FROM customer"""

  /** Mirrors Entities.feedback. */
  val feedbackEntity: String =
    """SELECT event_id AS feedback_id, event_id AS order_id,
       user_id AS customer_id, ts AS feedback_date,
       CAST(1 + event_id % 5 AS INTEGER) AS rating,
       CASE WHEN event_type = 'purchase' THEN 'Excellent'
            WHEN event_type = 'click' THEN 'good'
            WHEN event_type = 'signup' THEN 'POSITIVE'
            WHEN event_type = 'view' THEN 'okay'
            ELSE 'broken' END AS sentiment
       FROM events"""

  /** Mirrors Entities.marketing. */
  val marketingEntity: String =
    """SELECT event_id, user_id % 20 AS campaign_id,
       'campaign_' || CAST(user_id % 20 AS VARCHAR) AS campaign_name,
       event_type AS channel, date_trunc('day', ts) AS date,
       CAST(100 + event_id % 900 AS INTEGER) AS impressions,
       CAST(event_id % 120 AS INTEGER) AS clicks,
       CAST(event_id % 7 AS INTEGER) AS conversions,
       (event_id % 1000) / 4.0 AS spend,
       (event_id % 3000) / 4.0 AS revenue_generated
       FROM events"""

  /** Mirrors Entities.inventoryOld / inventoryNew. */
  def inventoryEntity(status: String): String =
    s"""SELECT l_partkey AS product_id, CAST(l_shipdate AS DATE) AS date,
       l_orderkey AS src_order, l_linenumber AS src_line,
       CAST(l_quantity AS INTEGER) AS stock_received,
       CAST(round(l_tax * 100, 0) AS INTEGER) AS damaged_stock
       FROM lineitem WHERE l_linestatus = '$status'"""

  /** Mirrors pipelines.SalesRevenue.run over the entity mapping.
    * Dedup keys (order_id, product_id) are unique in the fixtures so
    * the reference's dropDuplicates is the identity here. */
  val salesTransactions: String =
    s"""WITH ord AS (SELECT * FROM ($ordersEntity)
                     WHERE order_id IS NOT NULL AND order_date IS NOT NULL),
            item AS (SELECT * FROM ($orderItemsEntity)
                     WHERE order_id IS NOT NULL AND product_id IS NOT NULL AND quantity > 0),
            prod AS (SELECT * FROM ($productsEntity) WHERE product_id IS NOT NULL)
       SELECT i.order_id, i.line_number, i.product_id, p.category,
              o.customer_id, i.quantity, i.unit_price,
              i.quantity * i.unit_price AS line_total,
              i.quantity * i.unit_price * p.margin_percentage / 100.0 AS profit,
              CAST(year(o.order_date) AS INTEGER) AS year,
              CAST(month(o.order_date) AS INTEGER) AS month,
              CAST(day(o.order_date) AS INTEGER) AS day
       FROM item i
       JOIN ord o ON i.order_id = o.order_id
       JOIN prod p ON i.product_id = p.product_id
       ORDER BY i.order_id, i.line_number"""
}
