package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.Entities
import graft.pipelines._
import graft.sql.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    salesTransactions(spark, "/root/testdata/sf0.001")

  private def salesTransactions(s: SparkSession, dir: String): DataFrame =
    SalesRevenue.run(
      Entities.orders(s, dir),
      Entities.orderItems(s, dir),
      Entities.products(s, dir))
      .orderBy("order_id", "line_number")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sales_transactions" -> ((s, dir) => salesTransactions(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "sales_transactions" -> OracleSql.salesTransactions
  )
}
