package graft

import org.apache.spark.sql.functions._

/** Structural contracts for the column-lineage extractor: provenance
  * through projections, aggregates, windows, joins, and explodes. */
class LineageSpec extends SparkSpec {

  test("lineage through a join unions both sides' sources") {
    val o = spark.read.parquet(s"$sfTiny/orders.parquet")
    val c = spark.read.parquet(s"$sfTiny/customer.parquet")
    val df = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(col("o_orderkey"),
        (col("o_totalprice") + col("c_acctbal")).as("combined"))
    val lin = graft.ops.Lineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(lin === Set(
      ("o_orderkey", "orders", "o_orderkey"),
      ("combined", "orders", "o_totalprice"),
      ("combined", "customer", "c_acctbal")))
  }

  test("lineage through explode reaches the generator's LEAF input") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "txt")
      .select(col("id"), explode(split(col("txt"), " ")).as("tok"))
    val lin = graft.ops.Lineage.of(spark, df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // provenance resolves THROUGH the toDF rename to the local
    // relation's leaf attributes (_1, _2) — leaf-level truth, not the
    // nearest alias
    assert(lin === Set(
      ("id", "<inline>", "_1"),
      ("tok", "<inline>", "_2")))
  }

  test("rfm lineage matches the pinned contract") {
    val got = graft.ops.Lineage.rfmLineage(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val expected = Set(
      ("custkey", "orders", "o_custkey"),
      ("f_score", "orders", "o_custkey"),
      ("m_score", "orders", "o_custkey"),
      ("m_score", "orders", "o_totalprice"),
      ("monetary", "orders", "o_totalprice"),
      ("n_orders", "<none>", "<none>"),
      ("r_score", "orders", "o_custkey"),
      ("r_score", "orders", "o_orderdate"),
      ("recency_days", "orders", "o_orderdate"),
      ("segment", "orders", "o_custkey"),
      ("segment", "orders", "o_orderdate"),
      ("segment", "orders", "o_totalprice"))
    assert(got === expected)
  }
}
