package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoin

/** Contracts for the native as-of physical operator: equivalence to
  * the composed window form, null semantics, and stability across
  * shuffle-partition settings (the co-partitioning the exec's
  * required distribution declares must hold wherever AQE lands). */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def runNative(parts: Int): Seq[(Long, Option[Long])] = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val left = Seq(
        (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 50L),
        (4L, 20L, 500L), (5L, 30L, 10L))
        .toDF("lid", "k", "lt")
      val right = Seq(
        (11L, 10L, 90L), (12L, 10L, 150L), (13L, 10L, 151L),
        (14L, 20L, 500L), (15L, 40L, 1L))
        .toDF("rid", "rk", "rt")
      AsOfJoin.asOf(spark, left, right, "k", "rk", "lt", "rt")
        .select("lid", "rid").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq.sortBy(_._1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("as-of semantics: latest right at-or-before, nulls when none") {
    val expected = Seq(
      1L -> Some(11L),  // lt=100: latest click <= 100 is rt=90
      2L -> Some(13L),  // lt=200: rt=151 beats 150
      3L -> None,       // lt=50: nothing at-or-before
      4L -> Some(14L),  // boundary: rt == lt matches
      5L -> None)       // key 30 absent on the right
    for (parts <- Seq(1, 4, 7)) {
      assert(runNative(parts) === expected, s"at parts=$parts")
    }
  }

  test("native operator appears in the executed plan") {
    val left = Seq((1L, 10L, 100L)).toDF("lid", "k", "lt")
    val right = Seq((11L, 10L, 90L)).toDF("rid", "rk", "rt")
    val df = AsOfJoin.asOf(spark, left, right, "k", "rk", "lt", "rt")
    df.collect()
    // Spark strips the Exec suffix in plan rendering (nodeName)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "AsOfJoin exec node not in the executed plan")
  }

  test("native result equals a composed window-form as-of on the fixture") {
    val native = AsOfJoin.lastClickNative(spark, sfTiny)
      .filter(col("click_id").isNotNull)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // the composed pure-as-of: join every (purchase, earlier click)
    // pair, keep the latest click (max us, then max id) per purchase
    val ev = graft.io.Tables.events(spark, sfTiny)
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(ts) AS us")
    val p = ev.filter(col("event_type") === "purchase")
      .selectExpr("event_id AS purchase_id", "user_id", "us AS p_us")
    val c = ev.filter(col("event_type") === "click")
      .selectExpr("event_id AS click_id", "user_id", "us AS c_us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("purchase_id")
      .orderBy(desc("c_us"), desc("click_id"))
    val composed = p.join(c, Seq("user_id"))
      .filter(col("c_us") <= col("p_us"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(native === composed)
  }

  test("non-BIGINT columns are rejected at construction") {
    val left = Seq((1, 10L, 100L)).toDF("lid", "k", "lt")
      .withColumn("k", col("k").cast("int"))
    val right = Seq((11L, 10L, 90L)).toDF("rid", "rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(spark, left, right, "k", "rk", "lt", "rt")
    }
  }
}
