package graft

import org.apache.spark.sql.functions._
import graft.ops.Profile

/** Invariants for the data-integrity operators: the content checksum
  * must be order-independent but mutation-sensitive (that is its whole
  * job), the FK audit must count exactly the orphans planted in a
  * crafted star schema, and the calendar gap fill must emit a
  * contiguous, zero-filled, cumulative-consistent grid. */
class IntegritySpec extends SparkSpec {

  private def copyFixture(dir: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$sfTiny/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }

  test("table checksum is row-order-independent and mutation-sensitive") {
    val base = java.nio.file.Files.createTempDirectory("graft_ck_a").toString
    val tables = Seq("region", "nation", "customer", "orders", "lineitem")
    copyFixture(base, tables)
    val a = Profile.tableChecksum(spark, base).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // same content written in reverse order → identical signatures
    val shuffled = java.nio.file.Files.createTempDirectory("graft_ck_b").toString
    copyFixture(shuffled, tables.filterNot(_ == "lineitem"))
    spark.read.parquet(s"$sfTiny/lineitem.parquet")
      .orderBy(desc("l_orderkey"), desc("l_linenumber"), desc("l_partkey"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$shuffled/lineitem.parquet")
    val b = Profile.tableChecksum(spark, shuffled).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(a == b, "signatures must not depend on row order or layout")

    // flip ONE character in ONE region row → only region's sigs move
    val mutated = java.nio.file.Files.createTempDirectory("graft_ck_c").toString
    copyFixture(mutated, tables.filterNot(_ == "region"))
    spark.read.parquet(s"$sfTiny/region.parquet")
      .withColumn("r_name", when(col("r_regionkey") === 0,
        concat(col("r_name"), lit("X"))).otherwise(col("r_name")))
      .write.mode("overwrite").parquet(s"$mutated/region.parquet")
    val c = Profile.tableChecksum(spark, mutated).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(c("region")._1 == a("region")._1, "row count unchanged")
    assert(c("region")._2 != a("region")._2, "xor signature must move")
    tables.filterNot(_ == "region").foreach { t =>
      assert(c(t) == a(t), s"$t signature must be unaffected")
    }
  }

  test("checksum canonical encoding separates NULL position, pipe shifts, and the sentinel") {
    // The canonical row string must be INJECTIVE: concat_ws skips NULL
    // fields and a '|' inside a value shifts field boundaries, so
    // without escaping these distinct rows hash identically — exactly
    // the blind spot a migration check exists to catch.
    def ck(nameSql: String, segSql: String): (Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_ck_enc").toString
      copyFixture(dir, Seq("region", "nation", "orders", "lineitem"))
      spark.sql(
        s"""SELECT CAST(1 AS BIGINT) AS c_custkey, $nameSql AS c_name,
            CAST(0 AS BIGINT) AS c_nationkey, CAST(NULL AS DOUBLE) AS c_acctbal,
            $segSql AS c_mktsegment""")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      val r = Profile.tableChecksum(spark, dir).collect()
        .find(_.getString(0) == "customer").get
      (r.getLong(2), r.getLong(3))
    }
    val nullThenB = ck("CAST(NULL AS STRING)", "'b'")
    val bThenNull = ck("'b'", "CAST(NULL AS STRING)")
    assert(nullThenB != bThenNull, "NULL position must change the signature")
    val pipeLeft = ck("'a|b'", "'c'")
    val pipeRight = ck("'a'", "'b|c'")
    assert(pipeLeft != pipeRight, "a value '|' must not shift field boundaries")
    // a literal backslash-N value must not forge the NULL sentinel
    val literalSentinel = ck("concat(chr(92), 'N')", "'b'")
    assert(literalSentinel != nullThenB, "'\\N' value must differ from NULL")
  }

  test("fk audit is total on an empty child table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fk_empty").toString
    Seq(0L).toDF("r_regionkey").write.parquet(s"$dir/region.parquet")
    Seq((0L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((10L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((100L, 10L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    // EMPTY lineitem: sum() over it is NULL — the audit must report 0s
    Seq.empty[(Long, Long, Long)].toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(1L).toDF("p_partkey").write.parquet(s"$dir/part.parquet")
    Seq(1L).toDF("s_suppkey").write.parquet(s"$dir/supplier.parquet")
    val rows = Profile.fkIntegrity(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows("lineitem.l_orderkey -> orders.o_orderkey") == ((0L, 0L, 0L, 0L)))
    assert(rows("lineitem.l_partkey -> part.p_partkey") == ((0L, 0L, 0L, 0L)))
    assert(rows("orders.o_custkey -> customer.c_custkey") == ((1L, 0L, 0L, 0L)))
  }

  test("fk audit counts exactly the planted orphans and null keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fk").toString
    Seq(0L).toDF("r_regionkey").write.parquet(s"$dir/region.parquet")
    // nation 1 points at missing region 5
    Seq((0L, 0L), (1L, 5L)).toDF("n_nationkey", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    // customer 11 points at missing nation 9
    Seq((10L, 0L), (11L, 9L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    // order 101 → missing customer 99; order 102 has a NULL key
    Seq((100L, Some(10L)), (101L, Some(99L)), (102L, None))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    // two lineitem rows orphaned on the same missing order 999
    Seq((100L, 1L, 1L), (999L, 1L, 2L), (999L, 2L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq(1L, 2L).toDF("p_partkey").write.parquet(s"$dir/part.parquet")
    Seq(1L, 2L).toDF("s_suppkey").write.parquet(s"$dir/supplier.parquet")

    val rows = Profile.fkIntegrity(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // (n_child, n_null_keys, n_orphans, n_orphan_keys)
    assert(rows("lineitem.l_orderkey -> orders.o_orderkey") == ((3L, 0L, 2L, 1L)))
    assert(rows("lineitem.l_partkey -> part.p_partkey") == ((3L, 0L, 0L, 0L)))
    assert(rows("lineitem.l_suppkey -> supplier.s_suppkey") == ((3L, 0L, 0L, 0L)))
    assert(rows("orders.o_custkey -> customer.c_custkey") == ((3L, 1L, 1L, 1L)))
    assert(rows("customer.c_nationkey -> nation.n_nationkey") == ((2L, 0L, 1L, 1L)))
    assert(rows("nation.n_regionkey -> region.r_regionkey") == ((2L, 0L, 1L, 1L)))
  }

  test("gap fill grid is complete, contiguous, and cumulative-consistent") {
    val rows = graft.streaming.EventsStream.dailyGapFill(spark, sfTiny)
      .select("event_type", "day_s", "n_events", "cum_events").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val types = rows.map(_._1).distinct
    val days = rows.map(_._2).distinct.sorted
    // full grid: every type has a row for every spine day
    assert(rows.length == types.length * days.length)
    // contiguous day spine, no gaps
    days.sliding(2).foreach { case Array(p, n) => assert(n - p == 86400L) }
    // per type: cumulative is the running sum of the daily counts
    types.foreach { t =>
      val seq = rows.filter(_._1 == t).sortBy(_._2)
      assert(seq.scanLeft(0L)(_ + _._3).tail.sameElements(seq.map(_._4)))
    }
    // zero-filled days exist only if the raw daily relation has gaps;
    // either way no count is negative and sums match the raw total
    val raw = graft.io.Tables.events(spark, sfTiny).count()
    assert(rows.map(_._3).sum == raw)
  }

  test("events operators are total on an empty events table") {
    import graft.streaming.EventsStream
    val dir = java.nio.file.Files.createTempDirectory("graft_gap_empty").toString
    spark.read.parquet(s"$sfTiny/events.parquet").limit(0)
      .write.parquet(s"$dir/events.parquet")
    val ops: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "events_daily_gap_fill" -> (EventsStream.dailyGapFill _),
      "events_carry_forward" -> (EventsStream.purchaseCarryForward _),
      "events_sliding_window" -> (EventsStream.slidingWindowAgg _),
      "events_session_window" -> (EventsStream.sessionWindows _),
      "events_top_values" -> (EventsStream.topValuesPerType _),
      "events_user_first_last" -> (EventsStream.userFirstLast _),
      "events_type_count_map" -> (EventsStream.typeCountMap _))
    ops.foreach { case (name, fn) =>
      assert(fn(spark, dir).count() == 0, s"$name not empty/total on empty input")
    }
  }
}
