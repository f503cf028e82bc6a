package graft

import java.sql.Date
import graft.sql.Classics

/** JVM brute-force twins for the round-8 battery-completion classics
  * (Q2/Q4/Q16/Q20/Q21 adapted). The DuckDB oracle proves Spark and
  * DuckDB agree; these prove both agree with the DEFINITION — the
  * correlated EXISTS/NOT EXISTS semantics, the all-ties-kept min, the
  * NOT IN exclusion — recomputed imperatively from collected fixture
  * rows at sf0.001 (6k lines, trivially collectable in a test).
  */
class ClassicsCompletionSpec extends SparkSpec {
  import spark.implicits._

  private def lines =
    graft.io.Tables.table(spark, sfTiny, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey", "l_partkey",
        "CAST(round(l_quantity * 100) AS BIGINT) AS qty_c",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
        "CAST(l_shipdate AS DATE) AS sd")
      .as[(Long, Long, Long, Long, Long, Date)].collect()

  private def orders =
    graft.io.Tables.table(spark, sfTiny, "orders")
      .selectExpr("o_orderkey", "o_orderstatus",
        "CAST(o_orderdate AS DATE) AS od")
      .as[(Long, String, Date)].collect()

  private def daysBetween(a: Date, b: Date): Long =
    java.time.temporal.ChronoUnit.DAYS.between(a.toLocalDate, b.toLocalDate)

  test("Q21 decorrelated plan == correlated EXISTS/NOT EXISTS definition") {
    val od = orders.filter(_._2 == "F").map(o => o._1 -> o._3).toMap
    // Per (order, supplier): any line late (shipped > od + 60 days)?
    val perOS = lines.filter(l => od.contains(l._1))
      .groupBy(l => (l._1, l._2))
      .map { case ((o, s), ls) =>
        (o, s, ls.exists(l => daysBetween(od(o), l._6) > 60)) }
      .toSeq
    // The correlated definition, verbatim: supplier s waits on order o
    // iff s was late on o, another supplier has a line on o, and no
    // other supplier was late on o.
    val byOrder = perOS.groupBy(_._1)
    val waiting = perOS.filter { case (o, s, late) =>
      late &&
        byOrder(o).exists(t => t._2 != s) &&
        !byOrder(o).exists(t => t._2 != s && t._3)
    }
    val brute = waiting.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = Classics.waitingSupplier(spark, sfTiny)
      .select("s_suppkey", "numwait").as[(Long, Long)].collect().toMap
    // sfTiny has < 100 waiting suppliers, so the LIMIT never truncates
    // and the comparison is total.
    assert(brute.size < 100)
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("Q4 counts an order once no matter how many lines are late") {
    val window = orders.filter(o =>
      !o._3.toLocalDate.isBefore(java.time.LocalDate.of(1997, 1, 1)) &&
        o._3.toLocalDate.isBefore(java.time.LocalDate.of(1997, 7, 1)))
    val byOrder = lines.groupBy(_._1)
    val lateOrders = window.count { o =>
      byOrder.getOrElse(o._1, Array.empty[(Long, Long, Long, Long, Long, Date)])
        .exists(l => daysBetween(o._3, l._6) > 45) }
    val got = Classics.lateOrderPriority(spark, sfTiny)
      .select("n_orders").as[Long].collect().sum
    assert(got == lateOrders)
    assert(got > 0)
  }

  test("Q2 keeps every supplier tied at the exact-integer per-part min") {
    val rows = Classics.minCostSupplier(spark, sfTiny)
      .selectExpr("p_partkey", "s_suppkey",
        "CAST(round(unit_cost * 10000) AS BIGINT) AS cost_u")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val perPartMin = rows.groupBy(_._1).view.mapValues(_.map(_._3).min)
    rows.foreach { case (pk, _, c) =>
      assert(c == perPartMin(pk), s"part $pk emitted a non-min cost") }
    // And the min matches the brute-forced best offer over the
    // filtered dims (European suppliers, STANDARD size 10–20 parts).
    val part = graft.io.Tables.table(spark, sfTiny, "part")
      .filter("p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'")
      .select("p_partkey").as[Long].collect().toSet
    val euro = graft.io.Tables.table(spark, sfTiny, "supplier")
      .join(graft.io.Tables.table(spark, sfTiny, "nation"),
        $"s_nationkey" === $"n_nationkey")
      .join(graft.io.Tables.table(spark, sfTiny, "region"),
        $"n_regionkey" === $"r_regionkey")
      .filter("r_name = 'EUROPE'")
      .select("s_suppkey").as[Long].collect().toSet
    val bruteMin = lines
      .filter(l => part(l._3) && euro(l._2))
      .groupBy(_._3).view
      .mapValues(_.map(l => l._5 * 10000L / l._4).min).toMap
    rows.foreach { case (pk, _, c) =>
      assert(c == bruteMin(pk), s"part $pk min != brute min") }
  }

  test("Q16 NOT IN exclusion removes negative-balance suppliers' trade") {
    val bad = graft.io.Tables.table(spark, sfTiny, "supplier")
      .filter("s_acctbal < 0").select("s_suppkey").as[Long].collect().toSet
    val attrs = graft.io.Tables.table(spark, sfTiny, "part")
      .filter("p_brand <> 'Brand#45' AND p_type <> 'PROMO' " +
        "AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)")
      .selectExpr("p_partkey", "p_brand", "p_type", "p_size")
      .as[(Long, String, String, Int)].collect()
      .map(p => p._1 -> (p._2, p._3, p._4)).toMap
    val brute = lines
      .filter(l => attrs.contains(l._3) && !bad(l._2))
      .map(l => (attrs(l._3), l._2)).distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Classics.supplierPartCounts(spark, sfTiny)
      .selectExpr("p_brand", "p_type", "p_size", "supplier_cnt")
      .as[(String, String, Int, Long)].collect()
      .map(r => ((r._1, r._2, r._3), r._4)).toMap
    assert(got == brute)
    assert(got.nonEmpty)
  }

  test("Q20 emits exactly the >half-of-part-volume suppliers in ASIA") {
    val small = graft.io.Tables.table(spark, sfTiny, "part")
      .filter("p_name LIKE 'small%'").select("p_partkey")
      .as[Long].collect().toSet
    val y97 = (d: Date) => {
      val ld = d.toLocalDate
      !ld.isBefore(java.time.LocalDate.of(1997, 1, 1)) &&
        ld.isBefore(java.time.LocalDate.of(1998, 1, 1))
    }
    val perPS = lines.filter(l => small(l._3) && y97(l._6))
      .groupBy(l => (l._3, l._2)).view
      .mapValues(_.map(_._4).sum).toMap
    val perP = perPS.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val dominant = perPS.collect {
      case ((pk, sk), q) if 2 * q > perP(pk) => sk }.toSet
    val asia = graft.io.Tables.table(spark, sfTiny, "supplier")
      .join(graft.io.Tables.table(spark, sfTiny, "nation"),
        $"s_nationkey" === $"n_nationkey")
      .join(graft.io.Tables.table(spark, sfTiny, "region"),
        $"n_regionkey" === $"r_regionkey")
      .filter("r_name = 'ASIA'")
      .select("s_suppkey").as[Long].collect().toSet
    val got = Classics.dominantSupplier(spark, sfTiny)
      .select("s_suppkey").as[Long].collect().toSet
    assert(got == (dominant intersect asia))
    assert(got.nonEmpty)
  }
}
