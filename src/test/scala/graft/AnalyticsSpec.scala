package graft

import org.apache.spark.sql.functions._
import graft.sql.Analytics

/** Structural properties of the analytics classics that the DuckDB
  * oracle compare cannot see: skyline == the O(n²) definition, SCD2
  * intervals tile each customer's timeline exactly, the PIT join is a
  * partition of the fact table, association-rule metrics stay in
  * range, and the chi-square grid is complete with a finite statistic.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("skyline == brute-force pareto front on the distinct grain") {
    val pts = graft.io.Tables.table(spark, sfTiny, "part")
      .selectExpr("CAST(round(p_retailprice * 100) AS BIGINT) AS p", "p_size AS s")
      .groupBy("p", "s").count()
      .as[(Long, Int, Long)].collect().map { case (p, s, _) => (p, s) }
    val brute = pts.filter { case (p, s) =>
      !pts.exists { case (p2, s2) =>
        p2 <= p && s2 <= s && (p2 < p || s2 < s) }
    }.toSet
    val sky = Analytics.partsSkyline(spark, sfTiny)
      .select("price_cents", "p_size")
      .as[(Long, Int)].collect().toSet
    assert(sky == brute)
    assert(sky.nonEmpty)
  }

  test("SCD2 versions tile [first_order, open) with no gaps or overlaps") {
    val v = Analytics.customerScd2(spark, sfTiny)
      .selectExpr("custkey", "version_no", "valid_from", "valid_to", "is_current")
      .as[(Long, Int, String, Option[String], Int)].collect()
      .groupBy(_._1)
    v.foreach { case (cust, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 == 1, s"cust $cust versions must start at 1")
      sorted.sliding(2).foreach {
        case Array((_, n1, _, to1, cur1), (_, n2, from2, _, _)) =>
          assert(n2 == n1 + 1, s"cust $cust version gap")
          assert(cur1 == 0 && to1.contains(from2),
            s"cust $cust: version $n1 must close exactly at version $n2's start")
        case _ => ()
      }
      val last = sorted.last
      assert(last._4.isEmpty && last._5 == 1,
        s"cust $cust: final version must be open and current")
    }
  }

  test("SCD2 compresses: consecutive versions always change the attribute") {
    val v = Analytics.customerScd2(spark, sfTiny)
      .selectExpr("custkey", "version_no", "priority")
      .as[(Long, Int, String)].collect()
      .groupBy(_._1)
    v.foreach { case (cust, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a != b,
          s"cust $cust: adjacent versions with identical priority — not compressed")
        case _ => ()
      }
    }
  }

  test("PIT join partitions the fact table (totals reconcile)") {
    val li = graft.io.Tables.lineitem(spark, sfTiny)
    val nAll = li.count()
    val centsAll = li.selectExpr(
      "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c")
      .agg(sum("c")).as[Long].head()
    val pit = Analytics.lineitemPitPriority(spark, sfTiny)
      .selectExpr("n_items", "CAST(round(revenue * 100) AS BIGINT) AS c")
      .as[(Long, Long)].collect()
    assert(pit.map(_._1).sum == nAll, "every line item matches exactly one version")
    assert(pit.map(_._2).sum == centsAll, "revenue is conserved through the PIT join")
  }

  test("association rules: metrics in range, pair counts symmetric") {
    val rules = Analytics.brandAssociationRules(spark, sfTiny)
      .selectExpr("antecedent", "consequent", "n_ab", "support", "confidence", "lift")
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(rules.nonEmpty)
    rules.foreach { case (a, b, nAb, sup, conf, lift) =>
      assert(a != b)
      assert(nAb >= 3)
      assert(sup > 0 && sup <= 1)
      assert(conf > 0 && conf <= 1)
      assert(lift > 0)
    }
    // directed pair counts are symmetric: n(A→B) == n(B→A)
    val byPair = rules.map(r => (r._1, r._2) -> r._3).toMap
    byPair.foreach { case ((a, b), n) =>
      byPair.get((b, a)).foreach(m => assert(m == n))
    }
  }

  test("chi-square grid is the full cross product with a finite statistic") {
    val rows = Analytics.eventsChiSquare(spark, sfTiny)
      .selectExpr("event_type", "dow", "observed", "expected", "contrib", "chi2", "dof")
      .as[(String, Long, Long, Double, Double, Double, Long)].collect()
    val types = rows.map(_._1).distinct.length
    val dows = rows.map(_._2).distinct.length
    assert(rows.length == types * dows, "grid must be complete (zero cells included)")
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 6))
    assert(rows.forall(_._5 >= 0), "contributions are squares — never negative")
    val chi2 = rows.head._6
    assert(rows.forall(_._6 == chi2), "statistic is one number for the table")
    assert(chi2 >= 0 && !chi2.isNaN && !chi2.isInfinite)
    assert(rows.head._7 == (types - 1).toLong * (dows - 1))
    // expected counts reproduce the observed total
    val nTotal = rows.map(_._3).sum
    assert(math.abs(rows.map(_._4).sum - nTotal) < 1e-6)
  }

  test("SCD2 merge: folding three time-ordered batches == one-shot build") {
    val all = Analytics.orderEvents(spark, sfTiny)
    val cuts = Seq("DATE '1998-06-01'", "DATE '2000-01-01'")
    val b1 = all.filter(s"odate < ${cuts(0)}")
    val b2 = all.filter(s"odate >= ${cuts(0)} AND odate < ${cuts(1)}")
    val b3 = all.filter(s"odate >= ${cuts(1)}")
    val folded = Analytics.scd2Merge(Analytics.scd2Merge(
      Analytics.scd2FromEvents(b1), b2), b3)
    val oneShot = Analytics.scd2FromEvents(all)
    val key = Seq("custkey", "version_no", "priority", "valid_from",
      "valid_to", "version_key")
    val f = folded.selectExpr(key.map(c => s"CAST($c AS STRING)"): _*)
      .as[(String, String, String, String, String, String)].collect().toSet
    val o = oneShot.selectExpr(key.map(c => s"CAST($c AS STRING)"): _*)
      .as[(String, String, String, String, String, String)].collect().toSet
    assert(f == o)
    assert(f.nonEmpty)
  }

  test("SCD2 merge rejects an out-of-order batch instead of corrupting") {
    // History for one customer: A@Jan(k1), A@Feb(k2) — compressed away
    // as a non-change — B@Mar(k3). The batch interleaves B@Jan-15(k4),
    // which in a full rebuild RE-EXPOSES the Feb event as a change
    // point (prev flips from A to B): 4 versions. The merge path can
    // never recover Feb — compression already dropped it — so the
    // unchecked result has 2 versions. This is exactly the silent
    // corruption the validate guard turns into a loud failure.
    import java.sql.Date
    val hist = Seq(
      (1L, Date.valueOf("2020-01-01"), 1L, "A"),
      (1L, Date.valueOf("2020-02-01"), 2L, "A"),
      (1L, Date.valueOf("2020-03-01"), 3L, "B"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val batch = Seq((1L, Date.valueOf("2020-01-15"), 4L, "B"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val base = Analytics.scd2FromEvents(hist)
    val e = intercept[IllegalStateException] {
      Analytics.scd2Merge(base, batch).count()
    }
    assert(e.getMessage.contains("append-only"))
    // validate=false documents the unchecked fast path — and its wrong
    // answer, which is the reason the guard defaults on.
    assert(Analytics.scd2Merge(base, batch, validate = false).count() == 2)
    assert(Analytics.scd2FromEvents(hist.unionByName(batch)).count() == 4)
    // An in-order batch (strictly after Mar) passes the guard and
    // lands on the full rebuild, validated or not.
    val ok = Seq((1L, Date.valueOf("2020-04-01"), 5L, "A"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    assert(Analytics.scd2Merge(base, ok).count() ==
      Analytics.scd2FromEvents(hist.unionByName(ok)).count())
  }

  test("SCD2 merge guard catches batches behind a COMPRESSED-AWAY trailing event") {
    // History A@Jan (kept), A@Mar (same priority — compressed away):
    // the dimension's last CHANGE point is Jan, but the last EVENT is
    // Mar. A batch B@Feb passes a max(valid_from) check (Feb > Jan)
    // yet a full rebuild re-exposes Mar as a change (A,B,A = 3
    // versions) while the merge can only see (A,B) = 2 — the exact
    // silent divergence the round-6 advice flagged. The guard must
    // validate against the last EVENT marker and reject.
    import java.sql.Date
    val hist = Seq(
      (1L, Date.valueOf("2020-01-01"), 1L, "A"),
      (1L, Date.valueOf("2020-03-01"), 2L, "A"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val base = Analytics.scd2FromEvents(hist)
    assert(base.count() == 1, "trailing non-change event is compressed away")
    val batch = Seq((1L, Date.valueOf("2020-02-01"), 3L, "B"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val e = intercept[IllegalStateException] {
      Analytics.scd2Merge(base, batch).count()
    }
    assert(e.getMessage.contains("append-only"))
    assert(Analytics.scd2FromEvents(hist.unionByName(batch)).count() == 3)
    assert(Analytics.scd2Merge(base, batch, validate = false).count() == 2)
    // same-DATE interleave caught through the order-key tie-break:
    // k=1 orders before the existing Mar event's k=2 on the same day
    val tied = Seq((1L, Date.valueOf("2020-03-01"), 1L, "B"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    // rebuild a fresh base with keys leaving room below k=2
    val hist2 = Seq(
      (1L, Date.valueOf("2020-01-01"), 0L, "A"),
      (1L, Date.valueOf("2020-03-01"), 2L, "A"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val base2 = Analytics.scd2FromEvents(hist2)
    intercept[IllegalStateException] {
      Analytics.scd2Merge(base2, tied).count()
    }
    // and an append strictly after the last EVENT still merges ==
    // full rebuild, including the marker advancing to the new event
    val ok = Seq((1L, Date.valueOf("2020-04-01"), 9L, "B"))
      .toDF("custkey", "odate", "o_orderkey", "priority")
    val merged = Analytics.scd2Merge(base, ok)
    val rebuilt = Analytics.scd2FromEvents(hist.unionByName(ok))
    val cols = Seq("custkey", "version_no", "priority", "valid_from",
      "valid_to", "version_key", "last_odate", "last_okey")
    assert(
      merged.selectExpr(cols.map(c => s"CAST($c AS STRING)"): _*)
        .collect().map(_.toSeq).toSet ==
      rebuilt.selectExpr(cols.map(c => s"CAST($c AS STRING)"): _*)
        .collect().map(_.toSeq).toSet)
  }

  test("CUSUM window closed form == the sequential max(0, ...) recursion") {
    val daily = graft.io.Tables.events(spark, sfTiny)
      .selectExpr("event_type", "CAST(date_trunc('day', ts) AS DATE) AS day")
      .groupBy("event_type", "day").count()
      .orderBy("event_type", "day")
      .selectExpr("event_type", "CAST(count AS BIGINT) AS c")
      .as[(String, Long)].collect()
    val expected = daily.groupBy(_._1).map { case (et, rows) =>
      val cs = rows.map(_._2)
      val t = cs.sum; val d = cs.length.toLong; val pen = t / 2
      var s = 0L; var maxS = 0L; var alarms = 0L
      cs.foreach { c =>
        s = math.max(0L, s + (d * c - t - pen))
        maxS = math.max(maxS, s)
        if (s > 2 * t) alarms += 1
      }
      et -> ((maxS, alarms))
    }
    val got = graft.sql.Analytics.eventsCusumDrift(spark, sfTiny)
      .selectExpr("event_type", "max_cusum_scaled", "n_alarm_days")
      .as[(String, Long, Long)].collect()
      .map { case (et, m, a) => et -> ((m, a)) }.toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("OLS readout is well-formed and matches the two-point closed form") {
    val r = Analytics.dailyRevenueTrend(spark, sfTiny)
      .selectExpr("n_days", "slope_per_day", "intercept", "r2", "forecast_30d")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 > 100)
    assert(r._4 >= 0 && r._4 <= 1, s"r2 out of range: ${r._4}")
    assert(!r._2.isNaN && !r._3.isNaN && !r._5.isNaN)
  }

  test("Theil-Sen slope is the exact median of pairwise slopes") {
    val series = graft.io.Tables.lineitem(spark, sfTiny)
      .selectExpr(
        """CAST((extract(year FROM CAST(l_shipdate AS DATE)) - 1970) * 12
            + extract(month FROM CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS x""",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c")
      .groupBy("x").agg(expr("sum(c) DIV 100").as("y"))
      .as[(Long, Long)].collect()
    val slopes = (for {
      (x1, y1) <- series; (x2, y2) <- series if x1 < x2
    } yield (y2 - y1).toDouble / (x2 - x1).toDouble).sorted
    val expected = slopes((slopes.length - 1) / 2)
    val got = Analytics.monthlyRevenueTheilSen(spark, sfTiny)
      .selectExpr("n_pairs", "ts_slope").as[(Long, Double)].head()
    assert(got._1 == slopes.length)
    assert(got._2 == expected)
  }

  test("diversity measures stay in their theoretical ranges") {
    val rows = Analytics.docsSourceDiversity(spark, sfTiny)
      .selectExpr("source", "n_docs", "n_langs", "gini_impurity",
        "effective_langs", "entropy_nats", "kl_vs_corpus")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nLangs, gini, eff, ent, kl) =>
      assert(nLangs >= 1 && nLangs <= nDocs)
      assert(gini >= 0 && gini < 1, s"$src gini $gini")
      assert(eff >= 1 && eff <= nLangs, s"$src effective langs $eff vs $nLangs")
      assert(ent >= 0 && ent <= math.log(nLangs.toDouble) + 1e-9, s"$src entropy $ent")
      // Gibbs: KL >= 0; quantization can dip a hair below zero only at KL == 0
      assert(kl >= -1e-6, s"$src KL $kl")
    }
  }

  test("KM curve: monotone risk set, survival in (0,1] non-increasing, matches brute force") {
    val rows = Analytics.customerSurvivalKm(spark, sfTiny)
      .selectExpr("duration_days", "n_at_risk", "n_events", "n_censored",
        "hazard", "survival")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1)
        assert(a._2 > b._2, "risk set must strictly shrink between event times")
        assert(a._6 >= b._6, "survival must be non-increasing")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r._3 >= 1 && r._3 <= r._2)
      assert(r._5 > 0 && r._5 <= 1)
      assert(r._6 >= 0 && r._6 <= 1)
    }
    // brute-force KM from raw durations (plain double product)
    val orders = graft.io.Tables.orders(spark, sfTiny)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d", "o_orderkey")
      .as[(Long, java.sql.Date, Long)].collect()
    val anchor = orders.map(_._2.toLocalDate).max
    val durations = orders.groupBy(_._1).values.flatMap { os =>
      val ds = os.sortBy(o => (o._2.toLocalDate.toEpochDay, o._3)).map(_._2.toLocalDate)
      val gaps = ds.sliding(2).collect { case Array(a, b) =>
        (b.toEpochDay - a.toEpochDay, 1) }.toSeq
      gaps :+ ((anchor.toEpochDay - ds.last.toEpochDay, 0))
    }.toSeq
    var atRisk = durations.size.toLong
    var s = 1.0
    val brute = durations.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (dur, ds) =>
        val d = ds.count(_._2 == 1).toLong
        val out = if (d > 0) {
          s *= (atRisk - d).toDouble / atRisk
          Some(dur -> s)
        } else None
        atRisk -= ds.size
        out
    }.toMap
    rows.foreach { r =>
      assert(math.abs(r._6 - brute(r._1)) < 2e-6,
        s"survival at ${r._1}: engine ${r._6} vs brute ${brute(r._1)}")
    }
  }

  test("MAD outliers: flagged set is exactly the integer-exact 3-sigma exceedances") {
    val series = graft.io.Tables.lineitem(spark, sfTiny)
      .selectExpr(
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT) AS x",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS c")
      .groupBy("x").agg(expr("sum(c) DIV 100").as("y"))
      .as[(Long, Long)].collect()
    def lowerMedian(v: Seq[Long]): Long = v.sorted.apply((v.size - 1) / 2)
    val med = lowerMedian(series.map(_._2).toSeq)
    val mad = lowerMedian(series.map(p => math.abs(p._2 - med)).toSeq)
    val expected = series.filter(p =>
      mad > 0 && math.abs(p._2 - med) * 10000 > 3L * 14826 * mad).map(_._1).toSet
    val got = Analytics.dailyRevenueOutliers(spark, sfTiny)
      .selectExpr("day_number").as[Long].collect().toSet
    assert(got == expected)
  }

  test("RFM segments cover every customer exactly once") {
    val nCust = graft.io.Tables.orders(spark, sfTiny)
      .select("o_custkey").distinct().count()
    val seg = Analytics.rfmSegments(spark, sfTiny)
      .selectExpr("segment", "n_customers").as[(String, Long)].collect()
    assert(seg.map(_._2).sum == nCust)
    assert(seg.map(_._1).distinct.length == seg.length)
  }
}
