package graft

import org.apache.spark.sql.functions._
import graft.llm.{Curation, Quantize, TextAnalysis}

/** Mathematical invariants of the continuation-session operators that
  * the value-equality oracles can't express: quantization error bounds,
  * Hamming-space sanity, shard-plan conservation, backtest identities.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization error respects the half-step bound per vector") {
    // |x − q·m/127| ≤ m/254 per dim (q = round(x·127/m) is within half
    // a step), so SSE ≤ Σ_d (m_d/254)². Verify against the actual
    // per-dim maxima with a 1e-6 relative cushion for the nano rounding.
    val dims = 64
    val maxPerDim = (0 until dims).map { i =>
      graft.io.Tables.embeddings(spark, sfTiny)
        .selectExpr(s"max(abs(CAST(element_at(embedding, ${i + 1}) AS DOUBLE))) AS m")
        .as[Double].head()
    }
    val bound = maxPerDim.map(m => (m / 254.0) * (m / 254.0)).sum
    val worst = Quantize.int8Quant(spark, sfTiny)
      .agg(max("sse_nano")).as[Long].head()
    assert(worst <= math.ceil(bound * 1e9 * (1 + 1e-6)).toLong + 1,
      s"worst sse_nano $worst exceeds bound ${bound * 1e9}")
  }

  test("binary hamming: symmetric, zero on self, matches a JVM recomputation") {
    val top = Quantize.binaryTopK(spark, sfTiny)
      .select("query_id", "vec_id", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(top.nonEmpty && top.forall(r => r._1 != r._2))
    // recompute pack + hamming for query 0's partners in the JVM
    val vecs = graft.io.Tables.embeddings(spark, sfTiny)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .as[(Long, Seq[Double])].collect().toMap
    def pack(v: Seq[Double]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0.0) acc | (1L << i) else acc }
    top.filter(_._1 == 0L).foreach { case (q, d, h) =>
      val expect = java.lang.Long.bitCount(pack(vecs(q)) ^ pack(vecs(d)))
      assert(h == expect, s"hamming($q,$d)=$h, JVM says $expect")
    }
  }

  test("shard plan conserves the curated train split exactly") {
    val plan = Curation.shardPlan(spark, sfTiny)
      .select("shard", "n_docs", "total_tokens").as[(Long, Long, Long)].collect()
    val train = Curation.curatedCorpus(spark, sfTiny)
      .filter(col("split") === "train")
      .agg(count(lit(1)), coalesce(sum("n_tokens"), lit(0L)))
      .as[(Long, Long)].head()
    assert(plan.map(_._2).sum == train._1, "shard doc mass != train docs")
    assert(plan.map(_._3).sum == train._2, "shard token mass != train tokens")
    assert(plan.map(_._1).distinct.length == plan.length, "duplicate shard ids")
  }

  test("datacard totals agree with the raw table") {
    val card = Curation.datacard(spark, sfTiny)
      .select("n_docs", "total_chars").as[(Long, Long)].head()
    val raw = graft.io.Tables.documents(spark, sfTiny)
      .agg(count(lit(1)), sum("n_chars")).as[(Long, Long)].head()
    assert(card == raw)
  }

  test("backtest: naive MASE is exactly 1 and methods cover the holdout") {
    val rows = graft.sql.Analytics.dailyRevenueBacktest(spark, sfTiny)
      .select("method", "n_days", "mase").as[(String, Long, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array("mean", "naive", "seasonal")))
    assert(rows.forall(_._2 == 7L), "holdout must be the last 7 observed days")
    val naive = rows.find(_._1 == "naive").get
    assert(naive._3 == 1.0, s"naive MASE ${naive._3}")
  }

  test("autocorrelation values are valid correlations") {
    val rows = graft.sql.Analytics.eventsDailyAutocorr(spark, sfTiny)
      .select("lag", "r").as[(Int, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(1 to 7))
    rows.foreach { case (l, r) =>
      assert(!r.isNaN && math.abs(r) <= 1.0 + 1e-12, s"lag $l r=$r") }
  }

  test("sliding distinct windows never exceed 7 days and flags hold") {
    val rows = graft.ops.Sketches.slidingDistinct(spark, sfTiny)
      .select("window_days", "within_bound").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 <= 7L))
    assert(rows.forall(_._2 == 1), "HLL estimate left its error bound")
  }

  test("HLL day sketches: partial sketches from disjoint slices merge to the one-shot estimate") {
    // the merge guarantee slidingDistinct's 100 TB story rests on:
    // executors build sketches independently, the union is exact —
    // estimate depends only on merged register state, never the split
    val ev = graft.io.Tables.events(spark, sfTiny)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id")
    val partials = (0 until 3).map { s =>
      ev.filter(col("user_id") % 3 === s)
        .groupBy("day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    }.reduce(_ unionByName _)
    val merged = partials.groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .as[(java.sql.Date, Long)].collect().toMap
    val oneShot = ev.groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .as[(java.sql.Date, Long)].collect().toMap
    assert(merged == oneShot)
  }

  test("pca power iteration: renormalized vector and positive variance axis") {
    val row = graft.llm.Quantize.pcaPower(spark, sfTiny).collect().head
    val comps = (0 until 16).map(i => row.getLong(i))
    // ∞-norm renormalization: the largest |component| is exactly ±1e9
    assert(comps.map(math.abs).max == 1000000000L, "renormalization lost")
    // Rayleigh quotient of a covariance form is non-negative, and a
    // degenerate (all-zero) direction can't emerge from a 1-vector
    assert(row.getDouble(16) > 0.0, "rayleigh must be positive")
    assert(comps.count(_ != 0L) > 1, "vector collapsed to an axis")
  }

  test("skip-gram pair mass equals the closed-form window count") {
    // Σ_docs Σ_{o=1..3} max(0, n_o − o) pairs must equal the generated
    // pair total (no pair lost or duplicated by the array transform).
    val expected = graft.io.Tables.documents(spark, sfTiny)
      .selectExpr("size(split(trim(lower(text)), '\\\\s+')) AS n")
      .selectExpr("greatest(n - 1, 0) + greatest(n - 2, 0) + greatest(n - 3, 0) AS p")
      .agg(sum("p")).as[Long].head()
    val got = TextAnalysis.skipgramPairTotalForTest(spark, sfTiny)
    assert(got == expected, s"pair mass $got != closed form $expected")
  }
}
