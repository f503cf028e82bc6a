package graft

/** Empirical-Bayes posterior behavior on crafted per-source counts:
  * shrinkage pulls toward the prior mean, pulls small-n sources
  * harder, and vanishes when the moments refuse a beta fit. */
class ShrinkageSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    graft.llm.Curation.shrinkageOf(
      rows.toDF("source", "n_docs", "n_pass"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))

  test("posterior lies between raw rate and prior mean; small n shrinks harder") {
    // same 100% raw rate at wildly different evidence, plus ballast
    val rows = run(Seq(
      ("tiny", 10L, 10L), ("huge", 10000L, 10000L),
      ("mid1", 1000L, 700L), ("mid2", 1000L, 800L), ("mid3", 1000L, 600L)))
    val byName = rows.map(r => r._1 -> r).toMap
    val (alpha, beta) = (rows.head._5, rows.head._6)
    assert(alpha > 0 && beta > 0)
    val m = alpha / (alpha + beta)
    rows.foreach { case (_, _, _, raw, _, _, shrunk) =>
      val loM = math.min(raw, m); val hiM = math.max(raw, m)
      assert(shrunk >= loM - 1e-12 && shrunk <= hiM + 1e-12)
    }
    // both at raw 1.0, but the 10-doc source moves much further
    val pullTiny = 1.0 - byName("tiny")._7
    val pullHuge = 1.0 - byName("huge")._7
    assert(pullTiny > 10 * pullHuge)
  }

  test("identical rates give zero prior mass and no shrinkage") {
    val rows = run(Seq(("a", 100L, 50L), ("b", 200L, 100L), ("c", 400L, 200L)))
    rows.foreach { case (_, _, _, raw, alpha, beta, shrunk) =>
      assert(alpha === 0.0 && beta === 0.0)
      assert(shrunk === raw)
    }
  }

  test("fixture run is exhaustive over sources and rates are rates") {
    val out = graft.llm.Curation.sourceShrinkage(spark, sfTiny).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val raw = r.getDouble(3); val shrunk = r.getDouble(6)
      assert(raw >= 0.0 && raw <= 1.0)
      assert(shrunk >= 0.0 && shrunk <= 1.0)
    }
  }
}
