package graft

import graft.llm.Similarity

/** Facility-location coverage selection (`Similarity.coverageSelection`)
  * replayed imperatively: the relational greedy (per round: one
  * explode + marginal-gain agg over the pivoted per-vector sim map,
  * with coverage recomputed per row from the picked ids inlined as
  * literals — the r14 driver-bounded O(k) pick state — then a
  * struct-min argmax collected as one row) must walk the textbook
  * sequential greedy's exact path on the same nano-quantized
  * integers, including the summed total coverage readout. A second
  * assertion pins the submodularity invariant — marginal gains never
  * increase along the selection — which any bookkeeping bug in the
  * coverage expression would break.
  */
class CoverageSelectionSpec extends SparkSpec {

  private val budget = 64
  private val k = 6

  /** The engine's deterministic fixed-budget candidate rule, replayed
    * imperatively (see Similarity.coverHkey). */
  private def hkey(id: Long): Long =
    ((id % 1048576) * 2654435761L + id % 97) % 4294967296L

  private def nano(x: Double): Long =
    BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("relational coverage greedy equals the imperative greedy") {
    val vecs = spark.read.parquet(s"$sfTiny/embeddings.parquet")
      .selectExpr("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val byId = vecs.toMap
    val cands = vecs.map(_._1).sortBy(id => (hkey(id), id)).take(budget)
    // staged sims: (vec, cand) for vec != cand, nano-quantized
    val sims: Map[Long, Map[Long, Long]] = cands.map { c =>
      c -> vecs.map(_._1).filter(_ != c).map { v =>
        v -> nano(dot(byId(v), byId(c)) / (nrm(v) * nrm(c)))
      }.toMap
    }.toMap

    var cov = vecs.map(_._1 -> 0L).toMap
    var picked = Vector.empty[(Long, Long)]
    for (_ <- 1 to k) {
      val spent = picked.map(_._1).toSet
      val best = cands.filter(c => !spent.contains(c)).map { c =>
        val gain = sims(c).map { case (v, s) => math.max(s - cov(v), 0L) }.sum
        (c, gain)
      }.minBy { case (c, g) => (-g, c) }
      picked :+= best
      cov = cov.map { case (v, cv) =>
        v -> math.max(cv, sims(best._1).getOrElse(v, 0L))
      }
    }
    val expectedTotal = cov.values.map(c => math.max(c, 0L)).sum
    val expected = picked.zipWithIndex
      .map { case ((c, g), i) => (i + 1, c, g, expectedTotal) }.toSet

    val got = Similarity.coverageSelection(spark, sfTiny).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)

    // submodularity: marginal gains are non-increasing along the path
    val gains = picked.map(_._2)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b })
  }
}
