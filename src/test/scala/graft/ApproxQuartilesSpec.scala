package graft

import graft.sql.Extras

/** Rank-error bound for the approx_percentile quartiles variant — the
  * same role ApproxBoundsSpec plays for the HLL distinct counts: the
  * sketch has no DuckDB oracle by construction, so the spec pins it
  * against the exact order statistics instead. With accuracy 10000 and
  * fixture groups of ~10³ rows the GK guarantee is < 1 rank, so the
  * returned value must sit within one order statistic of the target
  * rank on either side. */
class ApproxQuartilesSpec extends SparkSpec {

  test("approx quartiles sit within one rank of the exact order statistics") {
    val approx = Extras.categoryQuantityQuartilesApprox(spark, sfTiny)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val perCat = Extras.categoryQuantityQuartiles(spark, sfTiny)
      .collect().map(_.getString(0))
    assert(perCat.nonEmpty && approx.keySet == perCat.toSet)

    // raw per-category sorted values, from the same curated relation
    import org.apache.spark.sql.functions._
    val vals = SparkEntry.queries("sales_transactions")(spark, sfTiny)
      .select(col("category"), col("quantity").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).sorted }

    for ((cat, qs) <- approx; (q, p) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
      val sorted = vals(cat)
      val r = p * (sorted.length - 1)
      val lo = sorted(math.max(math.floor(r).toInt - 1, 0))
      val hi = sorted(math.min(math.ceil(r).toInt + 1, sorted.length - 1))
      assert(q >= lo && q <= hi,
        s"$cat p=$p approx=$q outside rank window [$lo, $hi]")
      // GK returns an actual data value, never an interpolation
      assert(sorted.contains(q))
    }
  }
}
