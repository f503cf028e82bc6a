package graft

import graft.sql.Layout

/** The design property the oracle compare cannot state: Z-ordering
  * EXISTS to beat a one-dimensional sort on multi-dimensional probes.
  * After the 16-bit normalization fix (see [[Layout.bucketed]] doc —
  * the raw interleave measurably LOST to the linear layout), the
  * audit must show it winning, and the buckets must tile the
  * normalized space as a genuine 8×8 grid. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("z-order scans fewer rows at higher precision than linear sort") {
    val rows = Layout.zorderPruning(spark, sfTiny)
      .selectExpr("layout", "rows_scanned", "rows_matched", "scan_precision")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val lin = rows("linear"); val zo = rows("zorder")
    assert(zo._3 == lin._3, "both layouts must find the same matches")
    assert(zo._2 < lin._2, "z-order must scan fewer rows")
    assert(zo._4 > lin._4, "z-order must have higher scan precision")
  }

  test("z-order buckets form the full 8x8 tile grid with square-ish boxes") {
    val buckets = Layout.zorderLayout(spark, sfTiny)
      .filter("layout = 'zorder'")
      .selectExpr("bucket", "min_p", "max_p", "min_s", "max_s")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(buckets.length == 64, "all 64 z-buckets occupied")
    assert(buckets.map(_._1).toSet == (0L until 64L).toSet)
    // Each bucket's raw-key extent must stay inside ~1/8 of each key
    // range (one tile) plus the normalization rounding slack.
    val maxP = buckets.map(_._3).max
    val maxS = buckets.map(_._5).max
    buckets.foreach { case (b, p0, p1, s0, s1) =>
      assert((p1 - p0) <= maxP / 8 + maxP / 64 + 2,
        s"bucket $b p-extent ${p1 - p0} exceeds a tile")
      assert((s1 - s0) <= maxS / 8 + maxS / 64 + 2,
        s"bucket $b s-extent ${s1 - s0} exceeds a tile")
    }
  }
}
