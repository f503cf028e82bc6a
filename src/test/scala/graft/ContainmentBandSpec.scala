package graft

import graft.llm.PrefixJoin

/** The banded containment join's headline claim is LOSSLESSNESS
  * within the band — so brute-force it: every ordered pair with
  * C(small→big) ≥ 9/10 and |big| ≤ 2·|small| at sfTiny must appear,
  * with identical intersection sizes, modulo only the top-200 output
  * cap (applied under the same total order to both sides). */
class ContainmentBandSpec extends SparkSpec {
  import spark.implicits._

  test("banded containment == brute force within the band (capped identically)") {
    val docs = graft.io.Tables.documents(spark, sfTiny)
      .selectExpr("doc_id", "lower(text) AS t")
      .as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+").filter(_.nonEmpty).toSet }
    val brute = for {
      (ia, sa) <- docs
      (ib, sb) <- docs
      if ia != ib
      if sa.size < sb.size || (sa.size == sb.size && ia < ib) // orient
      if sb.size <= 2 * sa.size                               // band
      inter = (sa intersect sb).size
      if 10 * inter >= 9 * sa.size
    } yield (ia, ib, inter.toLong, sa.size.toLong, sb.size.toLong,
      inter.toDouble / sa.size)
    val bruteSorted = brute.sortBy(r => (-r._6, r._1, r._2)).take(200)
      .map(r => (r._1, r._2, r._3)).toSet
    val got = PrefixJoin.containmentPairs(spark, sfTiny)
      .selectExpr("contained_id", "container_id", "inter")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got == bruteSorted,
      s"missing=${(bruteSorted -- got).take(5)} extra=${(got -- bruteSorted).take(5)}")
  }
}
