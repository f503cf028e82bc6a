package graft

import java.security.MessageDigest
import graft.llm.Similarity

/** JVM brute-force twin for the k-means|| seeding: the relational
  * rounds (broadcast candidate joins, deterministic md5 coins,
  * exact-integer thresholds) must select the IDENTICAL candidate set
  * and weights as a direct imperative replay of Bahmani et al.'s
  * algorithm with the same coins. Left-assoc accumulation mirrors the
  * generated SQL's `(a-b)*(a-b) + ...` chain, so the doubles are
  * bit-identical, not just close. */
class KmeansParallelSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def coin(vecId: Long, round: Int): Long =
    java.lang.Long.parseLong(md5hex(s"$vecId:kpp$round").take(8), 16) % 1000000L

  test("relational rounds == imperative k-means|| with the same coins") {
    val vecs = graft.io.Tables.embeddings(spark, sfTiny)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += (a(i) - b(i)) * (a(i) - b(i)); i += 1 }
      acc
    }
    val byId = vecs.toMap
    var cands = Vector((0, vecs.head._1)) // (round, id); min vec_id start
    for (r <- 1 to 3) {
      val cvs = cands.map(c => byId(c._2))
      val d2 = vecs.map { case (id, v) =>
        id -> math.round(cvs.map(c => l2sq(v, c)).min * 1e6) }
      val phi = d2.map(_._2).sum
      val picked = d2.collect {
        case (id, d) if phi > 0 &&
          coin(id, r) < (8L * d * 1000000L) / phi => (r, id)
      }
      cands = cands ++ picked
    }
    // weights: nearest candidate by (d2, cand_id)
    val weights = vecs.map { case (_, v) =>
      cands.map { case (_, cid) => (l2sq(v, byId(cid)), cid) }.min._2
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Similarity.kmeansParallelSeed(spark, sfTiny)
      .selectExpr("sel_round", "cand_id", "weight")
      .as[(Int, Long, Long)].collect()
    assert(got.map(g => (g._1, g._2)).toSet == cands.toSet,
      "selected candidate set must match the imperative replay")
    got.foreach { case (_, cid, w) =>
      assert(w == weights.getOrElse(cid, 0L), s"weight mismatch for $cid")
    }
    // all corpus mass is assigned to some candidate
    assert(got.map(_._3).sum == vecs.length.toLong)
    assert(got.length > 1, "oversampling must select beyond the seed")
  }
}
