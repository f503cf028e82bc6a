package graft

import graft.llm.LanguageModel

/** JVM brute-force twin for the unigram-LM Viterbi segmentation: the
  * relational DP (16 bounded rounds, packed score/tie-break BIGINT)
  * must equal a direct imperative Viterbi over the same vocabulary —
  * maximizing total nano log-prob, then minimizing piece count. */
class UnigramViterbiSpec extends SparkSpec {
  import spark.implicits._

  test("relational DP == imperative Viterbi on the fixture vocabulary") {
    val docs = graft.io.Tables.documents(spark, sfTiny)
      .selectExpr("lower(text) AS t").as[String].collect()
    val words = docs.flatMap(_.trim.split("\\s+")).filter(w =>
      w.nonEmpty && w.length <= 16)
    val wf = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // piece vocabulary: frequency-weighted substring counts, len <= 4
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      for (i <- 0 until w.length; l <- 1 to 4 if i + l <= w.length)
        cnt.updateWith(w.substring(i, i + l)) {
          c => Some(c.getOrElse(0L) + f) }
    }
    val kept = cnt.filter { case (p, c) => c >= 5 || p.length == 1 }
    val tot = kept.values.sum
    val lnp = kept.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / tot.toDouble) * 1e9) }
    // imperative Viterbi: best (score, -pieces) per prefix
    def viterbi(w: String): (Long, Int) = {
      val n = w.length
      val best = Array.fill(n + 1)((Long.MinValue, Int.MaxValue))
      best(0) = (0L, 0)
      for (i <- 1 to n; l <- 1 to math.min(4, i)) {
        val piece = w.substring(i - l, i)
        lnp.get(piece).foreach { p =>
          val (s0, c0) = best(i - l)
          if (s0 != Long.MinValue) {
            val cand = (s0 + p, c0 + 1)
            val (s1, c1) = best(i)
            if (cand._1 > s1 || (cand._1 == s1 && cand._2 < c1))
              best(i) = cand
          }
        }
      }
      best(n)
    }
    val brute = wf.keys.map(w => w -> viterbi(w)).toMap
    val got = LanguageModel.unigramViterbi(spark, sfTiny)
      .selectExpr("word", "score_nano", "n_pieces", "wf")
      .as[(String, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet == wf.keySet)
    got.foreach { case (w, score, pieces, f) =>
      val (bs, bc) = brute(w)
      assert(score == bs, s"word '$w': score $score != brute $bs")
      assert(pieces == bc, s"word '$w': pieces $pieces != brute $bc")
      assert(f == wf(w), s"word '$w': freq mismatch")
    }
    // structural sanity: every word segments (totality via single
    // chars) and piece counts never exceed the word length
    got.foreach { case (w, _, pieces, _) =>
      assert(pieces >= 1 && pieces <= w.length)
    }
  }

  test("EM-step backtrack conserves character and piece mass exactly") {
    val viterbi = LanguageModel.unigramViterbi(spark, sfTiny)
      .selectExpr("word", "wf", "len", "n_pieces")
      .as[(String, Long, Int, Int)].collect()
    val em = LanguageModel.unigramEmStep(spark, sfTiny)
      .selectExpr("piece", "em_count", "seed_count")
      .as[(String, Long, Long)].collect()
    // every occurrence of every word is segmented: character mass in
    // equals character mass out of the backtrack
    val charsIn = viterbi.map(v => v._2 * v._3).sum
    val charsOut = em.map(e => e._2 * e._1.length).sum
    assert(charsOut == charsIn, "character mass must survive segmentation")
    // and the piece totals equal the Viterbi piece counts, weighted
    val piecesIn = viterbi.map(v => v._2 * v._4).sum
    val piecesOut = em.map(_._2).sum
    assert(piecesOut == piecesIn, "piece mass must match the DP counts")
    // the EM recount concentrates: used pieces are a strict subset of
    // the seed vocabulary and at least one piece loses all its mass
    assert(em.count(_._2 > 0) > 0)
    assert(em.count(_._2 == 0) > 0, "some seed pieces must go unused")
  }

  test("prune-and-resegment improves corpus likelihood (the hard-EM bound)") {
    val rows = LanguageModel.unigramPruneIter(spark, sfTiny)
      .selectExpr("stage", "n_vocab", "corpus_ll_nano")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val seed = rows("seed"); val em = rows("pruned_em")
    // recounting on the chosen paths is their ML estimate (Gibbs), and
    // re-segmenting under the new model can only improve further
    assert(em._3 > seed._3, s"LL must improve: ${em._3} vs ${seed._3}")
    assert(em._2 < seed._2, "pruning must shrink the vocabulary")
    assert(em._2 > 0)
  }
}
