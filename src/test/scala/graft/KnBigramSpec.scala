package graft

import graft.llm.LanguageModel

/** Hand-computed truth table for the interpolated Kneser-Ney bigram
  * model. Corpus: doc1 "a b a b c", doc2 "a b", doc3 "c".
  *
  * Bigram tokens: "a b"×3, "b a"×1, "b c"×1 → T = 3 types.
  * Antecedents: a → c1=3, n1f=1; b → c1=2, n1f=2.
  * Continuations: every w2 has n1b=1.
  * With D = 0.75:
  *   p("a b") = (3−0.75)/3 + 0.75·1/3·(1/3) = 0.75 + 1/12 = 0.8333…
  *   p("b a") = (1−0.75)/2 + 0.75·2/2·(1/3) = 0.125 + 0.25 = 0.375
  *   p("b c") = 0.375 (same counts as "b a")
  * Nano quantization: 833333333, 375000000, 375000000.
  */
class KnBigramSpec extends SparkSpec {
  import spark.implicits._

  test("KN bigram scores match the hand computation") {
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "a b"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val got = LanguageModel.knBigramScoreDf(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((4L, 2L * 833333333L + 2L * 375000000L,
      ((2L * 833333333L + 2L * 375000000L).toDouble / 4.0) / 1e9)))
    assert(got(2L) == ((1L, 833333333L, 0.833333333)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("KN scores are total over docs and stay inside (0, 1] on random corpora") {
    // Interpolated KN with D < 1 assigns every OBSERVED bigram type a
    // strictly positive probability (the continuation term is > 0 for
    // any observed continuation) and, being a discounted proper
    // conditional, never exceeds 1 — so every per-doc average lies in
    // (0, 1] when the doc has bigrams, and is exactly 0 otherwise.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 40L).map { i =>
      val n = rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val rows = LanguageModel.knBigramScoreDf(docs).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val (n, avg) = (r.getLong(1), r.getDouble(3))
      if (n == 0L) assert(avg == 0.0)
      else assert(avg > 0.0 && avg <= 1.0 + 1e-9, s"doc ${r.getLong(0)} avg=$avg")
    }
  }
}
