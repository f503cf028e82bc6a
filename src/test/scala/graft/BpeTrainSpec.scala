package graft

import graft.llm.LanguageModel

/** Reference semantics of the iterated BPE trainer on a planted
  * vocabulary — in particular the greedy leftmost-run rule ("aaaa"
  * merges positions 1-2 and 3-4, never the overlapping 2-3) and the
  * total tie order on pair counts. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def dirWith(texts: (Long, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    texts.toSeq.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("greedy run merging and tie order match reference BPE") {
    // vocabulary: aaaa (wf 1), bc (wf 3).
    // round 1: (a,a) counted with overlaps = 3, (b,c) = 3 — tie broken
    //   on the pair text, so (a,a) wins; leftmost-run merging turns
    //   aaaa into [aa, aa] (2 merges from 3 overlapping candidates).
    // round 2: (aa,aa)=1 vs (b,c)=3 — bc merges.
    // round 3: only (aa,aa)=1 remains — merges to aaaa.
    // round 4: no pairs anywhere — contributes no row.
    val dir = dirWith(1L -> "aaaa bc bc bc")
    val rows = LanguageModel.bpeTrain(spark, dir)
      .select("merge_rank", "left_tok", "right_tok", "merged", "n")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(rows == Seq(
      (1, "a", "a", "aa", 3L),
      (2, "b", "c", "bc", 3L),
      (3, "aa", "aa", "aaaa", 1L)))
  }

  test("merged tokens participate as single units in later rounds") {
    // vocabulary: ababab (wf 2). round 1: (a,b)=3·2=6 beats (b,a)=2·2=4
    //   (higher count); run a-b,b-a,a-b,b-a,a-b: candidates at 1,3,5 —
    //   non-overlapping, all merge → [ab, ab, ab].
    // round 2: (ab,ab) overlapping count = 2·2=4; leftmost merges
    //   positions (1,3) → [abab, ab].
    // round 3: (abab, ab) = 1·2=2 → [ababab].
    val dir = dirWith(1L -> "ababab ababab")
    val rows = LanguageModel.bpeTrain(spark, dir)
      .select("merge_rank", "left_tok", "right_tok", "merged", "n")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(rows == Seq(
      (1, "a", "b", "ab", 6L),
      (2, "ab", "ab", "abab", 4L),
      (3, "abab", "ab", "ababab", 2L)))
  }
}
