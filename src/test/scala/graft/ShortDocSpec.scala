package graft

import java.nio.file.Files
import graft.llm.Dedup

/** The empty-shingle guard under real short documents (the fixture is
  * word-soup, so this corpus manufactures the edge cases the guard
  * exists for: empty text, 1-2 word docs, exact duplicates). Cross-
  * engine parity for this corpus was verified against DuckDB when the
  * guard landed; this spec pins the Spark-side semantics. */
class ShortDocSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_shortdocs").toString
    Seq(
      (0L, "hi", "en", "web", 2L),
      (1L, "two words", "en", "web", 9L),
      (2L, "exactly three words", "en", "web", 19L),
      (3L, "exactly three words", "en", "web", 19L),
      (4L, "a much longer document with many repeated words repeated words repeated words", "en", "web", 78L),
      (5L, "a much longer document with many repeated words repeated words repeated words", "en", "web", 78L),
      (6L, "", "en", "web", 0L),
      (7L, "short", "es", "wiki", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(d)
    // Tables.documents expects <dir>/documents.parquet
    val part = new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).head
    val out = Files.createTempDirectory("graft_shortdocs_tbl").toString
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(out, "documents.parquet"))
    out
  }

  test("docs under 3 words get NULL bands and never become candidates") {
    val sigs = Dedup.minhashSignatures(spark, dir).collect()
    assert(sigs.length == 8)
    val shortIds = Set(0L, 1L, 6L, 7L)
    sigs.foreach { r =>
      val isShort = shortIds.contains(r.getAs[Long]("doc_id"))
      (0 until 4).foreach { b =>
        assert(r.isNullAt(r.fieldIndex(s"band_$b")) == isShort)
      }
    }
    val pairs = Dedup.minhashPairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L), (4L, 5L))) // exact dups only; no short doc
  }

  test("cluster collapse and deduped corpus are exact on the tiny graph") {
    val labels = Dedup.dedupClusters(spark, dir).as[(Long, Long)].collect().toMap
    assert(labels == Map(2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L))
    val kept = Dedup.dedupedCorpus(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 4L, 6L, 7L)) // losers 3 and 5 removed
  }

  test("repetition and fingerprints handle empty and short text") {
    val byId = graft.llm.TextAnalysis.repetition(spark, dir)
      .select("doc_id", "n_grams", "repetition_ratio")
      .as[(Long, Int, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(6L)._1 == 0 && byId(6L)._2 == 0.0) // empty text: zero grams
    assert(byId(0L)._1 == 0) // 1 word: zero grams
    assert(byId(4L)._2 > 0.0) // repeated 3-grams detected
  }

  test("topRepeats' exact-dup collapse equals the direct all-docs count") {
    // this corpus has two byte-identical groups (2=3, 4=5): the
    // collapsed fan-out (one rep per distinct text, multiplicity-
    // weighted counts) must reproduce the uncollapsed formulation
    // exactly — counts, tie-breaks and recovered window text
    import org.apache.spark.sql.functions._
    val got = graft.llm.TextAnalysis.topRepeats(spark, dir)
      .as[(Int, Long, String)].collect().toSeq
    val docs = graft.io.Tables.documents(spark, dir)
      .selectExpr("split(trim(lower(text)), '\\\\s+') AS wv")
    val want = Seq(1, 2, 4, 8, 16, 32, 64).flatMap { l =>
      val cnts = docs
        .selectExpr(s"""explode(CASE WHEN size(wv) >= $l
            THEN transform(sequence(0, size(wv) - $l),
                           i -> array_join(slice(wv, i + 1, $l), ' '))
            ELSE array() END) AS t""")
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy(desc("cnt"), col("t"))
        .as[(String, Long)].collect().toSeq
      cnts.headOption.map { case (t, c) => (l, c, t) }
    }
    assert(want.exists(_._2 >= 4), "fixture lacks cross-doc repeats — vacuous")
    assert(got == want, s"collapsed topRepeats diverged:\n got=$got\nwant=$want")
  }
}
