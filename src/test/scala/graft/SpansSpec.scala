package graft

import graft.llm.Spans

/** Properties of the duplicate-span tier the value-equality oracle
  * can't express: a PLANTED verbatim passage is found with the exact
  * expected coverage, and unique text scores zero. */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  private case class Doc(doc_id: Long, lang: String, source: String, text: String)

  // 30 distinct tokens shared verbatim by docs 1 and 2 (L=20, so the
  // run yields 11 shared windows per doc covering exactly 30 tokens);
  // doc 3 is all-unique filler of the same length.
  private val shared = (1 to 30).map(i => s"boiler$i").mkString(" ")
  private def filler(tag: String, n: Int) =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private def plantedDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_spans").toString
    val docs = Seq(
      (1L, s"${filler("alpha", 10)} $shared ${filler("omega", 5)}", "en", "web", 1),
      (2L, s"${filler("beta", 7)} $shared", "en", "web", 1),
      (3L, filler("uniq", 45), "en", "web", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("a planted cross-document passage is detected with exact coverage") {
    val dir = plantedDir()
    val spans = Spans.duplicateSpans(spark, dir)
      .select("span_hash", "n_docs", "n_occ", "sample_doc", "sample_pos")
      .collect()
    // the 30-token run has 11 window alignments; every one occurs in
    // both docs and nowhere else
    assert(spans.length == 11)
    assert(spans.forall(r => r.getLong(1) == 2 && r.getLong(2) == 2))
    // deterministic sample: smallest doc_id (1), whose shared run
    // starts at token 11 → sample positions 11..21
    assert(spans.forall(_.getLong(3) == 1L))
    assert(spans.map(_.getInt(4)).sorted.toSeq == (11 to 21))

    val cov = Spans.dupSpanCoverage(spark, dir)
      .select("doc_id", "n_tokens", "dup_tokens", "dup_share")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    // interval union collapses the 11 overlapping windows to the
    // exact 30 planted tokens in both carriers; the unique doc is 0
    assert(cov(1L) == ((45, 30L, 30.0 / 45)))
    assert(cov(2L) == ((37, 30L, 30.0 / 37)))
    assert(cov(3L) == ((45, 0L, 0.0)))
  }

  test("planted passage collapses to one maximal interval per carrier") {
    val dir = plantedDir()
    val ivals = Spans.dupSpanIntervals(spark, dir)
      .select("doc_id", "island", "span_start", "span_end", "span_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4)))
    // the 11 overlapping windows merge into exactly ONE island per
    // doc, spanning precisely the 30 planted tokens: doc 1's run sits
    // at tokens 11..40 (after 10 filler tokens), doc 2's at 8..37
    assert(ivals.toSet == Set((1L, 1, 11, 40, 30), (2L, 1, 8, 37, 30)))
  }

  test("incremental spans screen a batch against the corpus posting only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spans3").toString
    // corpus: doc 1 carries the passage, doc 2 unique. batch (ids ≡ 9
    // mod 10): doc 9 shares the passage with CORPUS doc 1; docs 19/29
    // share a passage only with EACH OTHER (batch-vs-batch must NOT
    // count — the screen is against the existing corpus posting)
    val batchShared = (1 to 25).map(i => s"newdup$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler("c1", 5)} $shared", "en", "web", 1),
      (2L, filler("c2", 40), "en", "web", 1),
      (9L, s"$shared ${filler("b9", 6)}", "en", "web", 1),
      (19L, s"${filler("b19", 4)} $batchShared", "en", "web", 1),
      (29L, s"$batchShared ${filler("b29", 3)}", "en", "web", 1))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Spans.incrementalSpans(spark, dir)
      .select("doc_id", "n_tokens", "n_windows", "n_dup_windows",
        "dup_tokens", "dup_share")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.keySet == Set(9L, 19L, 29L), "exactly the batch docs scored")
    // doc 9: 30-token shared run -> 11 corpus-matching windows
    // covering exactly those 30 tokens
    assert(out(9L) == ((36, 17L, 11L, 30L, 30.0 / 36)))
    // batch-only duplication is invisible to the corpus screen
    assert(out(19L)._3 == 0L && out(19L)._4 == 0L && out(19L)._5 == 0.0)
    assert(out(29L)._3 == 0L && out(29L)._4 == 0L && out(29L)._5 == 0.0)
  }

  test("streamed append batches == one-shot span screen (stream twin)") {
    // same independence property as IncrementalDedupSpec: each new doc
    // is screened against the STATIC corpus posting only, never other
    // batch docs, so any chopping of the append stream must yield the
    // same union of per-micro-batch results as the one-shot check.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import scala.collection.mutable.ArrayBuffer
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.io.Tables.documents(spark, sfTiny)
      .select("doc_id", "lang", "source", "text")
    val posting = Spans.spanPosting(docs.filter(col("doc_id") % 10 =!= 9))
      .localCheckpoint() // materialize once; each micro-batch re-reads
    val delta = docs.filter(col("doc_id") % 10 === 9)
      .as[(Long, String, String, String)].collect()
    assert(delta.length > 10)

    type Res = (Long, String, Int, Long, Long, Long, Double)
    def collectRes(df: org.apache.spark.sql.DataFrame): Seq[Res] =
      df.select("doc_id", "source", "n_tokens", "n_windows",
          "n_dup_windows", "dup_tokens", "dup_share")
        .as[(Long, String, Int, Long, Long, Long, Double)].collect().toSeq
    val oneShot = collectRes(Spans.incrementalSpanCheck(
      docs.filter(col("doc_id") % 10 === 9), posting))

    val stream = MemoryStream[Doc]
    val acc = ArrayBuffer[Res]()
    val q = stream.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= collectRes(Spans.incrementalSpanCheck(batch, posting))
        }: Unit
      }
      .start()
    try {
      val ds = delta.map(d => Doc(d._1, d._2, d._3, d._4))
      val (b1, rest) = ds.splitAt(ds.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      for (b <- Seq(b1, b2, b3)) {
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    assert(acc.sortBy(_._1) == oneShot.sortBy(_._1))
    assert(oneShot.map(_._1).distinct.length == delta.length)
  }

  test("intervals and coverage agree exactly on the real fixture") {
    // cross-operator invariant: the maximal intervals are a partition
    // of the covered positions, so per doc they must be sorted,
    // pairwise non-adjacent (adjacency would have merged), each at
    // least one window long, and sum exactly to the coverage query's
    // dup_tokens — on the full fixture corpus, not a planted toy.
    val ivals = Spans.dupSpanIntervals(spark, sfTiny)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect()
    val cov = Spans.dupSpanCoverage(spark, sfTiny)
      .select("doc_id", "n_tokens", "dup_tokens")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(ivals.nonEmpty, "fixture corpus must contain duplicated spans")
    ivals.groupBy(_._1).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.foreach { case (_, s, e, n) =>
        assert(s >= 1 && e >= s && n == e - s + 1 && n >= 20, s"doc $doc span ($s,$e)")
        assert(e <= cov(doc)._1, s"doc $doc span end $e beyond n_tokens")
      }
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"doc $doc intervals adjacent/overlapping")
        case _ =>
      }
      assert(sorted.map(_._4.toLong).sum == cov(doc)._2,
        s"doc $doc interval sum != coverage dup_tokens")
    }
    // docs without intervals must carry zero coverage
    val docsWithSpans = ivals.map(_._1).toSet
    cov.foreach { case (doc, (_, dup)) =>
      if (!docsWithSpans.contains(doc)) assert(dup == 0L, s"doc $doc")
    }
  }

  test("coverage saturates at 1.0 for a fully-duplicated document") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spans2").toString
    val t = filler("dup", 25)
    Seq((1L, t, "en", "web", 1L), (2L, t, "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val cov = Spans.dupSpanCoverage(spark, dir)
      .select("doc_id", "dup_share").collect()
    assert(cov.length == 2 && cov.forall(_.getDouble(1) == 1.0))
  }
}
