package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Exact duplicate-SPAN detection — the substring-level dedup tier.
  *
  * Document-level dedup (MinHash / SimHash / prefix-filter, `Dedup`,
  * `PrefixJoin`) misses the dominant duplication mode in web corpora:
  * long VERBATIM spans (boilerplate, licenses, quoted passages)
  * embedded in otherwise-distinct documents. The standard remedy is
  * exact substring matching over fixed-length token windows: hash
  * every L-token window, group by hash, and call a window duplicated
  * when it occurs in ≥2 DISTINCT documents. Cross-document is the
  * definition that matters for training data (within-doc repetition
  * is the `text_repetition` signal, a different axis).
  *
  * Scale shape: one scan explodes each document into (n − L + 1)
  * window hashes (a constant-factor blowup of the token stream — the
  * same cost class as the shingle explode in `Dedup.docFeatures`);
  * the duplicate test is ONE map-side-combinable hash aggregate on
  * the 16-byte hash key. Nothing is pairwise: a span shared by 10⁴
  * documents costs 10⁴ aggregate rows, never 10⁸ pairs. The top-k
  * readout joins the (tiny) winner set BACK to the window stream to
  * recover sample text — broadcast-sized by construction — instead of
  * dragging 120-byte span texts through the big group-by.
  *
  * Everything is exact integer/hash arithmetic; both engines hash the
  * identical chr(1)-joined token string with md5, so the driver's
  * hash compare is bit-exact.
  */
object Spans {

  /** Window length in tokens — long enough that a shared window is
    * verbatim copying, not phrase-level coincidence (the common
    * choice in the dedup literature is 50 BPE tokens; 20 words is the
    * same order on this fixture's 10–99-token documents, keeping both
    * the span and non-span channels populated at every SF). */
  private val L = 20

  /** (doc_id, n, i, h): one row per L-token window of `docs`
    * (doc_id, text, …). Parametric so the streaming twin can window a
    * micro-batch with the same expression tree. */
  private[graft] def windowsOf(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", s"${words("text", SparkD)} AS w")
      .selectExpr("doc_id", "w", "size(w) AS n")
      .filter(s"n >= $L")
      .selectExpr("doc_id", "n", "w",
        s"explode(sequence(1, n - $L + 1)) AS i")
      .selectExpr("doc_id", "n", "i",
        s"md5(concat_ws(chr(1), slice(w, i, $L))) AS h")

  // Session-cached like the other staged prefixes: the span family
  // re-derives this stream up to three times PER QUERY (fresh plan
  // instances around Spark's ambiguous-self-join guard) and five
  // queries consume it; position-grain but narrow (doc_id, n, i, h).
  // Verify still measures the cold path (PlanCache off there).
  private def windows(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "span_windows", dir) {
      windowsOf(Tables.documents(spark, dir))
    }

  /** Duplicated-span table: every window hash occurring in ≥2 distinct
    * documents, with occurrence counts. */
  private def dupSpans(spark: SparkSession, dir: String): DataFrame =
    windows(spark, dir)
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)

  private val topSpans = 50

  /** Top duplicated spans with a deterministic sample occurrence and
    * its recovered text. The sample is the two-step arg-min (smallest
    * doc_id, then smallest position within it) — exact in both
    * engines without struct-min. */
  def duplicateSpans(spark: SparkSession, dir: String): DataFrame = {
    val top = dupSpans(spark, dir)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("h"))
      .limit(topSpans)
    // each step re-derives the window stream (fresh plan instance —
    // Spark's ambiguous-self-join guard, and the cold-path cost is one
    // extra scan, the same trade the other two-pass readouts make)
    val firstDoc = windows(spark, dir).join(top.select("h"), Seq("h"))
      .groupBy("h").agg(min(col("doc_id")).as("sample_doc"))
    val firstPos = windows(spark, dir)
      .selectExpr("h AS h2", "doc_id AS d2", "i")
      .join(firstDoc, col("h2") === col("h") && col("d2") === col("sample_doc"))
      .groupBy("h", "sample_doc").agg(min(col("i")).as("sample_pos"))
    // recover the sample text by recomputing the one winning window
    // from the document row — a broadcast-sized join against the
    // corpus, not a text column dragged through the global group-by
    val sampleText = Tables.documents(spark, dir)
      .selectExpr("doc_id AS sample_doc", s"${words("text", SparkD)} AS w")
      .join(firstPos, Seq("sample_doc"))
      .selectExpr("h", "sample_doc", "sample_pos",
        s"concat_ws(' ', slice(w, sample_pos, $L)) AS span_text")
    top.join(sampleText, Seq("h"))
      .selectExpr("h AS span_hash", "n_docs", "n_occ", "sample_doc",
        "CAST(sample_pos AS INTEGER) AS sample_pos", "span_text")
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("span_hash"))
  }

  val duplicateSpansOracle: String = {
    val d = DuckD
    s"""WITH w_t AS (SELECT doc_id, source, ${words("text", d)} AS w
          FROM documents),
        n_t AS (SELECT doc_id, source, w, ${arrLen("w", d)} AS n
          FROM w_t WHERE ${arrLen("w", d)} >= $L),
        i_t AS (SELECT doc_id, source, n, w,
            unnest(range(1, n - $L + 2)) AS i FROM n_t),
        win AS (SELECT doc_id, source, n, i,
            md5(array_to_string(list_slice(w, i, i + $L - 1), chr(1))) AS h
          FROM i_t),
        d_t AS (SELECT h, count(DISTINCT doc_id) AS n_docs,
            count(*) AS n_occ
          FROM win GROUP BY h),
        top AS (SELECT h, n_docs, n_occ FROM d_t WHERE n_docs >= 2
          ORDER BY n_docs DESC, n_occ DESC, h LIMIT $topSpans),
        fd AS (SELECT win.h, min(doc_id) AS sample_doc
          FROM win JOIN top ON win.h = top.h GROUP BY win.h),
        fp AS (SELECT fd.h, fd.sample_doc, min(win.i) AS sample_pos
          FROM win JOIN fd ON win.h = fd.h AND win.doc_id = fd.sample_doc
          GROUP BY fd.h, fd.sample_doc),
        st AS (SELECT fp.h, fp.sample_doc, fp.sample_pos,
            array_to_string(list_slice(w_t.w, fp.sample_pos,
              fp.sample_pos + $L - 1), ' ') AS span_text
          FROM fp JOIN w_t ON w_t.doc_id = fp.sample_doc)
        SELECT top.h AS span_hash, top.n_docs, top.n_occ, st.sample_doc,
          CAST(st.sample_pos AS INTEGER) AS sample_pos, st.span_text
        FROM top JOIN st ON top.h = st.h
        ORDER BY top.n_docs DESC, top.n_occ DESC, span_hash"""
  }

  /** Per-document duplicated-span coverage: the fraction of each
    * document's tokens lying inside at least one cross-document
    * duplicated window — the per-doc FILTER SIGNAL substring-level
    * dedup exists to produce (drop or trim documents whose coverage
    * exceeds a threshold). Window positions per doc are strictly
    * increasing, so the interval union is a running-max scan: each
    * window contributes `end − max(prev_end, start − 1)` clamped at 0
    * — all integer arithmetic inside a doc-partitioned window frame
    * (shuffle by doc, never global). Documents with no duplicated
    * window (or shorter than L) surface with coverage 0 via the
    * left join — the signal consumers need every document scored. */
  def dupSpanCoverage(spark: SparkSession, dir: String): DataFrame =
    // multi-consumer doc-grain relation: session-cached like the
    // other staged prefixes (Verify still measures the cold path)
    graft.PlanCache(spark, "dup_span_cov", dir) {
    val dwin = windows(spark, dir)
      .join(dupSpans(spark, dir).select("h"), Seq("h"))
      .select("doc_id", "i")
    val covered = dwin
      .withColumn("pmax", expr(
        s"max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"))
      .selectExpr("doc_id",
        s"greatest(0, (i + $L - 1) - greatest(coalesce(pmax, 0), i - 1)) AS newly")
      .groupBy("doc_id")
      .agg(sum(col("newly")).as("covered"))
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "source",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS INTEGER) AS n_tokens")
      .join(covered, Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "source", "n_tokens",
        "CAST(coalesce(covered, 0) AS BIGINT) AS dup_tokens",
        "CAST(coalesce(covered, 0) AS DOUBLE) / n_tokens AS dup_share")
      .orderBy("doc_id")
  }

  /** Maximal duplicated intervals per document — the ACTIONABLE form
    * of the coverage signal: instead of one fraction per doc, the
    * exact token ranges to trim (the standard remediation is cutting
    * the duplicated spans, not dropping the document). Classic
    * gaps-and-islands over the duplicated windows: a window opens a
    * new island when its start exceeds the running coverage end + 1
    * (overlap OR adjacency merges — contiguous coverage is one
    * interval); islands then collapse to (start, end) in one grouped
    * agg. Doc-partitioned windows only — shuffle by doc, never
    * global. */
  def dupSpanIntervals(spark: SparkSession, dir: String): DataFrame = {
    val dwin = windows(spark, dir)
      .join(dupSpans(spark, dir).select("h"), Seq("h"))
      .select("doc_id", "i")
    dwin
      .withColumn("pmax", expr(
        s"max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"))
      .withColumn("brk", expr("CASE WHEN pmax IS NULL OR i > pmax + 1 THEN 1 ELSE 0 END"))
      .withColumn("island", expr(
        "sum(brk) OVER (PARTITION BY doc_id ORDER BY i " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .groupBy("doc_id", "island")
      .agg(min(col("i")).as("span_start"), max(col("i") + L - 1).as("span_end"))
      .selectExpr("doc_id", "CAST(island AS INTEGER) AS island",
        "CAST(span_start AS INTEGER) AS span_start",
        "CAST(span_end AS INTEGER) AS span_end",
        "CAST(span_end - span_start + 1 AS INTEGER) AS span_tokens")
      .orderBy("doc_id", "span_start")
  }

  val dupSpanIntervalsOracle: String = {
    val d = DuckD
    s"""WITH w_t AS (SELECT doc_id, ${words("text", d)} AS w FROM documents),
        n_t AS (SELECT doc_id, w, ${arrLen("w", d)} AS n
          FROM w_t WHERE ${arrLen("w", d)} >= $L),
        i_t AS (SELECT doc_id, n, w, unnest(range(1, n - $L + 2)) AS i
          FROM n_t),
        win AS (SELECT doc_id, i,
            md5(array_to_string(list_slice(w, i, i + $L - 1), chr(1))) AS h
          FROM i_t),
        d_t AS (SELECT h FROM win
          GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        dwin AS (SELECT win.doc_id, win.i FROM win JOIN d_t
          ON win.h = d_t.h),
        run AS (SELECT doc_id, i,
            max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM dwin),
        brk_t AS (SELECT doc_id, i,
            CASE WHEN pmax IS NULL OR i > pmax + 1 THEN 1 ELSE 0 END AS brk
          FROM run),
        isl AS (SELECT doc_id, i,
            sum(brk) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM brk_t),
        g AS (SELECT doc_id, island, min(i) AS span_start,
            max(i + $L - 1) AS span_end
          FROM isl GROUP BY doc_id, island)
        SELECT doc_id, CAST(island AS INTEGER) AS island,
          CAST(span_start AS INTEGER) AS span_start,
          CAST(span_end AS INTEGER) AS span_end,
          CAST(span_end - span_start + 1 AS INTEGER) AS span_tokens
        FROM g ORDER BY doc_id, span_start"""
  }

  // ---- incremental span dedup (append batch vs corpus posting) ----

  private val deltaMod = 10
  private val deltaRem = 9

  /** Append-batch span dedup — the production mode: a new crawl batch
    * (doc_id % 10 == 9, the same delta convention as
    * `Dedup.incrementalDedup`) is screened against the EXISTING
    * corpus's span posting (the distinct window hashes of all
    * non-batch docs). Per new document: window count, windows already
    * present in the corpus, covered-token count (interval union over
    * corpus-matching windows only) and the resulting share — the
    * admit/trim/reject signal computed WITHOUT touching batch-vs-batch
    * pairs. Scale shape: the corpus side reduces to a distinct-hash
    * posting (16 bytes/row, the side table a real pipeline keeps
    * materialized and appends to); the batch side is one scan; the
    * screen is one equi-join on the hash. */
  /** The existing corpus's span posting: distinct window hashes —
    * 16 bytes/row, the side table a real pipeline keeps materialized
    * and appends to. */
  def spanPosting(corpusDocs: DataFrame): DataFrame =
    windowsOf(corpusDocs).select("h").distinct()

  /** Screen `batchDocs` against a corpus `posting` — per new doc the
    * matching-window count, covered tokens (interval union over
    * corpus-matching windows only) and share. Checks each new doc
    * against the STATIC posting only, never against other batch docs,
    * so any chopping of the append stream yields the same union of
    * results — the property that makes the screen safe to run
    * continuously (the streaming twin spec pins it). */
  def incrementalSpanCheck(batchDocs: DataFrame, posting: DataFrame): DataFrame = {
    val hits = windowsOf(batchDocs).join(posting, Seq("h"))
      .select("doc_id", "i")
    val covered = hits
      .withColumn("pmax", expr(
        s"max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"))
      .selectExpr("doc_id",
        s"greatest(0, (i + $L - 1) - greatest(coalesce(pmax, 0), i - 1)) AS newly")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("newly")).as("covered"))
      // renamed key: `covered` descends from batchDocs too, and the
      // final join would otherwise trip the ambiguous-self-join guard
      .selectExpr("doc_id AS cid", "n_dup_windows", "covered")
    batchDocs
      .selectExpr("doc_id", "source",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS INTEGER) AS n_tokens")
      .join(covered, col("doc_id") === col("cid"), "left_outer")
      .selectExpr("doc_id", "source", "n_tokens",
        s"CAST(greatest(n_tokens - $L + 1, 0) AS BIGINT) AS n_windows",
        "CAST(coalesce(n_dup_windows, 0) AS BIGINT) AS n_dup_windows",
        "CAST(coalesce(covered, 0) AS BIGINT) AS dup_tokens",
        "CAST(coalesce(covered, 0) AS DOUBLE) / n_tokens AS dup_share")
      .orderBy("doc_id")
  }

  def incrementalSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    incrementalSpanCheck(
      docs.filter(col("doc_id") % deltaMod === deltaRem),
      spanPosting(docs.filter(col("doc_id") % deltaMod =!= deltaRem)))
  }

  val incrementalSpansOracle: String = {
    val d = DuckD
    s"""WITH w_t AS (SELECT doc_id, source, ${words("text", d)} AS w
          FROM documents),
        n_t AS (SELECT doc_id, w, ${arrLen("w", d)} AS n
          FROM w_t WHERE ${arrLen("w", d)} >= $L),
        i_t AS (SELECT doc_id, n, w, unnest(range(1, n - $L + 2)) AS i
          FROM n_t),
        win AS (SELECT doc_id, i,
            md5(array_to_string(list_slice(w, i, i + $L - 1), chr(1))) AS h
          FROM i_t),
        posting AS (SELECT DISTINCT h FROM win
          WHERE doc_id % $deltaMod <> $deltaRem),
        hits AS (SELECT win.doc_id, win.i FROM win
          JOIN posting ON win.h = posting.h
          WHERE win.doc_id % $deltaMod = $deltaRem),
        run AS (SELECT doc_id, i,
            max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM hits),
        cov AS (SELECT doc_id, count(*) AS n_dup_windows,
            sum(greatest(0, (i + $L - 1) - greatest(coalesce(pmax, 0), i - 1)))
              AS covered
          FROM run GROUP BY doc_id)
        SELECT d.doc_id, d.source,
          CAST(${arrLen(words("text", d), d)} AS INTEGER) AS n_tokens,
          CAST(greatest(${arrLen(words("text", d), d)} - $L + 1, 0) AS BIGINT)
            AS n_windows,
          CAST(coalesce(cov.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
          CAST(coalesce(cov.covered, 0) AS BIGINT) AS dup_tokens,
          CAST(coalesce(cov.covered, 0) AS DOUBLE)
            / CAST(${arrLen(words("text", d), d)} AS INTEGER) AS dup_share
        FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
        WHERE d.doc_id % $deltaMod = $deltaRem
        ORDER BY d.doc_id"""
  }

  val dupSpanCoverageOracle: String = {
    val d = DuckD
    s"""WITH w_t AS (SELECT doc_id, source, ${words("text", d)} AS w
          FROM documents),
        n_t AS (SELECT doc_id, source, w, ${arrLen("w", d)} AS n
          FROM w_t WHERE ${arrLen("w", d)} >= $L),
        i_t AS (SELECT doc_id, n, w, unnest(range(1, n - $L + 2)) AS i
          FROM n_t),
        win AS (SELECT doc_id, i,
            md5(array_to_string(list_slice(w, i, i + $L - 1), chr(1))) AS h
          FROM i_t),
        d_t AS (SELECT h FROM win
          GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        dwin AS (SELECT win.doc_id, win.i FROM win JOIN d_t
          ON win.h = d_t.h),
        run AS (SELECT doc_id, i,
            max(i + $L - 1) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM dwin),
        cov AS (SELECT doc_id,
            sum(greatest(0, (i + $L - 1) - greatest(coalesce(pmax, 0), i - 1)))
              AS covered
          FROM run GROUP BY doc_id)
        SELECT d.doc_id, d.source,
          CAST(${arrLen(words("text", d), d)} AS INTEGER) AS n_tokens,
          CAST(coalesce(cov.covered, 0) AS BIGINT) AS dup_tokens,
          CAST(coalesce(cov.covered, 0) AS DOUBLE)
            / CAST(${arrLen(words("text", d), d)} AS INTEGER) AS dup_share
        FROM documents d LEFT JOIN cov ON d.doc_id = cov.doc_id
        ORDER BY d.doc_id"""
  }

  // ---- train/holdout split leakage ----

  /** Split-leakage audit: for every val/test document, the fraction of
    * its L-token windows that ALSO occur anywhere in the train split —
    * the within-corpus contamination that silently inflates eval
    * numbers (the reason eval decks memorize; cf. the external-
    * benchmark tier in [[TextAnalysis]]'s contamination query, which
    * this completes on the corpus's own split). The machinery is the
    * span posting the dedup tier already maintains: train's DISTINCT
    * window-hash set (16 bytes/row) semi-joins the holdout windows —
    * one hash-keyed shuffle, nothing pairwise, and the train side is
    * exactly [[spanPosting]]'s shape, so at 100 TB the posting is a
    * materialized side table, not a recompute. Every holdout doc is
    * emitted (short docs score 0 windows); the leak flag is an integer
    * cross-multiply at the 50 % line. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val splits = Curation.sampleSplit(spark, dir).select("doc_id", "split")
    val win = windows(spark, dir).join(splits, Seq("doc_id"))
    val trainH = win.filter(col("split") === "train").select("h").distinct()
    val hold = win.filter(col("split") =!= "train")
    val tot = hold.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    val leaked = hold.join(trainH, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_leaked"))
    splits.filter(col("split") =!= "train")
      .join(tot, Seq("doc_id"), "left")
      .join(leaked, Seq("doc_id"), "left")
      .selectExpr("doc_id", "split",
        "CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows",
        "CAST(coalesce(n_leaked, 0) AS BIGINT) AS n_leaked",
        """CASE WHEN coalesce(n_windows, 0) > 0
             THEN CAST(coalesce(n_leaked, 0) AS DOUBLE) / n_windows
             ELSE CAST(0 AS DOUBLE) END AS leak_frac""",
        """CASE WHEN coalesce(n_windows, 0) > 0
             AND 2 * coalesce(n_leaked, 0) >= coalesce(n_windows, 0)
             THEN 1 ELSE 0 END AS flagged""")
      .orderBy("doc_id")
  }

  val splitLeakageOracle: String = {
    val d = DuckD
    s"""WITH w_t AS (SELECT doc_id, ${words("text", d)} AS w FROM documents),
        n_t AS (SELECT doc_id, w, ${arrLen("w", d)} AS n
          FROM w_t WHERE ${arrLen("w", d)} >= $L),
        i_t AS (SELECT doc_id, n, w, unnest(range(1, n - $L + 2)) AS i FROM n_t),
        win AS (SELECT doc_id, n, i,
            md5(array_to_string(list_slice(w, i, i + $L - 1), chr(1))) AS h
          FROM i_t),
        sp AS MATERIALIZED (SELECT doc_id, split
          FROM (${graft.llm.Curation.sampleSplitOracle}) s0),
        trainh AS (SELECT DISTINCT win.h FROM win
          JOIN sp ON win.doc_id = sp.doc_id WHERE sp.split = 'train'),
        hold AS (SELECT win.doc_id, win.h FROM win
          JOIN sp ON win.doc_id = sp.doc_id WHERE sp.split <> 'train'),
        tot AS (SELECT doc_id, count(*) AS n_windows FROM hold GROUP BY doc_id),
        lk AS (SELECT doc_id, count(*) AS n_leaked FROM hold
          WHERE EXISTS (SELECT 1 FROM trainh t WHERE t.h = hold.h)
          GROUP BY doc_id)
        SELECT sp.doc_id, sp.split,
          CAST(coalesce(tot.n_windows, 0) AS BIGINT) AS n_windows,
          CAST(coalesce(lk.n_leaked, 0) AS BIGINT) AS n_leaked,
          CASE WHEN coalesce(tot.n_windows, 0) > 0
            THEN CAST(coalesce(lk.n_leaked, 0) AS DOUBLE) / tot.n_windows
            ELSE CAST(0 AS DOUBLE) END AS leak_frac,
          CASE WHEN coalesce(tot.n_windows, 0) > 0
            AND 2 * coalesce(lk.n_leaked, 0) >= coalesce(tot.n_windows, 0)
            THEN 1 ELSE 0 END AS flagged
        FROM sp
        LEFT JOIN tot ON sp.doc_id = tot.doc_id
        LEFT JOIN lk ON sp.doc_id = lk.doc_id
        WHERE sp.split <> 'train'
        ORDER BY sp.doc_id"""
  }
}
