package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.io.Tables
import Gen._

/** Corpus-curation operators: reproducible sampling and balancing for
  * training-data assembly.
  *
  * Both operators key every decision off a content-independent
  * deterministic hash of the document id (md5 → 32-bit prefix → unit
  * interval), the standard trick for reproducible splits at scale:
  * assignment is a pure per-row projection (no global shuffle, no RNG
  * state, no seed coordination across executors), re-runs and
  * stragglers can never change the sample, and adding documents never
  * reassigns existing ones. The same arithmetic runs on both engines,
  * so the DuckDB oracles are bit-exact.
  */
object Curation {

  private def castStr(e: String, d: Dialect): String = d match {
    case SparkD => s"CAST($e AS STRING)"
    case DuckD  => s"CAST($e AS VARCHAR)"
  }

  /** Projection of the unit-interval hash: md5 computed once, 32-bit
    * hex prefix scaled to [0, 1). The divisor is CAST to DOUBLE — the
    * repo-wide rule: Spark SQL parses a bare decimal literal as
    * DECIMAL, which would make `u` decimal there but double in DuckDB. */
  private def unitHashCtes(d: Dialect): Seq[String] = Seq(
    s"md5(${castStr("doc_id", d)}) AS h",
    s"(${hexPrefix32("h")}) / CAST(4294967296 AS DOUBLE) AS u")

  private val splitExpr: String =
    """CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split"""

  /** Deterministic train/val/test assignment (80/10/10 by hash
    * bucket). Every doc keeps its split forever, independent of
    * partitioning, corpus growth, or execution order. */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", unitHashCtes(SparkD).head)
      .selectExpr("doc_id", "source", unitHashCtes(SparkD)(1))
      .selectExpr("doc_id", "source", "u", splitExpr)
      .orderBy("doc_id")

  val sampleSplitOracle: String =
    s"""WITH h_t AS (SELECT doc_id, source, ${unitHashCtes(DuckD).head} FROM documents),
        u_t AS (SELECT doc_id, source, ${unitHashCtes(DuckD)(1)} FROM h_t)
        SELECT doc_id, source, u, $splitExpr FROM u_t ORDER BY doc_id"""

  // ---- split-drift audit (population stability index) ----

  private val psiComparisons = Seq(("train", "val"), ("train", "test"))

  /** `corpus_split_psi`: Population Stability Index of the quality-
    * score distribution between the train split and each held-out
    * split — the standard production check that a hash split didn't
    * land a skewed sample (PSI < 0.1 is the conventional "stable"
    * band; a big PSI here would mean the eval sets don't measure the
    * training distribution). Scores bin into 10 fixed-width buckets;
    * per-bin shares are Laplace-smoothed ((n+1)/(N+10)) so empty bins
    * stay finite without an arbitrary epsilon; each bin's
    * (p−q)·ln(p/q) contribution is nano-quantized before the sum (the
    * bounded-bin sum is then order-independent), and ln enters the
    * plan only under the established quantize-the-readout discipline.
    * One corpus scan, a (split × 10)-cell agg, then constant-sized
    * arithmetic. */
  def splitPsi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val binned = TextAnalysis.statsRelation(spark, dir)
      .selectExpr(Seq("doc_id", "quality_score")
        ++ unitHashCtes(SparkD).take(1): _*)
      .selectExpr("doc_id", "quality_score", unitHashCtes(SparkD)(1))
      .selectExpr("quality_score", splitExpr)
      .selectExpr("split",
        "CAST(greatest(least(floor(quality_score * 10), 9), 0) AS INT) AS bin")
    val counts = binned.groupBy("split", "bin").agg(count(lit(1)).as("n"))
    val totals = binned.groupBy("split").agg(count(lit(1)).as("t"))
    val grid = spark.range(10).selectExpr("CAST(id AS INT) AS bin")
    psiComparisons.map { case (a, b) =>
      val na = counts.filter(col("split") === a).select(col("bin"), col("n").as("n_a"))
      val nb = counts.filter(col("split") === b).select(col("bin"), col("n").as("n_b"))
      val ta = totals.filter(col("split") === a).select(col("t").as("tot_a"))
      val tb = totals.filter(col("split") === b).select(col("t").as("tot_b"))
      val pa = "(CAST(n_a + 1 AS DOUBLE) / (tot_a + 10))"
      val pb = "(CAST(n_b + 1 AS DOUBLE) / (tot_b + 10))"
      grid.join(na, Seq("bin"), "left").join(nb, Seq("bin"), "left")
        .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
        .selectExpr("coalesce(n_a, 0) AS n_a", "coalesce(n_b, 0) AS n_b",
          "tot_a", "tot_b")
        .selectExpr("tot_a", "tot_b",
          s"CAST(round(($pa - $pb) * ln($pa / $pb) * 1e9) AS BIGINT) AS c_nano")
        .groupBy("tot_a", "tot_b")
        .agg(sum("c_nano").as("psi_nano"))
        .selectExpr(s"'${a}_vs_$b' AS comparison",
          "CAST(tot_a AS BIGINT) AS n_a", "CAST(tot_b AS BIGINT) AS n_b",
          "psi_nano", "CAST(psi_nano AS DOUBLE) / 1e9 AS psi")
    }.reduce(_ unionByName _).orderBy("comparison")
  }

  val splitPsiOracle: String = {
    val rows = psiComparisons.map { case (a, b) =>
      val pa = "(CAST(q.n_a + 1 AS DOUBLE) / (q.tot_a + 10))"
      val pb = "(CAST(q.n_b + 1 AS DOUBLE) / (q.tot_b + 10))"
      s"""SELECT '${a}_vs_$b' AS comparison,
            CAST(max(q.tot_a) AS BIGINT) AS n_a,
            CAST(max(q.tot_b) AS BIGINT) AS n_b,
            CAST(sum(CAST(round(($pa - $pb) * ln($pa / $pb) * 1e9) AS BIGINT)) AS BIGINT) AS psi_nano,
            CAST(sum(CAST(round(($pa - $pb) * ln($pa / $pb) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS psi
          FROM (SELECT g.bin,
                  coalesce((SELECT n FROM cnt WHERE split = '$a' AND bin = g.bin), 0) AS n_a,
                  coalesce((SELECT n FROM cnt WHERE split = '$b' AND bin = g.bin), 0) AS n_b,
                  (SELECT t FROM tot WHERE split = '$a') AS tot_a,
                  (SELECT t FROM tot WHERE split = '$b') AS tot_b
                FROM grid g) q"""
    }.mkString(" UNION ALL ")
    s"""WITH ${TextAnalysis.statsCtes},
        uh_t AS (SELECT doc_id, ${unitHashCtes(DuckD).head} FROM documents),
        uu_t AS (SELECT doc_id, ${unitHashCtes(DuckD)(1)} FROM uh_t),
        sp AS (SELECT u2.doc_id, $splitExpr,
                 CAST(greatest(least(floor(s.quality_score * 10), 9), 0) AS INTEGER) AS bin
               FROM stats s JOIN uu_t u2 ON s.doc_id = u2.doc_id),
        cnt AS MATERIALIZED (SELECT split, bin, count(*) AS n
               FROM sp GROUP BY split, bin),
        tot AS MATERIALIZED (SELECT split, count(*) AS t FROM sp GROUP BY split),
        grid AS (SELECT unnest(range(0, 10)) AS bin)
        SELECT * FROM ($rows) u ORDER BY comparison"""
  }

  // ---- quality-signal agreement matrix ----

  /** `corpus_signal_spearman`: pairwise Spearman rank correlation
    * between the engine's four independent quality signals — the
    * heuristic gate score, the KN bigram fluency score, the hashed
    * classifier score, and the DSIR per-token domain weight. This is
    * the "do my filters agree" readout a curation review runs before
    * composing signals into a funnel: near-1 pairs are redundant
    * (drop the expensive one), near-0 pairs measure different things
    * (keep both), negative pairs are a bug or a genuinely adversarial
    * signal. Machinery is the established doubled-midrank discipline
    * (ties exact, DECIMAL(38) cross-products, one IEEE readout per
    * rho); signals are quantized to exact integers BEFORE ranking so
    * the rank keys are engine-identical. Ranks are global windows
    * over the doc-grain joined relation — the [[graft.ops.Profile]]
    * Spearman precedent; at 100 TB the two-phase bucket prefix scan
    * substitutes, same as the winsorized stats. */
  def signalSpearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val qual = TextAnalysis.statsRelation(spark, dir)
      .selectExpr("doc_id", "CAST(round(quality_score * 10000) AS BIGINT) AS qq")
    val kn = graft.llm.LanguageModel.knBigramScore(spark, dir)
      .selectExpr("doc_id", "CAST(round(avg_kn_prob * 1e9) AS BIGINT) AS qk")
    val cls = TextAnalysis.hashedClassifier(spark, dir)
      .selectExpr("doc_id", "score AS qc")
    val dsir = TextAnalysis.dsirWeights(spark, dir)
      .filter(col("n_tokens") > 0)
      .selectExpr("doc_id",
        "CAST(round(CAST(logw_nano AS DOUBLE) / n_tokens * 1000) AS BIGINT) AS qd")
    qual.join(kn, Seq("doc_id")).join(cls, Seq("doc_id")).join(dsir, Seq("doc_id"))
      .selectExpr(
        "2 * rank() OVER (ORDER BY qq) + count(*) OVER (PARTITION BY qq) - 1 AS rq2",
        "2 * rank() OVER (ORDER BY qk) + count(*) OVER (PARTITION BY qk) - 1 AS rk2",
        "2 * rank() OVER (ORDER BY qc) + count(*) OVER (PARTITION BY qc) - 1 AS rc2",
        "2 * rank() OVER (ORDER BY qd) + count(*) OVER (PARTITION BY qd) - 1 AS rd2",
        "count(*) OVER () AS n")
      .selectExpr("n",
        "CAST(rq2 - (n + 1) AS DECIMAL(19,0)) AS dq",
        "CAST(rk2 - (n + 1) AS DECIMAL(19,0)) AS dk",
        "CAST(rc2 - (n + 1) AS DECIMAL(19,0)) AS dc",
        "CAST(rd2 - (n + 1) AS DECIMAL(19,0)) AS dd")
      .selectExpr(
        "CAST(max(n) AS BIGINT) AS n",
        "CAST(sum(dq * dq) AS DECIMAL(38,0)) AS sqq",
        "CAST(sum(dk * dk) AS DECIMAL(38,0)) AS skk",
        "CAST(sum(dc * dc) AS DECIMAL(38,0)) AS scc",
        "CAST(sum(dd * dd) AS DECIMAL(38,0)) AS sdd",
        "CAST(sum(dq * dk) AS DECIMAL(38,0)) AS sqk",
        "CAST(sum(dq * dc) AS DECIMAL(38,0)) AS sqc",
        "CAST(sum(dq * dd) AS DECIMAL(38,0)) AS sqd",
        "CAST(sum(dk * dc) AS DECIMAL(38,0)) AS skc")
      .selectExpr("n",
        "CAST(sqk AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(skk AS DOUBLE))) AS rho_quality_kn",
        "CAST(sqc AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(scc AS DOUBLE))) AS rho_quality_classifier",
        "CAST(sqd AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(sdd AS DOUBLE))) AS rho_quality_dsir",
        "CAST(skc AS DOUBLE) / (sqrt(CAST(skk AS DOUBLE)) * sqrt(CAST(scc AS DOUBLE))) AS rho_kn_classifier")
  }

  lazy val signalSpearmanOracle: String =
    s"""WITH ${TextAnalysis.statsCtes},
        knq AS MATERIALIZED (SELECT doc_id,
            CAST(round(avg_kn_prob * 1e9) AS BIGINT) AS qk
          FROM (${graft.llm.LanguageModel.knBigramScoreOracle}) kk),
        clq AS MATERIALIZED (SELECT doc_id, score AS qc
          FROM (${TextAnalysis.hashedClassifierOracle}) cc),
        dsq AS MATERIALIZED (SELECT doc_id,
            CAST(round(CAST(logw_nano AS DOUBLE) / n_tokens * 1000) AS BIGINT) AS qd
          FROM (${TextAnalysis.dsirWeightsOracle}) dd0 WHERE n_tokens > 0),
        j AS (SELECT CAST(round(s.quality_score * 10000) AS BIGINT) AS qq,
                k.qk, c.qc, d.qd
              FROM stats s JOIN knq k ON s.doc_id = k.doc_id
                JOIN clq c ON s.doc_id = c.doc_id
                JOIN dsq d ON s.doc_id = d.doc_id),
        r AS (SELECT
            2 * rank() OVER (ORDER BY qq) + count(*) OVER (PARTITION BY qq) - 1 AS rq2,
            2 * rank() OVER (ORDER BY qk) + count(*) OVER (PARTITION BY qk) - 1 AS rk2,
            2 * rank() OVER (ORDER BY qc) + count(*) OVER (PARTITION BY qc) - 1 AS rc2,
            2 * rank() OVER (ORDER BY qd) + count(*) OVER (PARTITION BY qd) - 1 AS rd2,
            count(*) OVER () AS n
          FROM j),
        dd AS (SELECT n,
            CAST(rq2 - (n + 1) AS DECIMAL(19,0)) AS dq,
            CAST(rk2 - (n + 1) AS DECIMAL(19,0)) AS dk,
            CAST(rc2 - (n + 1) AS DECIMAL(19,0)) AS dc,
            CAST(rd2 - (n + 1) AS DECIMAL(19,0)) AS dd2 FROM r),
        m AS (SELECT CAST(max(n) AS BIGINT) AS n,
            CAST(sum(dq * dq) AS DECIMAL(38,0)) AS sqq,
            CAST(sum(dk * dk) AS DECIMAL(38,0)) AS skk,
            CAST(sum(dc * dc) AS DECIMAL(38,0)) AS scc,
            CAST(sum(dd2 * dd2) AS DECIMAL(38,0)) AS sdd,
            CAST(sum(dq * dk) AS DECIMAL(38,0)) AS sqk,
            CAST(sum(dq * dc) AS DECIMAL(38,0)) AS sqc,
            CAST(sum(dq * dd2) AS DECIMAL(38,0)) AS sqd,
            CAST(sum(dk * dc) AS DECIMAL(38,0)) AS skc
          FROM dd)
        SELECT n,
          CAST(sqk AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(skk AS DOUBLE))) AS rho_quality_kn,
          CAST(sqc AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(scc AS DOUBLE))) AS rho_quality_classifier,
          CAST(sqd AS DOUBLE) / (sqrt(CAST(sqq AS DOUBLE)) * sqrt(CAST(sdd AS DOUBLE))) AS rho_quality_dsir,
          CAST(skc AS DOUBLE) / (sqrt(CAST(skk AS DOUBLE)) * sqrt(CAST(scc AS DOUBLE))) AS rho_kn_classifier
        FROM m"""

  private val quotaPerSource = 50

  /** Per-source quota balancing: keep at most [[quotaPerSource]] docs
    * per source, chosen by the deterministic hash order (a reproducible
    * uniform subsample per source — how over-represented domains are
    * down-weighted in corpus assembly). The partition key is `source`,
    * so the window never sees more than one source's docs; skewed
    * sources are the AQE-skew case, not a plan change. */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("source").orderBy(asc("u"), asc("doc_id"))
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", unitHashCtes(SparkD).head)
      .selectExpr("doc_id", "source", unitHashCtes(SparkD)(1))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= quotaPerSource)
      .select("doc_id", "source", "u", "pick_rank")
      .orderBy("doc_id")
  }

  val sourceQuotaOracle: String =
    s"""WITH h_t AS (SELECT doc_id, source, ${unitHashCtes(DuckD).head} FROM documents),
        u_t AS (SELECT doc_id, source, ${unitHashCtes(DuckD)(1)} FROM h_t)
        SELECT doc_id, source, u,
          row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS pick_rank
        FROM u_t
        QUALIFY pick_rank <= $quotaPerSource
        ORDER BY doc_id"""

  // ---- document chunking (context-window packing primitive) ----

  private val chunkTokens = 50
  private val chunkStride = 40 // 10-token overlap between windows

  /** Split every document into overlapping token windows — the
    * chunking step that feeds context-window packing, embedding
    * indexing, and retrieval corpora. Window starts are a per-row
    * generated sequence exploded to one row per chunk; the token
    * slice never leaves the row, so the operator stays a codegen'd
    * projection + explode with no shuffle at all (ordering aside) —
    * at 100 TB chunk output partitioning inherits the scan's. Both
    * engines truncate the tail slice the same way. */
  /** Unordered chunk relation (doc_id, chunk_idx, n_chunk_tokens,
    * chunk_text) — shared by [[docChunks]] and [[chunkBoilerplate]]. */
  private def chunkRelation(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", s"${words("text", SparkD)} AS w")
      .selectExpr("doc_id", "w",
        s"posexplode(sequence(0, greatest(size(w) - 1, 0), $chunkStride)) AS (chunk_idx, start)")
      .selectExpr("doc_id", "chunk_idx",
        s"CAST(size(slice(w, start + 1, $chunkTokens)) AS INTEGER) AS n_chunk_tokens",
        s"array_join(slice(w, start + 1, $chunkTokens), ' ') AS chunk_text")

  /** DuckDB twin of [[chunkRelation]], ending in `chunks`. */
  private def chunkCtes: String =
    s"""ck_w AS (SELECT doc_id, ${words("text", DuckD)} AS w FROM documents),
        ck_t AS (SELECT doc_id, w,
                   unnest(range(0, greatest(len(w), 1), $chunkStride)) AS start
                 FROM ck_w),
        chunks AS (SELECT doc_id, CAST(start // $chunkStride AS INTEGER) AS chunk_idx,
                     CAST(len(w[start + 1 : start + $chunkTokens]) AS INTEGER) AS n_chunk_tokens,
                     array_to_string(w[start + 1 : start + $chunkTokens], ' ') AS chunk_text
                   FROM ck_t)"""

  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunkRelation(spark, dir).orderBy("doc_id", "chunk_idx")

  val docChunksOracle: String =
    s"""WITH $chunkCtes
        SELECT * FROM chunks ORDER BY doc_id, chunk_idx"""

  /** Cross-document boilerplate detection at CHUNK granularity: hash
    * every token window and report hashes appearing in two or more
    * DISTINCT documents — repeated headers/footers/license blocks that
    * doc-level dedup can never see because the surrounding text
    * differs. Plan shape: chunking is projection + explode on the
    * scan's partitioning; then one hash agg keyed by chunk hash (the
    * natural high-cardinality shuffle key) with a single distinct
    * rewrite; the flagged set is orders of magnitude smaller than the
    * chunk stream. */
  def chunkBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    chunkRelation(spark, dir)
      .filter(col("n_chunk_tokens") >= 10)
      .selectExpr("doc_id", "md5(chunk_text) AS chunk_hash")
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_occurrences"), asc("chunk_hash"))
  }

  val chunkBoilerplateOracle: String =
    s"""WITH $chunkCtes,
        h AS (SELECT doc_id, md5(chunk_text) AS chunk_hash FROM chunks
              WHERE n_chunk_tokens >= 10),
        g AS (SELECT chunk_hash, count(*) AS n_occurrences,
                count(DISTINCT doc_id) AS n_docs,
                CAST(min(doc_id) AS BIGINT) AS first_doc
              FROM h GROUP BY chunk_hash)
        SELECT * FROM g WHERE n_docs >= 2
        ORDER BY n_occurrences DESC, chunk_hash"""

  // ---- sequence packing (concat-and-chunk manifest) ----

  private val ctxLen = 128

  /** Concat-and-chunk sequence packing: documents are concatenated in
    * doc_id order within each source stream and cut into fixed
    * [[ctxLen]]-token training sequences; the output is the packing
    * MANIFEST — for every document, its token offset interval in the
    * source stream and the first/last sequence ids it lands in (a doc
    * straddling a cut contributes to consecutive sequences, the
    * standard GPT-style packing).
    *
    * Plan shape at 100 TB: one window (running token sum) partitioned
    * by `source` — one shuffle on the source key, then a linear
    * per-partition scan. A global (unpartitioned) running sum would
    * serialize the corpus through one task; per-stream packing is also
    * the semantics real pipelines want, since shards are written per
    * source anyway. Skewed sources are a data problem (split the
    * stream into per-shard sub-keys), not a plan change. Zero-token
    * docs occupy their start sequence (n_seqs = 1), so the manifest
    * stays total. */
  /** Packing arithmetic over any (doc_id, source, n_tokens) relation —
    * shared by [[packSequences]] (whole corpus) and
    * [[trainingManifest]] (curated train split). */
  private def packFrom(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tok_end", sum(col("n_tokens")).over(w))
      .selectExpr("doc_id", "source", "n_tokens",
        "tok_end - n_tokens AS tok_start", "tok_end")
      .selectExpr("doc_id", "source", "n_tokens", "tok_start", "tok_end",
        s"${intDiv("tok_start", ctxLen.toString, SparkD)} AS first_seq",
        s"${intDiv(s"greatest(tok_end - 1, tok_start)", ctxLen.toString, SparkD)} AS last_seq")
      .selectExpr("doc_id", "source", "n_tokens", "tok_start", "tok_end",
        "first_seq", "last_seq",
        "CAST(last_seq - first_seq + 1 AS INTEGER) AS n_seqs")
  }

  /** DuckDB twin of [[packFrom]]: pack CTE chain over relation `src`
    * (columns doc_id, source, n_tokens), ending in `packed`. */
  private def packCtes(src: String): String =
    s"""pk_r AS (SELECT doc_id, source, n_tokens,
            CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tok_end
          FROM $src),
        pk_o AS (SELECT doc_id, source, n_tokens,
            tok_end - n_tokens AS tok_start, tok_end FROM pk_r),
        pk_s AS (SELECT doc_id, source, n_tokens, tok_start, tok_end,
            ${intDiv("tok_start", ctxLen.toString, DuckD)} AS first_seq,
            ${intDiv("greatest(tok_end - 1, tok_start)", ctxLen.toString, DuckD)} AS last_seq
          FROM pk_o),
        packed AS (SELECT doc_id, source, n_tokens, tok_start, tok_end,
            first_seq, last_seq,
            CAST(last_seq - first_seq + 1 AS INTEGER) AS n_seqs
          FROM pk_s)"""

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packFrom(Tables.documents(spark, dir)
      .selectExpr("doc_id", "source",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS BIGINT) AS n_tokens"))
      .orderBy("doc_id")

  val packSequencesOracle: String =
    s"""WITH t AS (SELECT doc_id, source,
                     CAST(${arrLen(words("text", DuckD), DuckD)} AS BIGINT) AS n_tokens
                   FROM documents),
        ${packCtes("t")}
        SELECT * FROM packed ORDER BY doc_id"""

  /** The END-TO-END deliverable, composed entirely from the engine's
    * own operator surface in one plan: quality gate + language-ID
    * agreement + near-dup removal + reproducible split
    * ([[curatedCorpus]]), then context-window sequence packing of the
    * surviving train split ([[packFrom]]) — document in, training
    * sequence coordinates out. This is the query a user of the
    * library would actually ship as their corpus build. Plan shape:
    * everything per-row fuses into the one curated scan; the only
    * additions over [[curatedCorpus]] are its existing anti-join and
    * one window keyed by source. */
  def trainingManifest(spark: SparkSession, dir: String): DataFrame =
    packFrom(curatedCorpus(spark, dir)
      .filter(org.apache.spark.sql.functions.col("split") === "train")
      .selectExpr("doc_id", "source", "CAST(n_tokens AS BIGINT) AS n_tokens"))
      .orderBy("doc_id")

  val trainingManifestOracle: String =
    s"""WITH RECURSIVE ${Dedup.closureCtes},
        labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                   FROM reach GROUP BY src),
        ${TextAnalysis.statsCtes},
        ${TextAnalysis.langCtes},
        tm_h AS (SELECT doc_id, ${unitHashCtes(DuckD).head} FROM documents),
        tm_u AS (SELECT doc_id, ${unitHashCtes(DuckD)(1)} FROM tm_h),
        cur AS (SELECT d.doc_id, d.source,
                  CAST(s.n_tokens AS BIGINT) AS n_tokens, $splitExpr
                FROM documents d
                JOIN stats s ON d.doc_id = s.doc_id
                JOIN lang_t l ON d.doc_id = l.doc_id
                JOIN tm_u uu ON d.doc_id = uu.doc_id
                WHERE s.quality_score >= 0.5 AND l.is_match = 1 AND s.n_tokens >= 5
                  AND NOT EXISTS (SELECT 1 FROM labels lb
                    WHERE lb.doc_id = d.doc_id AND lb.doc_id <> lb.cluster_id)),
        trn AS (SELECT doc_id, source, n_tokens FROM cur WHERE split = 'train'),
        ${packCtes("trn")}
        SELECT * FROM packed ORDER BY doc_id"""

  // ---- embedding coverage (corpus ↔ index integrity) ----

  /** Per-source embedding coverage: which fraction of each source's
    * documents has a row in the embeddings table (vec_id keyed by
    * doc_id). The integrity check run before any ANN/near-dup job —
    * a silently half-embedded corpus is the classic way an embedding
    * dedup under-reports. Plan shape: one equi-join on the id key
    * (both sides shuffle-partitioned by it at scale) and one small
    * hash agg on source; no distinct needed since vec_id is unique. */
  def embeddingCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), lit(1).as("has_emb"))
    Tables.documents(spark, dir).select("doc_id", "source")
      .join(emb, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("has_emb"), lit(0L)).cast("long").as("n_with_embedding"))
      .selectExpr("source", "n_docs", "n_with_embedding",
        "n_with_embedding / CAST(n_docs AS DOUBLE) AS coverage")
      .orderBy("source")
  }

  val embeddingCoverageOracle: String =
    s"""WITH j AS (SELECT d.doc_id, d.source,
            CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS has_emb
          FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id),
        g AS (SELECT source, count(*) AS n_docs,
                CAST(coalesce(sum(has_emb), 0) AS BIGINT) AS n_with_embedding
              FROM j GROUP BY source)
        SELECT source, n_docs, n_with_embedding,
          n_with_embedding / CAST(n_docs AS DOUBLE) AS coverage
        FROM g ORDER BY source"""

  // ---- domain mixing weights ----

  private val maxRepeat = "CAST(4.0 AS DOUBLE)"

  /** Per-source token accounting and mixing weights: each source's
    * token share, the repeat factor that would move it toward a
    * uniform per-source target (capped at [[maxRepeat]] epochs — the
    * well-known guard against over-repeating small domains), and the
    * resulting effective token count. This is the static mixture
    * computation a corpus assembly runs before sampling.
    *
    * Plan shape: one scan → hash agg on `source` (map-side combined)
    * → a window total over the handful of source rows. All downstream
    * arithmetic is single-division / single-multiplication per row on
    * exact integer aggregates, so the oracle is bit-exact. */
  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    Tables.documents(spark, dir)
      .selectExpr("source",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS BIGINT) AS n_tokens")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("total_tokens",
        sum(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("n_sources",
        count(lit(1)).over(Window.partitionBy()))
      .selectExpr("source", "n_docs", "n_tokens",
        "n_tokens / CAST(total_tokens AS DOUBLE) AS token_share",
        s"least(CAST(total_tokens AS DOUBLE) / n_sources / n_tokens, $maxRepeat) AS repeat_factor")
      .selectExpr("*",
        "CAST(round(n_tokens * repeat_factor) AS BIGINT) AS effective_tokens")
      .orderBy("source")
  }

  /** CTE chain ending in `mixw(source, n_docs, n_tokens, token_share,
    * repeat_factor)` — shared by the mix-weights and epoch-plan
    * oracles. */
  private def mixCtes: String =
    s"""mx_t AS (SELECT source,
            CAST(${arrLen(words("text", DuckD), DuckD)} AS BIGINT) AS n_tokens
          FROM documents),
        mx_g AS (SELECT source, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM mx_t GROUP BY source),
        mx_w AS (SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS total_tokens,
            count(*) OVER () AS n_sources FROM mx_g),
        mixw AS (SELECT source, n_docs, n_tokens,
            n_tokens / CAST(total_tokens AS DOUBLE) AS token_share,
            least(CAST(total_tokens AS DOUBLE) / n_sources / n_tokens, $maxRepeat) AS repeat_factor
          FROM mx_w)"""

  val mixWeightsOracle: String =
    s"""WITH $mixCtes
        SELECT *, CAST(round(n_tokens * repeat_factor) AS BIGINT) AS effective_tokens
        FROM mixw ORDER BY source"""

  // ---- temperature-scaled mixing (multilingual-style τ sampling) ----

  /** `corpus_mix_temperature`: the τ-scaled sampling table — per
    * source, the normalized weight w_s ∝ (chars_s)^τ at τ ∈ {1, 0.75,
    * 0.5, 0.25}, the standard knob for flattening a skewed source
    * distribution (multilingual training's temperature sampling;
    * τ=1 is proportional, τ→0 approaches uniform). The exponents are
    * restricted to quarter powers ON PURPOSE: x^0.5 = sqrt(x) and
    * x^0.25 = sqrt(sqrt(x)) are correctly-rounded IEEE ops on both
    * engines and x^0.75 composes as their product — no libm pow
    * anywhere. Weights are micro-quantized to BIGINTs per τ before
    * normalization (shares are scale-invariant within a τ, so τ=1
    * uses the exact char counts unquantized), making every share a
    * ratio of exact integers. One source-grain agg; the τ fan-out is
    * a stack over the handful of source rows. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val per = Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum("n_chars").as("chars"))
      .selectExpr("source", "CAST(chars AS BIGINT) AS chars",
        "CAST(chars AS DOUBLE) AS cd")
      .selectExpr("source", "chars",
        "chars AS w100",
        "CAST(round(sqrt(cd) * sqrt(sqrt(cd)) * 1e6) AS BIGINT) AS w075",
        "CAST(round(sqrt(cd) * 1e6) AS BIGINT) AS w050",
        "CAST(round(sqrt(sqrt(cd)) * 1e6) AS BIGINT) AS w025")
    val w = Window.partitionBy()
    per
      .withColumn("t100", sum(col("w100")).over(w))
      .withColumn("t075", sum(col("w075")).over(w))
      .withColumn("t050", sum(col("w050")).over(w))
      .withColumn("t025", sum(col("w025")).over(w))
      .selectExpr("source", "chars",
        """stack(4,
             CAST(1.0 AS DOUBLE), w100, t100,
             CAST(0.75 AS DOUBLE), w075, t075,
             CAST(0.5 AS DOUBLE), w050, t050,
             CAST(0.25 AS DOUBLE), w025, t025) AS (tau, w_q, w_tot)""")
      .selectExpr("source", "tau", "chars", "w_q",
        "CAST(w_q AS DOUBLE) / w_tot AS share")
      .orderBy("source", "tau")
  }

  val mixTemperatureOracle: String =
    s"""WITH cg AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
                    FROM documents GROUP BY source),
        cw AS (SELECT source, chars, CAST(chars AS DOUBLE) AS cd FROM cg),
        ws AS (SELECT source, chars,
                 chars AS w100,
                 CAST(round(sqrt(cd) * sqrt(sqrt(cd)) * 1e6) AS BIGINT) AS w075,
                 CAST(round(sqrt(cd) * 1e6) AS BIGINT) AS w050,
                 CAST(round(sqrt(sqrt(cd)) * 1e6) AS BIGINT) AS w025
               FROM cw),
        wt AS (SELECT *, CAST(sum(w100) OVER () AS BIGINT) AS t100,
                 CAST(sum(w075) OVER () AS BIGINT) AS t075,
                 CAST(sum(w050) OVER () AS BIGINT) AS t050,
                 CAST(sum(w025) OVER () AS BIGINT) AS t025
               FROM ws),
        st AS (SELECT source, chars, CAST(1.0 AS DOUBLE) AS tau,
                 w100 AS w_q, t100 AS w_tot FROM wt
               UNION ALL
               SELECT source, chars, CAST(0.75 AS DOUBLE), w075, t075 FROM wt
               UNION ALL
               SELECT source, chars, CAST(0.5 AS DOUBLE), w050, t050 FROM wt
               UNION ALL
               SELECT source, chars, CAST(0.25 AS DOUBLE), w025, t025 FROM wt)
        SELECT source, tau, chars, w_q,
          CAST(w_q AS DOUBLE) / w_tot AS share
        FROM st ORDER BY source, tau"""

  // ---- context-length fit planning ----

  private val contextLengths = Seq(256, 512, 1024, 2048)

  /** `corpus_context_fit`: the context-length decision table — for
    * each candidate sequence length L, how many documents fit whole,
    * what token mass survives hard truncation at L, and the packing
    * slack a truncate-only loader would waste. This is the readout
    * that picks L before committing to a packing run (the complement
    * of the packing/truncation operators, which EXECUTE a chosen L).
    * Exact integers end-to-end: per-doc token counts aggregate to
    * sums and least(n, L) sums; one scan, L fan-out via stack on the
    * per-doc grain, map-side-combined agg on the 4 L values. */
  def contextFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val stackArgs = contextLengths
      .map(l => s"CAST($l AS INT), least(n_tokens, CAST($l AS BIGINT))")
      .mkString(", ")
    Tables.documents(spark, dir)
      .selectExpr(
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS BIGINT) AS n_tokens")
      .selectExpr("n_tokens",
        s"stack(${contextLengths.size}, $stackArgs) AS (ctx_len, kept_tokens)")
      .groupBy("ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN n_tokens <= ctx_len THEN 1 ELSE 0 END")).as("n_fit"),
        sum("n_tokens").as("total_tokens"),
        sum("kept_tokens").as("kept_tokens"))
      .selectExpr("ctx_len", "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_fit AS BIGINT) AS n_fit",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(kept_tokens AS BIGINT) AS kept_tokens",
        "CAST(kept_tokens AS DOUBLE) / total_tokens AS kept_share")
      .orderBy("ctx_len")
  }

  val contextFitOracle: String = {
    val fan = contextLengths
      .map(l => s"SELECT n_tokens, CAST($l AS INTEGER) AS ctx_len, " +
        s"least(n_tokens, CAST($l AS BIGINT)) AS kept_tokens FROM tk")
      .mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT
            CAST(${arrLen(words("text", DuckD), DuckD)} AS BIGINT) AS n_tokens
          FROM documents),
        fan AS ($fan),
        g AS (SELECT ctx_len, count(*) AS n_docs,
                CAST(sum(CASE WHEN n_tokens <= ctx_len THEN 1 ELSE 0 END) AS BIGINT) AS n_fit,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(kept_tokens) AS BIGINT) AS kept_tokens
              FROM fan GROUP BY ctx_len)
        SELECT ctx_len, CAST(n_docs AS BIGINT) AS n_docs, n_fit,
          total_tokens, kept_tokens,
          CAST(kept_tokens AS DOUBLE) / total_tokens AS kept_share
        FROM g ORDER BY ctx_len"""
  }

  // ---- epoch expansion plan ----

  /** Per-document repeat counts that realize the [[mixWeights]]
    * mixture: every doc repeats floor(rf) times plus one more with
    * probability frac(rf), decided by the document's content hash —
    * deterministic Bernoulli rounding, so a source's expected epoch
    * count equals its repeat factor exactly and re-runs never change
    * any document's count. This is the manifest a mixture
    * materialization job fans out from. Plan shape: the weights are a
    * handful of per-source rows broadcast onto one corpus scan; the
    * hash decision is per-row. */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val weights = mixWeights(spark, dir).select("source", "repeat_factor")
    Tables.documents(spark, dir).select("doc_id", "source")
      .join(broadcast(weights), Seq("source"))
      .selectExpr(Seq("doc_id", "source", "repeat_factor")
        ++ unitHashCtes(SparkD).take(1): _*)
      .selectExpr("doc_id", "source", "repeat_factor", unitHashCtes(SparkD)(1))
      .selectExpr("doc_id", "source", "repeat_factor", "u",
        """CAST(floor(repeat_factor)
             + CASE WHEN u < repeat_factor - floor(repeat_factor)
                    THEN 1 ELSE 0 END AS INTEGER) AS n_repeats""")
      .orderBy("doc_id")
  }

  val epochPlanOracle: String =
    s"""WITH $mixCtes,
        ep_h AS (SELECT doc_id, source, ${unitHashCtes(DuckD).head} FROM documents),
        ep_u AS (SELECT doc_id, source, ${unitHashCtes(DuckD)(1)} FROM ep_h)
        SELECT u.doc_id, u.source, m.repeat_factor, u.u,
          CAST(floor(m.repeat_factor)
            + CASE WHEN u.u < m.repeat_factor - floor(m.repeat_factor)
                   THEN 1 ELSE 0 END AS INTEGER) AS n_repeats
        FROM ep_u u JOIN mixw m USING (source) ORDER BY u.doc_id"""

  // ---- the full curation pipeline as one relation ----

  private val qualityFilter =
    "quality_score >= 0.5 AND is_match = 1 AND n_tokens >= 5"

  /** The end-to-end training-corpus assembly a data team actually
    * ships, composed from the engine's own operator surface in one
    * plan: quality gate (the [[TextAnalysis]] stats columns),
    * language-ID agreement, near-dup removal (anti-join against
    * [[Dedup.dedupClusters]] non-canonical docs), and reproducible
    * split assignment — emitting the per-document manifest (id, lang,
    * source, tokens, quality, split).
    *
    * Plan shape at 100 TB: the quality, language, and split columns
    * are all per-row functions of the SAME document row, so they are
    * fused into one projection chain over ONE scan (never computed as
    * separate relations joined back on doc_id — that would be three
    * scans and two shuffle joins for what codegen does in a single
    * pass). The only join is the left-anti against the small
    * cluster-label relation. */
  def curatedCorpus(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val losers = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    Tables.documents(spark, dir)
      // one scan: stats + language scores side by side (both consume
      // `text`; doc_id/lang arrive via the stats/lang col lists)
      .selectExpr(TextAnalysis.statsCols(SparkD)
        ++ Seq("source") ++ TextAnalysis.langScoreCols(SparkD).drop(2)
        ++ Seq("lang"): _*)
      .selectExpr(TextAnalysis.statsDerived: _*)
      .selectExpr("*", TextAnalysis.qualityExpr, TextAnalysis.langPredExpr)
      .selectExpr("*", "CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS is_match")
      .where(qualityFilter)
      .join(losers, Seq("doc_id"), "left_anti")
      .selectExpr(Seq("doc_id", "lang", "source", "n_tokens", "quality_score")
        ++ unitHashCtes(SparkD).take(1): _*)
      .selectExpr("doc_id", "lang", "source", "n_tokens", "quality_score",
        unitHashCtes(SparkD)(1))
      .selectExpr("doc_id", "lang", "source", "n_tokens", "quality_score", splitExpr)
      .orderBy("doc_id")
  }

  val curatedCorpusOracle: String =
    s"""WITH RECURSIVE ${Dedup.closureCtes},
        labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                   FROM reach GROUP BY src),
        ${TextAnalysis.statsCtes},
        ${TextAnalysis.langCtes},
        uh_t AS (SELECT doc_id, ${unitHashCtes(DuckD).head} FROM documents),
        uu_t AS (SELECT doc_id, ${unitHashCtes(DuckD)(1)} FROM uh_t)
        SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.quality_score, $splitExpr
        FROM documents d
        JOIN stats s ON d.doc_id = s.doc_id
        JOIN lang_t l ON d.doc_id = l.doc_id
        JOIN uu_t uu ON d.doc_id = uu.doc_id
        WHERE s.quality_score >= 0.5 AND l.is_match = 1 AND s.n_tokens >= 5
          AND NOT EXISTS (SELECT 1 FROM labels lb
            WHERE lb.doc_id = d.doc_id AND lb.doc_id <> lb.cluster_id)
        ORDER BY d.doc_id"""

  // ---- curation funnel v2 (the session's signals, composed) ----

  private val funnel2Stages = Seq(
    "corpus", "calibrated_top80", "char_diversity", "span_coverage",
    "dsir_domain")

  /** Second-generation curation funnel: the four signals this tier
    * added — per-source calibrated quality (top 80 % of each source),
    * char-diversity garbage screen, duplicated-span coverage ≤ 50 %,
    * and DSIR domain match — applied in sequence with first-fail
    * attribution, the composition that proves the signals are
    * pipeline stages rather than islands (the original gate-based
    * funnel is [[qualityFunnel]]; the two are complementary layers).
    * All four inputs are existing oracle-gated relations joined on
    * doc_id; every verdict is an integer cross-multiply or exact-int
    * comparison; the readout is one agg + stack. */
  def funnelV2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cal = qualityCalibrated(spark, dir)
      .selectExpr("doc_id", "src_rank", "n_src")
    val div = TextAnalysis.charDiversity(spark, dir)
      .selectExpr("doc_id", "low_diversity")
    val cov = graft.llm.Spans.dupSpanCoverage(spark, dir)
      .selectExpr("doc_id", "n_tokens", "dup_tokens")
    val dsir = TextAnalysis.dsirWeights(spark, dir)
      .selectExpr("doc_id", "logw_nano", "n_tokens AS dsir_toks")
    // relative domain cut: per-token weight above the corpus mean —
    // the absolute sign is smoothing-dominated (every doc lands near
    // −0.16 nats/token on this corpus), the RELATIVE order is the
    // signal DSIR resamples on
    val dsirTot = dsir.filter(col("dsir_toks") > 0).agg(
      sum("logw_nano").as("tot_logw"), sum("dsir_toks").as("tot_toks"))
    val flags = cal.join(div, Seq("doc_id")).join(cov, Seq("doc_id"))
      .join(dsir, Seq("doc_id")).crossJoin(broadcast(dsirTot))
      .selectExpr("doc_id", "n_tokens",
        "CASE WHEN src_rank * 5 <= n_src * 4 THEN 1 ELSE 0 END AS f1",
        "CASE WHEN low_diversity = 0 THEN 1 ELSE 0 END AS f2",
        "CASE WHEN 2 * dup_tokens <= n_tokens THEN 1 ELSE 0 END AS f3",
        """CASE WHEN dsir_toks > 0 AND CAST(logw_nano AS DOUBLE) * tot_toks
             >= CAST(tot_logw AS DOUBLE) * dsir_toks THEN 1 ELSE 0 END AS f4""")
    val aggs =
      Seq("CAST(count(1) AS BIGINT) AS s0",
        "CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0") ++
      (1 to 4).map { k =>
        val conj = (1 to k).map(i => s"f$i").mkString(" * ")
        s"CAST(coalesce(sum($conj), 0) AS BIGINT) AS s$k"
      } ++
      (1 to 4).map { k =>
        val conj = (1 to k).map(i => s"f$i").mkString(" * ")
        s"CAST(coalesce(sum($conj * n_tokens), 0) AS BIGINT) AS t$k"
      }
    val one = flags.selectExpr("n_tokens", "f1", "f2", "f3", "f4")
      .agg(expr(aggs.head), aggs.tail.map(expr): _*)
    val stackArgs = (0 to 4).map { k =>
      s"$k, '${funnel2Stages(k)}', s$k, t$k, CASE WHEN s0 = 0 " +
        s"THEN CAST(NULL AS DOUBLE) ELSE s$k / CAST(s0 AS DOUBLE) END"
    }.mkString(", ")
    one.selectExpr(
        s"stack(5, $stackArgs) AS (stage, stage_name, n_docs, n_tokens, doc_share)")
      .orderBy("stage")
  }

  lazy val funnelV2Oracle: String = {
    val aggs =
      Seq("CAST(count(*) AS BIGINT) AS s0",
        "CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0") ++
      (1 to 4).map { k =>
        val conj = (1 to k).map(i => s"f$i").mkString(" * ")
        s"CAST(coalesce(sum($conj), 0) AS BIGINT) AS s$k"
      } ++
      (1 to 4).map { k =>
        val conj = (1 to k).map(i => s"f$i").mkString(" * ")
        s"CAST(coalesce(sum($conj * n_tokens), 0) AS BIGINT) AS t$k"
      }
    val rows = (0 to 4).map { k =>
      s"""SELECT $k AS stage, '${funnel2Stages(k)}' AS stage_name,
          s$k AS n_docs, t$k AS n_tokens,
          CASE WHEN s0 = 0 THEN CAST(NULL AS DOUBLE)
               ELSE s$k / CAST(s0 AS DOUBLE) END AS doc_share FROM one"""
    }.mkString(" UNION ALL ")
    s"""WITH cal AS MATERIALIZED (SELECT doc_id, src_rank, n_src
          FROM ($qualityCalibratedOracle) c0),
        dv AS MATERIALIZED (SELECT doc_id, low_diversity
          FROM (${TextAnalysis.charDiversityOracle}) d0),
        cov AS MATERIALIZED (SELECT doc_id, n_tokens, dup_tokens
          FROM (${graft.llm.Spans.dupSpanCoverageOracle}) v0),
        ds AS MATERIALIZED (SELECT doc_id, logw_nano, n_tokens AS dsir_toks
          FROM (${TextAnalysis.dsirWeightsOracle}) w0),
        dst AS (SELECT CAST(sum(logw_nano) AS BIGINT) AS tot_logw,
            CAST(sum(dsir_toks) AS BIGINT) AS tot_toks
          FROM ds WHERE dsir_toks > 0),
        flags AS (SELECT cal.doc_id, cov.n_tokens,
            CASE WHEN cal.src_rank * 5 <= cal.n_src * 4 THEN 1 ELSE 0 END AS f1,
            CASE WHEN dv.low_diversity = 0 THEN 1 ELSE 0 END AS f2,
            CASE WHEN 2 * cov.dup_tokens <= cov.n_tokens THEN 1 ELSE 0 END AS f3,
            CASE WHEN ds.dsir_toks > 0 AND CAST(ds.logw_nano AS DOUBLE) * dst.tot_toks
              >= CAST(dst.tot_logw AS DOUBLE) * ds.dsir_toks THEN 1 ELSE 0 END AS f4
          FROM cal JOIN dv ON cal.doc_id = dv.doc_id
          JOIN cov ON cal.doc_id = cov.doc_id
          JOIN ds ON cal.doc_id = ds.doc_id
          CROSS JOIN dst),
        one AS (SELECT ${aggs.mkString(", ")} FROM flags)
        SELECT * FROM ($rows) ORDER BY stage"""
  }

  // ---- token-budget planner ----

  private val budgets = Seq(50000L, 200000L, 1000000L)

  /** Budget → threshold inversion: for each target token budget, the
    * quality cutoff that keeps exactly that many tokens when documents
    * are admitted best-quality-first — the planning step every
    * data-mix decision runs ("what does a 2T-token corpus cost in
    * quality floor?"). The quality-ordered cumulative token sum uses
    * the same TWO-PHASE distributed prefix scan as [[chopBoundaries]]
    * (coarse quality-bucket totals → bucket-grain prefix → broadcast
    * offsets → within-bucket window) — never a single-partition global
    * window. The crossing row per budget is a min-rank aggregate over
    * the (tiny) qualifying set; budgets beyond the corpus keep
    * everything (totality). */
  def budgetPlanner(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = TextAnalysis.statsRelation(spark, dir)
      .selectExpr("doc_id", "CAST(n_tokens AS BIGINT) AS n_tokens", "quality_score",
        // coarse ordering bucket: quality DESC ⇒ bucket ASC
        "CAST(floor((1.0 - quality_score) * 1000) AS BIGINT) AS qb")
    val bucketTot = docs.groupBy("qb")
      .agg(sum("n_tokens").as("bt"), count(lit(1)).as("bc"))
    val off = bucketTot
      .withColumn("t_off", coalesce(sum("bt").over(Window.orderBy("qb")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("c_off", coalesce(sum("bc").over(Window.orderBy("qb")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("qb", "t_off", "c_off")
    val wIn = Window.partitionBy("qb")
      .orderBy(desc("quality_score"), asc("doc_id"))
    val ranked = docs.join(broadcast(off), Seq("qb"))
      .withColumn("cum", col("t_off") +
        sum("n_tokens").over(wIn.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("rk", col("c_off") + row_number().over(wIn))
      .select("doc_id", "quality_score", "cum", "rk")
      .transform(graft.ops.Checkpoints.cut)
    val total = ranked.agg(
      coalesce(max("cum"), lit(0L)).as("tot"),
      coalesce(max("rk"), lit(0L)).as("n_docs"))
    import spark.implicits._
    val budgetDf = budgets.toDF("budget")
    val crossing = budgetDf.crossJoin(ranked)
      .filter(col("cum") >= col("budget"))
      .groupBy("budget").agg(min("rk").as("rk"))
      .join(ranked, Seq("rk"))
    budgetDf
      .join(crossing.select("budget", "rk", "cum", "quality_score"),
        Seq("budget"), "left")
      .crossJoin(broadcast(total))
      .selectExpr("budget",
        "CAST(coalesce(rk, n_docs) AS BIGINT) AS docs_kept",
        "CAST(coalesce(cum, tot) AS BIGINT) AS tokens_kept",
        "coalesce(quality_score, -1.0) AS threshold_quality")
      .orderBy("budget")
  }

  val budgetPlannerOracle: String =
    s"""WITH ${TextAnalysis.statsCtes},
        d AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality_score
              FROM stats),
        ranked AS (SELECT doc_id, quality_score,
            sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            CAST(row_number() OVER
              (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rk
          FROM d),
        tot AS (SELECT coalesce(max(cum), 0) AS tot,
            coalesce(max(rk), 0) AS n_docs FROM ranked),
        b AS (SELECT unnest(ARRAY[${budgets.mkString(", ")}]) AS budget),
        crossing AS (SELECT b.budget, min(r.rk) AS rk
          FROM b JOIN ranked r ON r.cum >= b.budget GROUP BY b.budget),
        cr AS (SELECT c.budget, c.rk, r.cum, r.quality_score
          FROM crossing c JOIN ranked r ON c.rk = r.rk)
        SELECT b.budget,
          CAST(coalesce(cr.rk, tot.n_docs) AS BIGINT) AS docs_kept,
          CAST(coalesce(cr.cum, tot.tot) AS BIGINT) AS tokens_kept,
          coalesce(cr.quality_score, -1.0) AS threshold_quality
        FROM b LEFT JOIN cr ON b.budget = cr.budget CROSS JOIN tot
        ORDER BY b.budget"""

  // ---- per-source quality calibration ----

  /** Within-source percentile calibration of the quality score — the
    * fix for classifier domain drift: a raw threshold keeps 90 % of
    * one source and 4 % of another purely because the scorer's scale
    * shifts by domain, so production filters select per-source
    * QUANTILES instead (each source keeps its own top slice). Ranks
    * are exact integers from one source-partitioned window (same
    * shuffle key as the source quotas); the top-20 % verdict is the
    * integer cross-multiply rank·5 ≤ n_src. The rank orders on the
    * bit-identical quality double with the doc_id tie-break, so both
    * engines select the same element at every boundary. */
  def qualityCalibrated(spark: SparkSession, dir: String): DataFrame =
    // multi-consumer doc-grain relation: session-cached like the
    // other staged prefixes (Verify still measures the cold path)
    graft.PlanCache(spark, "quality_calibrated", dir) {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val q = Tables.documents(spark, dir).select("doc_id", "source")
      .join(TextAnalysis.statsRelation(spark, dir)
        .selectExpr("doc_id", "quality_score"), Seq("doc_id"))
    val bySrc = Window.partitionBy("source")
    val w = bySrc.orderBy(desc("quality_score"), asc("doc_id"))
    q.withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .selectExpr("doc_id", "source", "quality_score", "src_rank", "n_src",
        "CASE WHEN src_rank * 5 <= n_src THEN 1 ELSE 0 END AS top20_flag")
      .orderBy("doc_id")
  }

  val qualityCalibratedOracle: String =
    s"""WITH ${TextAnalysis.statsCtes},
        q AS (SELECT d.doc_id, d.source, s.quality_score
              FROM documents d JOIN stats s ON d.doc_id = s.doc_id),
        r AS (SELECT *,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY quality_score DESC, doc_id) AS BIGINT) AS src_rank,
            count(*) OVER (PARTITION BY source) AS n_src
          FROM q)
        SELECT doc_id, source, quality_score, src_rank,
          CAST(n_src AS BIGINT) AS n_src,
          CASE WHEN src_rank * 5 <= n_src THEN 1 ELSE 0 END AS top20_flag
        FROM r ORDER BY doc_id"""

  // ---- CCNet-style perplexity bucketing ----

  /** Per-source head/middle/tail thirds by the interpolated Kneser-Ney
    * bigram score — the CCNet recipe (Wenzek et al. 2020): score every
    * document with a small LM, bucket WITHIN each source by perplexity
    * terciles (head = most-fluent third), and let downstream mixing
    * draw from buckets instead of a global threshold (a global cut
    * would empty whole sources purely because the LM's scale shifts by
    * domain — the same drift the quality calibration fixes). Output is
    * the (source × bucket) decision card: doc/char mass plus the
    * bucket's score range (min/max are SELECTION ops on bit-identical
    * doubles, so cross-engine exact).
    *
    * Tercile membership is integer cross-multiplication on exact
    * ranks (rk·3 vs n_src), never a float percentile; ranks come from
    * one source-partitioned window over the bit-reproducible KN score
    * with doc_id tie-break — source is the established
    * calibration/quota shuffle key, and the per-source window is the
    * same scale shape those operators already carry. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val scores = graft.llm.LanguageModel.knBigramScore(spark, dir)
      .select("doc_id", "avg_kn_prob")
    val docs = Tables.documents(spark, dir).select("doc_id", "source", "n_chars")
    val bySrc = Window.partitionBy("source")
    val w = bySrc.orderBy(desc("avg_kn_prob"), asc("doc_id"))
    docs.join(scores, Seq("doc_id"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .withColumn("bucket", expr(
        """CASE WHEN rk * 3 <= n_src THEN 'head'
                WHEN rk * 3 <= 2 * n_src THEN 'middle'
                ELSE 'tail' END"""))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars"),
        min("avg_kn_prob").as("min_kn_prob"),
        max("avg_kn_prob").as("max_kn_prob"))
      .selectExpr("source", "bucket", "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_chars AS BIGINT) AS n_chars", "min_kn_prob", "max_kn_prob")
      .orderBy("source", "bucket")
  }

  val perplexityBucketsOracle: String =
    s"""WITH scored AS (
          SELECT d.doc_id, d.source, d.n_chars, k.avg_kn_prob
          FROM documents d
          JOIN (${graft.llm.LanguageModel.knBigramScoreOracle}) k
            ON d.doc_id = k.doc_id),
        r AS (SELECT *,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY avg_kn_prob DESC, doc_id) AS BIGINT) AS rk,
            count(*) OVER (PARTITION BY source) AS n_src
          FROM scored),
        b AS (SELECT *,
            CASE WHEN rk * 3 <= n_src THEN 'head'
                 WHEN rk * 3 <= 2 * n_src THEN 'middle'
                 ELSE 'tail' END AS bucket
          FROM r)
        SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS n_chars,
          min(avg_kn_prob) AS min_kn_prob,
          max(avg_kn_prob) AS max_kn_prob
        FROM b GROUP BY source, bucket ORDER BY source, bucket"""

  // ---- concat-then-chop packing boundary table ----

  private val chopLens = Seq(512, 2048, 8192)

  /** Context-length decision table for concat-then-chop packing (the
    * standard pretraining layout: concatenate all documents in a
    * fixed order, slice into L-token sequences): for each candidate
    * L, how many documents straddle a sequence boundary — the docs
    * whose coherence the chop destroys — plus sequence count and
    * tail waste. Chop packing has ZERO padding by construction, so
    * boundary-split share IS the quality cost, and this table is how
    * you pick L. One token-prefix-sum window (doc_id order — the
    * deterministic concat order) computed ONCE, then the three L
    * verdicts are per-row integer arithmetic off the same cumsum.
    * A doc straddles iff its first and last token land in different
    * L-blocks: cum_before DIV L ≠ (cum_before + n − 1) DIV L. */
  def chopBoundaries(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"CAST(size(${words("lower(text)", SparkD)}) AS BIGINT) AS n")
    // two-phase distributed prefix sum: a naive global-ORDER window
    // would drag the whole corpus through ONE partition. Instead:
    // shard by doc_id range, per-shard token totals (map-side
    // combined), prefix the SHARD totals (shard-grain — tiny global
    // window), broadcast the offsets back, and run the within-shard
    // cumsum under PARTITION BY shard — every stage parallel, result
    // bit-identical to the single-scan form the oracle computes.
    val sharded = docs.withColumn("shard", expr("doc_id DIV 10000"))
    val shardOff = sharded.groupBy("shard").agg(sum("n").as("st"))
      .withColumn("off", coalesce(
        sum("st").over(Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "off")
    val wIn = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = sharded.join(broadcast(shardOff), Seq("shard"))
      .withColumn("cb", col("off") + coalesce(sum("n").over(wIn), lit(0L)))
    val perL = cum.selectExpr("n", "cb",
        s"explode(array(${chopLens.mkString(", ")})) AS l")
      .selectExpr("l", "n",
        "CASE WHEN n > 0 AND cb DIV l <> (cb + n - 1) DIV l THEN 1 ELSE 0 END AS split")
    perL.groupBy("l").agg(
        count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        sum("split").as("n_docs_split"))
      .selectExpr("CAST(l AS INT) AS context_len", "n_docs", "total_tokens",
        "CAST((total_tokens + l - 1) DIV l AS BIGINT) AS n_sequences",
        "CAST(total_tokens % l AS BIGINT) AS tail_tokens",
        "CAST(n_docs_split AS BIGINT) AS n_docs_split",
        "CAST(n_docs_split AS DOUBLE) / n_docs AS split_frac")
      .orderBy("context_len")
  }

  val chopBoundariesOracle: String =
    s"""WITH d AS (SELECT doc_id,
          CAST(${arrLen(words("lower(text)", DuckD), DuckD)} AS BIGINT) AS n
        FROM documents),
       cum AS (SELECT doc_id, n,
           coalesce(sum(n) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         FROM d),
       perl AS (SELECT l.l, c.n,
           CASE WHEN c.n > 0 AND c.cb // l.l <> (c.cb + c.n - 1) // l.l
             THEN 1 ELSE 0 END AS split
         FROM cum c, (VALUES ${chopLens.map(l => s"($l)").mkString(", ")}) l(l))
       SELECT CAST(l AS INTEGER) AS context_len,
         count(*) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST((sum(n) + l - 1) // l AS BIGINT) AS n_sequences,
         CAST(sum(n) % l AS BIGINT) AS tail_tokens,
         CAST(sum(split) AS BIGINT) AS n_docs_split,
         CAST(sum(split) AS DOUBLE) / count(*) AS split_frac
       FROM perl GROUP BY l ORDER BY context_len"""

  // ---- training-shard plan ----

  private val nShards = 16

  /** Output sharding for the train split — the pipeline's last mile:
    * every curated train document lands in one of [[nShards]] shards
    * by content-independent hash (uniform regardless of doc_id
    * clustering or source skew), and gets a deterministic intra-shard
    * order key (seeded md5) — the "global shuffle" a training run
    * needs, as a pure function of the corpus, reproducible on any
    * cluster with no RNG state. The readout is the shard manifest:
    * per-shard doc/token mass (the balance check that decides whether
    * the hash is doing its job) and the first document in shuffle
    * order (a spot-probe that the order key is stable). One hash-agg
    * over the curated relation; the physical write would be
    * `.repartition(col("shard")).sortWithinPartitions("ok")` feeding
    * [[graft.io.Writers]] — partitioning and order both derive from
    * these columns. */
  def shardPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val cur = curatedCorpus(spark, dir).filter(col("split") === "train")
    cur.selectExpr("doc_id", "n_tokens",
        s"${hexPrefix32("md5(concat('shard:', CAST(doc_id AS STRING)))")} % $nShards AS shard",
        "md5(concat('order:', CAST(doc_id AS STRING))) AS ok")
      .groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        expr("min_by(doc_id, ok)").as("head_doc"))
      .selectExpr("shard", "n_docs", "total_tokens",
        "CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens", "head_doc")
      .orderBy("shard")
  }

  val shardPlanOracle: String =
    s"""WITH cur AS (SELECT * FROM ($curatedCorpusOracle) WHERE split = 'train'),
        sh AS (SELECT doc_id, n_tokens,
            ${hexPrefix32("md5('shard:' || CAST(doc_id AS VARCHAR))")} % $nShards AS shard,
            md5('order:' || CAST(doc_id AS VARCHAR)) AS ok
          FROM cur)
        SELECT shard, count(*) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          CAST(sum(n_tokens) AS DOUBLE) / count(*) AS mean_tokens,
          min_by(doc_id, ok) AS head_doc
        FROM sh GROUP BY shard ORDER BY shard"""

  // ---- stratified sampling ----

  private val stratFrac = 0.1

  /** Stratified EXACT-COUNT sampling: per language stratum, exactly
    * ⌈10% · |stratum|⌉ documents, chosen by content-hash order — the
    * eval-set construction that [[sampleSplit]]'s independent hash
    * buckets cannot give you (Bernoulli buckets only hit the target
    * fraction in expectation; an eval set wants the exact count, and
    * wants it stable under re-runs). Hash order makes the choice a
    * pure function of content: no seed state, identical on any
    * cluster. Plan shape: one window rank per stratum (the same
    * user-keyed shuffle+sort sessionization pays, keyed by lang) with
    * a per-stratum count window sharing the partitioning — one
    * exchange total. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{ceil, col, count, lit, row_number}
    val byLang = Window.partitionBy("lang")
    val ranked = Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "source", "md5(text) AS h")
      .withColumn("rn", row_number().over(
        byLang.orderBy("h", "doc_id")))
      .withColumn("n_stratum", count(lit(1)).over(byLang))
    ranked
      .filter(col("rn") <= ceil(col("n_stratum") * stratFrac))
      .selectExpr("lang", "doc_id", "source",
        "CAST(rn AS INTEGER) AS sample_rank",
        "CAST(n_stratum AS BIGINT) AS n_stratum")
      .orderBy("lang", "sample_rank")
  }

  val stratifiedSampleOracle: String =
    s"""WITH d AS (SELECT doc_id, lang, source, md5(text) AS h
          FROM documents),
        r AS (SELECT *, row_number() OVER (PARTITION BY lang
                ORDER BY h, doc_id) AS rn,
              count(*) OVER (PARTITION BY lang) AS n_stratum
              FROM d)
        SELECT lang, doc_id, source, CAST(rn AS INTEGER) AS sample_rank,
          CAST(n_stratum AS BIGINT) AS n_stratum
        FROM r WHERE rn <= ceil(n_stratum * $stratFrac)
        ORDER BY lang, sample_rank"""

  /** Context-window truncation loss — the budgeting number a training
    * pipeline reads before choosing max_seq_len: per source, how many
    * documents exceed the cap and how many tokens fall off the end
    * under truncate-to-cap (the alternative the packing manifest
    * [[packSequences]] exists to avoid — chunking keeps those tokens,
    * truncation spends them). Cap 64 sits inside the fixture's 10–99
    * token range so both channels are non-trivial at every SF. One
    * scan, one hash agg; the share is exact integers and one final
    * division. */
  private val truncCap = 64

  def truncationLoss(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, dir)
      .selectExpr("source",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS BIGINT) AS n_tokens")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        expr(s"sum(CASE WHEN n_tokens > $truncCap THEN 1 ELSE 0 END)")
          .as("n_truncated"),
        expr(s"sum(greatest(n_tokens - $truncCap, 0))").as("lost_tokens"))
      .selectExpr("source", "n_docs", "total_tokens", "n_truncated",
        "lost_tokens",
        "CAST(lost_tokens AS DOUBLE) / total_tokens AS lost_share")
      .orderBy("source")
  }

  val truncationLossOracle: String =
    s"""WITH t AS (SELECT source,
          CAST(${arrLen(words("text", DuckD), DuckD)} AS BIGINT) AS n_tokens
          FROM documents),
        g AS (SELECT source, count(*) AS n_docs,
            sum(n_tokens) AS total_tokens,
            sum(CASE WHEN n_tokens > $truncCap THEN 1 ELSE 0 END) AS n_truncated,
            sum(greatest(n_tokens - $truncCap, 0)) AS lost_tokens
          FROM t GROUP BY source)
        SELECT source, n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
          CAST(n_truncated AS BIGINT) AS n_truncated,
          CAST(lost_tokens AS BIGINT) AS lost_tokens,
          CAST(lost_tokens AS DOUBLE) / total_tokens AS lost_share
        FROM g ORDER BY source"""

  // ---- weighted sampling without replacement ----

  private val wsK = 50

  /** Per-row A-ES key: with u ∈ (0, 1] a deterministic hash uniform and
    * w the document weight, key = −ln(u)/w is an Exp(w) draw; the k
    * SMALLEST keys are a weighted sample without replacement
    * (Efraimidis–Spirakis via the exponential-race formulation). The
    * 'ws|' salt decorrelates the draw from the split/quota hashes so
    * sampling never biases against a particular split. h+1 keeps u
    * strictly positive (ln(0) would yield +∞). The raw double key is
    * NOT exposed: ln() diverges by 1 ulp between engines on a few
    * inputs (measured 2/500 on this corpus — like exp(), see
    * customer_survival_km's scaladoc), so the key is quantized to
    * pico-units immediately and BOTH the top-k selection and the
    * output run on the exact BIGINT. A 1-ulp input wobble survives
    * quantization only when k·10¹² sits within an ulp of a rounding
    * boundary (~2·10⁻⁹ per row) — versus every row being a potential
    * mismatch on the raw double.
    *
    * Zero-weight guard: a zero-length document would make −ln(u)/0
    * Infinity, which Spark's non-ANSI CAST saturates to Long.MaxValue
    * but DuckDB REJECTS (CAST(round(inf) AS BIGINT) raises) — a
    * cross-engine divergence waiting for the first empty doc in a
    * fixture. Weightless rows can never win a weighted draw anyway, so
    * both engines filter n_chars >= 1 up front (the same guard
    * Chunking applies to empty texts). */
  private def aresKey(d: Dialect): Seq[String] = Seq(
    s"md5(concat('ws|', ${castStr("doc_id", d)})) AS h",
    s"(${hexPrefix32("h")} + 1) / CAST(4294967296 AS DOUBLE) AS u",
    "CAST(round(-ln(u) / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT) AS k_pico")

  /** Weighted reservoir sample (k=[[wsK]], weight = n_chars): longer
    * documents are proportionally likelier — the "sample by token
    * budget, not by document count" primitive of corpus assembly.
    * Wholly per-row projections + one top-k (TakeOrderedAndProject:
    * per-partition heaps, no global sort), so the plan is a scan +
    * top-k at ANY corpus size; re-runs, stragglers, and added
    * documents never disturb previously sampled ids (hash keys, no
    * RNG state). */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val keyed = aresKey(SparkD).foldLeft(
      Tables.documents(spark, dir).selectExpr("doc_id", "source", "n_chars")
        .filter("n_chars >= 1")) {
        (df, e) => df.selectExpr("*", e) }
    keyed
      .orderBy(col("k_pico").asc, col("doc_id").asc)
      .limit(wsK)
      .selectExpr("doc_id", "source", "CAST(n_chars AS BIGINT) AS n_chars",
        "k_pico")
      .withColumn("sample_rank", expr(
        "row_number() OVER (ORDER BY k_pico, doc_id)"))
      .orderBy("sample_rank")
  }

  val weightedSampleOracle: String = {
    val Seq(hE, uE, kE) = aresKey(DuckD)
    s"""WITH h_t AS (SELECT doc_id, source, n_chars, $hE FROM documents
          WHERE n_chars >= 1),
        u_t AS (SELECT *, $uE FROM h_t),
        k_t AS (SELECT *, $kE FROM u_t),
        top AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
                  k_pico
                FROM k_t ORDER BY k_pico, doc_id LIMIT $wsK)
        SELECT *, row_number() OVER (ORDER BY k_pico, doc_id) AS sample_rank
        FROM top ORDER BY sample_rank"""
  }

  // ---- the curation funnel readout ----

  /** Shared first-failing-stage expression — identical SQL text in
    * both engines. Stage order is the order a pipeline applies the
    * filters: gate, language, exact dedup, near dedup, decontam. */
  private val firstFailExpr =
    "CASE WHEN f1 = 0 THEN 1 WHEN f2 = 0 THEN 2 WHEN f3 = 0 THEN 3 " +
      "WHEN f4 = 0 THEN 4 WHEN f5 = 0 THEN 5 ELSE 99 END AS first_fail"

  private val funnelStages = Seq(
    "raw", "quality_gate", "lang_id", "exact_dedup", "near_dedup", "decontam")

  /** One conditional-aggregation row: survivors (docs and tokens) at
    * every funnel stage in a single pass over the flag relation. */
  private val funnelAggs: Seq[String] = (0 to 5).flatMap(k => Seq(
    s"CAST(coalesce(sum(CASE WHEN first_fail > $k THEN 1 ELSE 0 END), 0) AS BIGINT) AS s$k",
    s"CAST(coalesce(sum(CASE WHEN first_fail > $k THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS t$k"))

  /** Corpus-curation FUNNEL: how many documents (and tokens) survive
    * each successive pipeline filter — quality gate, language-ID
    * agreement, exact dedup (canonical only), near-dup collapse
    * (cluster canonical only), and benchmark decontamination (eval
    * members and contaminated docs removed). This is the accounting
    * table every training-data run is reported by: where the corpus
    * is lost, stage by stage.
    *
    * Plan shape at 100 TB: the gate counts and language scores fuse
    * into ONE projection over one corpus scan ([[curatedCorpus]]'s
    * discipline); exact-dedup canonicality is one fingerprint-keyed
    * window; the near-dup and contamination flags are left joins
    * against the (small) loser/contaminated id sets the dedup tier
    * already produces. The funnel itself is one conditional
    * aggregation to a SINGLE row, unpivoted to six — no per-stage
    * rescans, no driver loop. */
  def qualityFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val perDoc = Tables.documents(spark, dir)
      .selectExpr(TextAnalysis.gateCols(SparkD)
        ++ TextAnalysis.langScoreCols(SparkD).drop(2)
        ++ Seq("lang", s"md5(${Dedup.normExpr(SparkD)}) AS fp"): _*)
      .selectExpr(("*" +: TextAnalysis.gateRules): _*)
      .selectExpr(("*" +: TextAnalysis.gateVerdict): _*)
      .selectExpr("*", TextAnalysis.langPredExpr)
      .selectExpr("doc_id", "n_tokens", "fp", "pass AS f1",
        "CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS f2")
    val withExact = perDoc.withColumn("f3",
      when(min("doc_id").over(Window.partitionBy("fp")) === col("doc_id"), 1)
        .otherwise(0))
    val losers = Dedup.dedupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(1).as("is_loser"))
    val contam = TextAnalysis.contamShared(spark, dir)
      .select("doc_id").distinct().withColumn("is_contam", lit(1))
    val flagged = withExact
      .join(losers, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_tokens", "f1", "f2", "f3",
        "CASE WHEN is_loser IS NULL THEN 1 ELSE 0 END AS f4",
        s"CASE WHEN doc_id % ${TextAnalysis.evalMod} = ${TextAnalysis.evalRem} " +
          "OR is_contam IS NOT NULL THEN 0 ELSE 1 END AS f5")
      .selectExpr("n_tokens", firstFailExpr)
    val one = flagged.agg(expr(funnelAggs.head), funnelAggs.tail.map(expr): _*)
    val stackArgs = (0 to 5).map { k =>
      s"$k, '${funnelStages(k)}', s$k, t$k, CASE WHEN s0 = 0 " +
        s"THEN CAST(NULL AS DOUBLE) ELSE s$k / CAST(s0 AS DOUBLE) END"
    }.mkString(", ")
    one.selectExpr(
        s"stack(6, $stackArgs) AS (stage, stage_name, n_docs, n_tokens, doc_share)")
      .orderBy("stage")
  }

  val qualityFunnelOracle: String = {
    val rows = (0 to 5).map { k =>
      s"""SELECT $k AS stage, '${funnelStages(k)}' AS stage_name,
          s$k AS n_docs, t$k AS n_tokens,
          CASE WHEN s0 = 0 THEN CAST(NULL AS DOUBLE)
               ELSE s$k / CAST(s0 AS DOUBLE) END AS doc_share FROM one"""
    }.mkString(" UNION ALL ")
    s"""WITH RECURSIVE ${Dedup.closureCtes},
        labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
                   FROM reach GROUP BY src),
        ${TextAnalysis.gateCtes},
        ${TextAnalysis.langCtes},
        ${TextAnalysis.contamSharedCtes},
        contam_docs AS (SELECT DISTINCT doc_id FROM contam_shared),
        fp_t AS (SELECT doc_id, md5(${Dedup.normExpr(DuckD)}) AS fp FROM documents),
        canon AS (SELECT doc_id, CASE WHEN min(doc_id) OVER (PARTITION BY fp) = doc_id
                    THEN 1 ELSE 0 END AS f3 FROM fp_t),
        flags AS (SELECT g.doc_id, g.n_tokens, g.pass AS f1, l.is_match AS f2, c.f3,
            CASE WHEN lb.doc_id IS NULL THEN 1 ELSE 0 END AS f4,
            CASE WHEN g.doc_id % ${TextAnalysis.evalMod} = ${TextAnalysis.evalRem}
                 OR cd.doc_id IS NOT NULL THEN 0 ELSE 1 END AS f5
          FROM gate g
          JOIN lang_t l ON g.doc_id = l.doc_id
          JOIN canon c ON g.doc_id = c.doc_id
          LEFT JOIN (SELECT doc_id FROM labels WHERE doc_id <> cluster_id) lb
            ON g.doc_id = lb.doc_id
          LEFT JOIN contam_docs cd ON g.doc_id = cd.doc_id),
        ff AS (SELECT n_tokens, $firstFailExpr FROM flags),
        one AS (SELECT ${funnelAggs.mkString(", ")} FROM ff)
        SELECT * FROM ($rows) ORDER BY stage"""
  }

  // ---- corpus datacard ----

  /** One-row dataset datasheet — the summary block of a data card
    * (Gebru et al., "Datasheets for Datasets"): corpus size, source
    * and language spread, token mass, verbatim-duplication rate, and
    * means. Everything rides ONE scan of `documents` into a single
    * map-side-combined aggregation (exact distincts over the bounded
    * source/lang domains plus an md5 fingerprint distinct); the
    * deeper tiers (near-dup clusters, quality funnel, span coverage)
    * publish their own queries — this is the headline block that
    * fronts them. Means are exact-count divisions in one IEEE tree;
    * counts are BIGINT. */
  def datacard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "source", "lang", "n_chars",
        s"size(${words("lower(text)", SparkD)}) AS n_tokens",
        "md5(text) AS fp",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        countDistinct("lang").as("n_langs"),
        sum("n_chars").as("total_chars"),
        sum("n_tokens").as("total_tokens"),
        countDistinct("fp").as("distinct_texts"),
        sum("is_en").as("n_en_docs"))
      .selectExpr("n_docs", "n_sources", "n_langs",
        "total_chars", "total_tokens", "distinct_texts",
        "n_docs - distinct_texts AS exact_dup_docs",
        "n_en_docs",
        "CAST(total_chars AS DOUBLE) / n_docs AS mean_chars",
        "CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens",
        "CAST(n_en_docs AS DOUBLE) / n_docs AS pct_en_docs")
  }

  val datacardOracle: String =
    s"""WITH d AS (SELECT doc_id, source, lang, n_chars,
          len(${words("lower(text)", DuckD)}) AS n_tokens,
          md5(text) AS fp,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
        FROM documents),
       agg AS (SELECT count(*) AS n_docs,
          count(DISTINCT source) AS n_sources,
          count(DISTINCT lang) AS n_langs,
          sum(n_chars) AS total_chars,
          sum(n_tokens) AS total_tokens,
          count(DISTINCT fp) AS distinct_texts,
          sum(is_en) AS n_en_docs
        FROM d)
       SELECT CAST(n_docs AS BIGINT) AS n_docs,
         CAST(n_sources AS BIGINT) AS n_sources,
         CAST(n_langs AS BIGINT) AS n_langs,
         CAST(total_chars AS BIGINT) AS total_chars,
         CAST(total_tokens AS BIGINT) AS total_tokens,
         CAST(distinct_texts AS BIGINT) AS distinct_texts,
         CAST(n_docs - distinct_texts AS BIGINT) AS exact_dup_docs,
         CAST(n_en_docs AS BIGINT) AS n_en_docs,
         CAST(total_chars AS DOUBLE) / n_docs AS mean_chars,
         CAST(total_tokens AS DOUBLE) / n_docs AS mean_tokens,
         CAST(n_en_docs AS DOUBLE) / n_docs AS pct_en_docs
       FROM agg"""

  // ---- content-addressed corpus manifest (Merkle fingerprint) ----

  /** Three-level Merkle fingerprint of the corpus — the dataset-version
    * identity every reproducible training run records (the HuggingFace
    * datasets fingerprint / DVC content-hash idea): md5 leaf per
    * document, per-BLOCK hash over the sorted leaves (8 blocks per
    * shard), per-shard hash over its sorted block hashes, and a root
    * over the sorted shard hashes. Sorting makes every level a
    * canonical SET fingerprint — immune to scan order, partitioning,
    * and shuffle nondeterminism, which is precisely what makes it
    * usable as an identity: same bytes in, same root out, on any
    * cluster. A changed/added/dropped document flips its block, its
    * shard, and the root; the 128 block rows localize WHICH 1/128th
    * of the corpus changed before any doc-level diff runs.
    *
    * Scale shape: the block level is what bounds the string aggs —
    * each ordered concat covers n/128 leaves, and deepening the tree
    * (more levels, same three-line pattern) keeps every agg buffer
    * at a chosen constant as the corpus grows; the upper levels
    * aggregate HASHES, never documents. */
  def contentManifest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{count, expr, lit, sum}
    val blocks = Tables.documents(spark, dir)
      .selectExpr("doc_id % 16 AS shard_id",
        "(doc_id DIV 16) % 8 AS block_id", "md5(text) AS leaf")
      .groupBy("shard_id", "block_id")
      .agg(count(lit(1)).as("n_docs"),
        expr("md5(array_join(sort_array(collect_list(leaf)), ''))")
          .as("hash"))
    val shards = blocks.groupBy("shard_id")
      .agg(sum("n_docs").as("n_docs"),
        expr("md5(array_join(sort_array(collect_list(hash)), ''))")
          .as("hash"))
    val root = shards
      .agg(sum("n_docs").as("n_docs"),
        expr("md5(array_join(sort_array(collect_list(hash)), ''))")
          .as("hash"))
      .selectExpr("'root' AS level", "CAST(-1 AS BIGINT) AS shard_id",
        "CAST(-1 AS BIGINT) AS block_id", "n_docs", "hash")
    blocks
      .selectExpr("'block' AS level", "shard_id", "block_id", "n_docs",
        "hash")
      .unionByName(shards.selectExpr("'shard' AS level", "shard_id",
        "CAST(-1 AS BIGINT) AS block_id", "n_docs", "hash"))
      .unionByName(root)
      .orderBy("level", "shard_id", "block_id")
  }

  val contentManifestOracle: String =
    """WITH leaves AS (SELECT doc_id % 16 AS shard_id,
          (doc_id // 16) % 8 AS block_id, md5(text) AS leaf
          FROM documents),
        blocks AS (SELECT shard_id, block_id, count(*) AS n_docs,
            md5(string_agg(leaf, '' ORDER BY leaf)) AS hash
          FROM leaves GROUP BY shard_id, block_id),
        shards AS (SELECT shard_id, CAST(sum(n_docs) AS BIGINT) AS n_docs,
            md5(string_agg(hash, '' ORDER BY hash)) AS hash
          FROM blocks GROUP BY shard_id),
        root AS (SELECT 'root' AS level, CAST(-1 AS BIGINT) AS shard_id,
            CAST(-1 AS BIGINT) AS block_id,
            CAST(sum(n_docs) AS BIGINT) AS n_docs,
            md5(string_agg(hash, '' ORDER BY hash)) AS hash
          FROM shards)
        SELECT 'block' AS level, shard_id, block_id, n_docs, hash
        FROM blocks
        UNION ALL SELECT 'shard', shard_id, CAST(-1 AS BIGINT), n_docs, hash
        FROM shards
        UNION ALL SELECT * FROM root
        ORDER BY level, shard_id, block_id"""

  // ---- leakage-free cluster-atomic split ----

  /** Cluster-atomic train/val/test split — the FIX whose need
    * [[graft.llm.Spans.splitLeakage]] measures: hashing DOC ids
    * scatters near-duplicate documents across splits (train/test
    * leakage, benchmark inflation), so the split key must be the
    * near-dup CLUSTER id — every cluster lands in exactly one split
    * BY CONSTRUCTION. Emitted as a paired audit of both strategies:
    * per (strategy, split) doc and touched-cluster counts, plus a
    * SPANNING row per strategy counting clusters split across
    * assignments — 0 for cluster_hash structurally, and the nonzero
    * doc_hash number is precisely the leakage surface removed.
    * Singletons (docs in no near-dup pair) are their own cluster
    * (coalesce to doc_id, the [[graft.llm.Similarity.semanticClusters]]
    * convention). The cluster relation is the session-cached
    * propagation labels; everything else is one stack + two
    * dim-bounded aggs. */
  def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val labels = Tables.documents(spark, dir).select("doc_id")
      .join(Dedup.dedupClusters(spark, dir)
        .selectExpr("doc_id", "cluster_id AS cl"), Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "coalesce(cl, doc_id) AS cluster_id")
    def splitOf(key: String): String =
      s"""CASE WHEN (${hexPrefix32(s"md5(${castStr(key, SparkD)})")})
            / CAST(4294967296 AS DOUBLE) < 0.8 THEN 'train'
          WHEN (${hexPrefix32(s"md5(${castStr(key, SparkD)})")})
            / CAST(4294967296 AS DOUBLE) < 0.9 THEN 'val'
          ELSE 'test' END"""
    val assigned = labels.selectExpr("doc_id", "cluster_id",
      s"${splitOf("cluster_id")} AS split_cluster",
      s"${splitOf("doc_id")} AS split_doc")
      .selectExpr("doc_id", "cluster_id",
        "stack(2, 'cluster_hash', split_cluster, 'doc_hash', split_doc) " +
          "AS (strategy, split)")
    val perSplit = assigned.groupBy("strategy", "split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("cluster_id").as("n_clusters"))
    val spanning = assigned.groupBy("strategy", "cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .groupBy("strategy")
      .agg(sum(expr("CASE WHEN n_splits > 1 THEN 1 ELSE 0 END"))
        .as("n_docs"),
        count(lit(1)).as("n_clusters"))
      .selectExpr("strategy", "'SPANNING' AS split",
        "CAST(n_docs AS BIGINT) AS n_docs", "n_clusters")
    perSplit.selectExpr("strategy", "split", "n_docs", "n_clusters")
      .unionByName(spanning)
      .orderBy("strategy", "split")
  }

  val clusterSplitOracle: String = {
    def splitOf(key: String): String =
      s"""CASE WHEN (${hexPrefix32(s"md5(${castStr(key, DuckD)})")})
            / CAST(4294967296 AS DOUBLE) < 0.8 THEN 'train'
          WHEN (${hexPrefix32(s"md5(${castStr(key, DuckD)})")})
            / CAST(4294967296 AS DOUBLE) < 0.9 THEN 'val'
          ELSE 'test' END"""
    s"""WITH labels AS (SELECT d.doc_id,
            coalesce(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d
          LEFT JOIN (${Dedup.dedupClustersOracle}) c
            ON d.doc_id = c.doc_id),
        assigned AS (
          SELECT doc_id, cluster_id, 'cluster_hash' AS strategy,
            ${splitOf("cluster_id")} AS split FROM labels
          UNION ALL
          SELECT doc_id, cluster_id, 'doc_hash',
            ${splitOf("doc_id")} FROM labels),
        per_split AS (SELECT strategy, split, count(*) AS n_docs,
            count(DISTINCT cluster_id) AS n_clusters
          FROM assigned GROUP BY strategy, split),
        spanning AS (SELECT strategy,
            CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_docs,
            count(*) AS n_clusters
          FROM (SELECT strategy, cluster_id,
                  count(DISTINCT split) AS n_splits
                FROM assigned GROUP BY strategy, cluster_id) x
          GROUP BY strategy)
        SELECT strategy, split, n_docs, n_clusters FROM per_split
        UNION ALL
        SELECT strategy, 'SPANNING', n_docs, n_clusters FROM spanning
        ORDER BY strategy, split"""
  }

  // ---- leave-one-out source ablation ----

  /** `corpus_source_ablation`: data-valuation by algebraic
    * leave-one-out — for each source, the corpus mean quality WITH it
    * and WITHOUT it, and the delta (positive = the source pulls the
    * corpus up). This is the cheapest honest answer to "which feed is
    * hurting the mix" — the full per-source retrain is a fleet job,
    * but the metric-level ablation is pure sufficient-statistics
    * algebra: one pass accumulates the global (N, Σq) and per-source
    * (n_s, Σq_s); mean-without-s = (Σq − Σq_s)/(N − n_s). Nothing is
    * recomputed per source, so the cost is one map-side-combined agg
    * regardless of source count — the shape that survives 10⁴
    * sources at 100 TB.
    *
    * Exactness: per-doc quality is nano-quantized before summation
    * (the corpus-wide rule — BIGINT sums are order-independent where
    * double sums are not); the three means are exact-integer-division
    * double readouts with identical text on both engines. */
  def sourceAblation(spark: SparkSession, dir: String): DataFrame = {
    val q = graft.llm.TextAnalysis.statsRelation(spark, dir)
      .selectExpr("doc_id",
        "CAST(round(quality_score * 1e9) AS BIGINT) AS q_nano")
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    val perDoc = src.join(q, Seq("doc_id"))
    val bySrc = perDoc.groupBy("source")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum("q_nano").as("sq"))
    val glob = bySrc.agg(
      org.apache.spark.sql.functions.sum("n_docs").as("n_total"),
      org.apache.spark.sql.functions.sum("sq").as("sq_total"))
    bySrc.crossJoin(org.apache.spark.sql.functions.broadcast(glob))
      .selectExpr("source", "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(sq AS DOUBLE) / n_docs / 1e9 AS mean_quality",
        "CAST(sq_total - sq AS DOUBLE) / (n_total - n_docs) / 1e9 AS mean_without",
        """(CAST(sq AS DOUBLE) / n_docs / 1e9)
           - (CAST(sq_total - sq AS DOUBLE) / (n_total - n_docs) / 1e9)
           AS ablation_delta""")
      .orderBy("source")
  }

  val sourceAblationOracle: String =
    s"""WITH ${graft.llm.TextAnalysis.statsCtes},
        per_doc AS (SELECT d.source,
            CAST(round(s.quality_score * 1e9) AS BIGINT) AS q_nano
          FROM documents d JOIN stats s ON s.doc_id = d.doc_id),
        by_src AS (SELECT source, count(*) AS n_docs, sum(q_nano) AS sq
          FROM per_doc GROUP BY source),
        gtot AS (SELECT sum(n_docs) AS n_total, sum(sq) AS sq_total
          FROM by_src)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
          CAST(sq AS DOUBLE) / n_docs / 1e9 AS mean_quality,
          CAST(sq_total - sq AS DOUBLE) / (n_total - n_docs) / 1e9
            AS mean_without,
          (CAST(sq AS DOUBLE) / n_docs / 1e9)
           - (CAST(sq_total - sq AS DOUBLE) / (n_total - n_docs) / 1e9)
           AS ablation_delta
        FROM by_src, gtot ORDER BY source"""

  // ---- water-filling token-budget allocation ----

  /** `corpus_budget_waterfill`: allocate a token budget across sources
    * by WATER-FILLING — the max-min-fair allocation (Bertsekas &
    * Gallager 1992 §6.5.2): sources smaller than the water level keep
    * everything they have; the rest are cut to one common level chosen
    * so the total exactly meets the budget. This is the allocation
    * that neither starves small sources (quota-proportional does) nor
    * lets one giant source eat the budget (uniform caps do). The
    * closed form needs one sort by availability: source k (ascending)
    * is fully funded iff funding EVERYONE remaining at its
    * availability still fits the remaining budget; the first source
    * where that fails fixes the level.
    *
    * Integer exactness: the level is an integer DIV and the remainder
    * is distributed one token each to the first `rem` uncapped sources
    * in rank order, so Σ allocated == min(budget, total) EXACTLY —
    * the identity the output exposes and the oracle hashes. Budget =
    * 40 % of corpus tokens, derived not hard-coded, so the operator
    * scales with the fixture. All relations are source-grain (20
    * rows); the corpus dies in the first per-source agg. */
  def budgetWaterfill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val perSource = Tables.documents(spark, dir)
      .selectExpr("source",
        s"CAST(${arrLen(words("lower(text)", SparkD), SparkD)} AS BIGINT) AS n_tok")
      .groupBy("source").agg(sum("n_tok").as("avail"))
    waterfillOf(perSource)
  }

  /** Test seam: the allocation over an arbitrary (source, avail)
    * relation — the fixture's sources are too balanced to exercise
    * the capped branch, so the spec feeds a skewed one. */
  private[graft] def waterfillOf(perSource: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val ranked = perSource
      .selectExpr("source", "avail",
        "row_number() OVER (ORDER BY avail, source) AS rk",
        "count(1) OVER () AS s_cnt",
        "CAST(sum(avail) OVER () AS BIGINT) AS total",
        """CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS BIGINT)) AS BIGINT) AS cum_before""")
      .selectExpr("source", "avail", "rk", "s_cnt", "cum_before",
        "(4 * total) DIV 10 AS budget")
      .selectExpr("*",
        "CASE WHEN avail * (s_cnt - rk + 1) <= budget - cum_before THEN 1 ELSE 0 END AS capped")
    val cut = ranked
      .agg(expr("min(CASE WHEN capped = 0 THEN rk END) AS k_star"),
        expr("max(budget) AS budget"),
        expr("max(s_cnt) AS s_cnt"),
        expr("CAST(sum(CASE WHEN capped = 1 THEN avail ELSE 0 END) AS BIGINT) AS capped_sum"))
      .selectExpr("k_star",
        "CASE WHEN k_star IS NULL THEN CAST(0 AS BIGINT) " +
          "ELSE (budget - capped_sum) DIV (s_cnt - k_star + 1) END AS level",
        "CASE WHEN k_star IS NULL THEN CAST(0 AS BIGINT) " +
          "ELSE (budget - capped_sum) % (s_cnt - k_star + 1) END AS rem")
    ranked.crossJoin(broadcast(cut))
      .selectExpr("source", "avail", "rk", "capped",
        """CASE WHEN capped = 1 THEN avail
                WHEN rk < k_star + rem THEN level + 1
                ELSE level END AS allocated""")
      .selectExpr("source", "avail", "CAST(rk AS BIGINT) AS rk",
        "CAST(capped AS INT) AS capped", "allocated")
      .orderBy("source")
  }

  val budgetWaterfillOracle: String =
    s"""WITH per_source AS (
         SELECT source,
           CAST(sum(${arrLen(words("lower(text)", DuckD), DuckD)}) AS BIGINT) AS avail
         FROM documents GROUP BY source),
       ranked0 AS (SELECT source, avail,
           row_number() OVER (ORDER BY avail, source) AS rk,
           count(*) OVER () AS s_cnt,
           CAST(sum(avail) OVER () AS BIGINT) AS total,
           CAST(coalesce(sum(avail) OVER (ORDER BY avail, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(0 AS BIGINT)) AS BIGINT) AS cum_before
         FROM per_source),
       ranked1 AS (SELECT *, (4 * total) // 10 AS budget FROM ranked0),
       ranked AS (SELECT *,
           CASE WHEN avail * (s_cnt - rk + 1) <= budget - cum_before
                THEN 1 ELSE 0 END AS capped
         FROM ranked1),
       cut AS (SELECT
           min(CASE WHEN capped = 0 THEN rk END) AS k_star,
           max(budget) AS budget, max(s_cnt) AS s_cnt,
           CAST(sum(CASE WHEN capped = 1 THEN avail ELSE 0 END) AS BIGINT) AS capped_sum
         FROM ranked),
       lv AS (SELECT k_star,
           CASE WHEN k_star IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST((budget - capped_sum) // (s_cnt - k_star + 1) AS BIGINT) END AS level,
           CASE WHEN k_star IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST((budget - capped_sum) % (s_cnt - k_star + 1) AS BIGINT) END AS rem
         FROM cut)
       SELECT source, avail, CAST(rk AS BIGINT) AS rk,
         CAST(capped AS INT) AS capped,
         CAST(CASE WHEN capped = 1 THEN avail
              WHEN rk < k_star + rem THEN level + 1
              ELSE level END AS BIGINT) AS allocated
       FROM ranked CROSS JOIN lv ORDER BY source"""

  // ---- span-corruption (denoising) masking plan ----

  /** Two-step integer hash with every intermediate bounded < 2^31 so
    * the multiply never leaves Long — the same LCG family as the
    * synthetic connector, parameterized by (doc, span index, salt). */
  private def spanHash(k: String, salt: Int): String =
    s"(((doc_id * 1000003 + ($k) * 7919 + $salt) % 2147483648) " +
      "* 1103515245 + 12345) % 2147483648"

  /** `doc_span_corruption_plan`: the deterministic noise-span plan a
    * T5-style denoising objective materializes before training
    * (Raffel et al. 2020 §3.1.4: corrupt ~15 % of tokens in spans of
    * mean length 3, replace each with a sentinel). Spans are drawn by
    * integer hashing (length 1–5 uniform, start uniform over the
    * doc), then OVERLAPPING spans are merged into maximal intervals —
    * the same islands pattern as the duplicate-span operator — and
    * sentinels are numbered in document order, because a masking plan
    * with overlapping spans double-counts its corruption budget and
    * mis-aligns the target sequence.
    *
    * Everything is exact integer arithmetic over the token grid; the
    * only windows are per-document over ≤ n/20+1 span rows. One scan,
    * one explode, one doc-grain window — nothing corpus-global. */
  def spanCorruptionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"CAST(size(${words("lower(text)", SparkD)}) AS BIGINT) AS n_tokens")
      .filter(col("n_tokens") >= 2)
      .selectExpr("doc_id", "n_tokens",
        "greatest(CAST(1 AS BIGINT), (n_tokens + 10) DIV 20) AS n_spans")
    val raw = base
      .selectExpr("doc_id", "n_tokens",
        "explode(sequence(CAST(1 AS BIGINT), n_spans)) AS k")
      .selectExpr("doc_id", "n_tokens", "k",
        s"1 + (${spanHash("k", 1)}) % 5 AS len0")
      .selectExpr("doc_id", "n_tokens", "k",
        "least(len0, n_tokens) AS len")
      .selectExpr("doc_id", "n_tokens", "k", "len",
        s"(${spanHash("k", 2)}) % (n_tokens - len + 1) AS start")
    val merged = mergeSpanIslands(
      raw.selectExpr("doc_id", "n_tokens", "start", "start + len AS fin", "k"))
    merged
      .selectExpr("doc_id", "n_tokens",
        "CAST(island AS BIGINT) AS sentinel",
        "CAST(start AS BIGINT) AS start_tok",
        "CAST(fin - start AS BIGINT) AS span_len")
      .orderBy("doc_id", "sentinel")
  }

  /** Merge overlapping/adjacent-overlap spans (doc_id, n_tokens,
    * start, fin, k) into maximal islands. Both windows MUST order by
    * the full (start, fin, k) triple: two hashed spans colliding on
    * identical (start, fin) in one doc are otherwise tie-ordered
    * arbitrarily, and if the flag-0 twin sums first it joins the
    * PREVIOUS island — overlapping "merged" intervals and
    * engine-dependent output (ADVICE r8). k makes the order total,
    * and identical across the flag and cumulative-sum passes (and
    * across engines — the DuckDB oracle carries the same triple). */
  private[graft] def mergeSpanIslands(spans: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spans
      .selectExpr("doc_id", "n_tokens", "start", "fin", "k",
        """CASE WHEN start > coalesce(max(fin) OVER (
               PARTITION BY doc_id ORDER BY start, fin, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(-1 AS BIGINT)) THEN 1 ELSE 0 END AS new_island""")
      .selectExpr("doc_id", "n_tokens", "start", "fin",
        """sum(new_island) OVER (PARTITION BY doc_id
             ORDER BY start, fin, k ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS island""")
      .groupBy("doc_id", "n_tokens", "island")
      .agg(org.apache.spark.sql.functions.min("start").as("start"),
        org.apache.spark.sql.functions.max("fin").as("fin"))

  val spanCorruptionPlanOracle: String = {
    def h(k: String, salt: Int) =
      s"(((doc_id * 1000003 + ($k) * 7919 + $salt) % 2147483648) " +
        "* 1103515245 + 12345) % 2147483648"
    s"""WITH base AS (
         SELECT doc_id,
           CAST(${arrLen(words("lower(text)", DuckD), DuckD)} AS BIGINT) AS n_tokens
         FROM documents),
       base2 AS (SELECT doc_id, n_tokens,
           greatest(CAST(1 AS BIGINT), (n_tokens + 10) // 20) AS n_spans
         FROM base WHERE n_tokens >= 2),
       ks AS (SELECT doc_id, n_tokens, unnest(range(1, n_spans + 1)) AS k
         FROM base2),
       raw0 AS (SELECT doc_id, n_tokens, k,
           1 + (${h("k", 1)}) % 5 AS len0 FROM ks),
       raw1 AS (SELECT doc_id, n_tokens, k,
           least(len0, n_tokens) AS len FROM raw0),
       raw AS (SELECT doc_id, n_tokens, k, len,
           (${h("k", 2)}) % (n_tokens - len + 1) AS start FROM raw1),
       spans AS (SELECT doc_id, n_tokens, start, start + len AS fin, k
         FROM raw),
       flagged AS (SELECT doc_id, n_tokens, start, fin, k,
           CASE WHEN start > coalesce(max(fin) OVER (
               PARTITION BY doc_id ORDER BY start, fin, k
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             CAST(-1 AS BIGINT)) THEN 1 ELSE 0 END AS new_island
         FROM spans),
       islands AS (SELECT doc_id, n_tokens, start, fin,
           sum(new_island) OVER (PARTITION BY doc_id
             ORDER BY start, fin, k ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS island
         FROM flagged),
       merged AS (SELECT doc_id, n_tokens, island,
           min(start) AS start, max(fin) AS fin
         FROM islands GROUP BY doc_id, n_tokens, island)
       SELECT doc_id, n_tokens, CAST(island AS BIGINT) AS sentinel,
         CAST(start AS BIGINT) AS start_tok,
         CAST(fin - start AS BIGINT) AS span_len
       FROM merged ORDER BY doc_id, sentinel"""
  }

  // ---- empirical-Bayes shrinkage of per-source pass rates ----

  /** Micro-quantized gate pass rate per source, as integer
    * round-half-up — `(2e6·k + n) div (2n)` is the exact midpoint
    * rounding both engines agree on (float `round` was rejected here:
    * the quotient can land on a representable .5 and the engines'
    * tie rules are only accidentally aligned). */
  private def rateQ(d: Dialect): String =
    intDiv("(2000000 * n_pass + n_docs)", "(2 * n_docs)", d)

  /** The prior/posterior arithmetic — ONE SQL text both engines run,
    * over exact integer sufficient statistics (s_cnt sources, s_q =
    * Σ quantized rates, s_qq = Σ squares; rates ≤ 1e6 so squares ≤
    * 1e12 and a thousand sources still fit a BIGINT sum). m/v are the
    * method-of-moments mean and population variance of the per-source
    * rates; `ab` is the implied beta prior mass α+β, zeroed when the
    * moments refuse a beta fit (v = 0 or v ≥ m(1−m)). */
  private val priorM =
    "CAST(s_q AS DOUBLE) / (1e6 * s_cnt) AS m"
  private val priorV =
    "CAST(s_qq AS DOUBLE) / (1e12 * s_cnt) " +
      "- (CAST(s_q AS DOUBLE) / (1e6 * s_cnt)) * (CAST(s_q AS DOUBLE) / (1e6 * s_cnt)) AS v"
  private val priorAb =
    "CASE WHEN v > 0 AND v < m * (1 - m) THEN m * (1 - m) / v - 1 ELSE 0 END AS ab"
  private val shrinkOut = Seq(
    "source", "n_docs", "n_pass",
    "n_pass / CAST(n_docs AS DOUBLE) AS raw_rate",
    "m * ab AS alpha",
    "(1 - m) * ab AS beta",
    "(n_pass + m * ab) / (n_docs + ab) AS shrunk_rate")

  /** `corpus_source_shrinkage`: per-source quality-gate pass rates
    * shrunk toward the corpus-wide prior by empirical Bayes
    * (beta-binomial, method-of-moments prior — Efron & Morris 1975's
    * recipe). A source with 10 documents and a lucky 100 % pass rate
    * should not outrank a source with 10 000 documents at 92 % when
    * mix weights or quotas consume the rate — the posterior mean
    * `(k+α)/(n+α+β)` pulls small-n sources toward the global mean in
    * proportion to their evidence.
    *
    * Scale shape: one corpus scan fused with the gate projection →
    * per-source partial agg (20 rows at any corpus size) → the prior
    * is one row computed from three integer sums and broadcast back
    * over the 20-row relation. Float determinism follows the
    * exact-moment discipline: every double is derived from exact
    * BIGINTs through one shared expression text. */
  def sourceShrinkage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val per = Tables.documents(spark, dir)
      .selectExpr(("source" +: TextAnalysis.gateCols(SparkD)): _*)
      .selectExpr(("*" +: TextAnalysis.gateRules): _*)
      .selectExpr(("*" +: TextAnalysis.gateVerdict): _*)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs0"), sum("pass").as("n_pass0"))
      .selectExpr("source",
        "CAST(n_docs0 AS BIGINT) AS n_docs",
        "CAST(n_pass0 AS BIGINT) AS n_pass")
    shrinkageOf(per)
  }

  /** Test seam: the posterior over an arbitrary
    * (source, n_docs, n_pass) relation. */
  private[graft] def shrinkageOf(per0: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val per = per0.selectExpr("*", s"${rateQ(SparkD)} AS q")
    val prior = per
      .agg(expr("CAST(count(*) AS BIGINT) AS s_cnt"),
        expr("CAST(sum(q) AS BIGINT) AS s_q"),
        expr("CAST(sum(q * q) AS BIGINT) AS s_qq"))
      .selectExpr("*", priorM, priorV)
      .selectExpr("*", priorAb)
      .select("m", "v", "ab")
    per.crossJoin(broadcast(prior))
      .selectExpr(shrinkOut: _*)
      .orderBy("source")
  }

  val sourceShrinkageOracle: String =
    s"""WITH ${TextAnalysis.gateCtes},
        src AS (SELECT d.source, g.pass FROM documents d
                JOIN gate g ON d.doc_id = g.doc_id),
        per0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(pass) AS BIGINT) AS n_pass
                 FROM src GROUP BY source),
        per AS (SELECT *, ${rateQ(DuckD)} AS q FROM per0),
        pr0 AS (SELECT CAST(count(*) AS BIGINT) AS s_cnt,
                  CAST(sum(q) AS BIGINT) AS s_q,
                  CAST(sum(q * q) AS BIGINT) AS s_qq FROM per),
        pr1 AS (SELECT *, $priorM, $priorV FROM pr0),
        pr AS (SELECT m, v, $priorAb FROM pr1)
        SELECT ${shrinkOut.mkString(", ")}
        FROM per CROSS JOIN pr ORDER BY source"""
}
