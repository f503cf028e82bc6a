package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting (md5 canonical + rolling polynomial hash). Each
  * operator is a per-row codegen'd projection — embarrassingly parallel
  * at any scale — and each ships a DuckDB oracle generated from the
  * same expression builders (Gen).
  */
object TextAnalysis {

  /** Escape a regex for embedding in a SQL string literal: Spark SQL
    * processes backslash escapes inside literals, DuckDB does not. */
  private def re(pattern: String, d: Dialect): String = d match {
    case SparkD => pattern.replace("\\", "\\\\")
    case DuckD  => pattern
  }

  private val stopRe = "\\b(the|and|of|is|to|in|a|for|it|on)\\b"

  // ---- text_stats ----

  private[llm] def statsCols(d: Dialect): Seq[String] = {
    val w = words("text", d)
    Seq(
      "doc_id",
      s"CAST(${arrLen(w, d)} AS INTEGER) AS n_tokens",
      "CAST(length(text) AS INTEGER) AS n_chars",
      s"CAST(${reCount("text", re("[^A-Za-z0-9\\s]", d), d)} AS INTEGER) AS punct_count",
      s"CAST(${reCount("lower(text)", re(stopRe, d), d)} AS INTEGER) AS stopword_count",
      (d match {
        case SparkD => s"CAST(length(regexp_replace(text, '\\\\s+', '')) AS INTEGER)"
        case DuckD  => s"CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS INTEGER)"
      }) + " AS n_chars_no_ws")
  }

  private[llm] val statsDerived: Seq[String] = Seq(
    "*",
    "n_chars_no_ws / n_tokens AS avg_token_len",
    "punct_count / n_chars AS punct_ratio",
    "stopword_count / n_tokens AS stopword_ratio")

  /** Note: the divisor is CAST to DOUBLE because Spark SQL parses the
    * literal `100.0` as DECIMAL(4,1) — int/decimal would be decimal
    * division there but double division in DuckDB (1-ulp divergence). */
  private[llm] val qualityExpr: String =
    "least(n_tokens, 100) / CAST(100 AS DOUBLE) * 0.4 + (1.0 - punct_ratio) * 0.3 " +
      "+ least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality_score"

  /** Unordered stats relation — reused by [[Curation.curatedCorpus]]
    * as a join input, where a total order would be a wasted sort. */
  private[llm] def statsRelation(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(statsCols(SparkD): _*)
      .selectExpr(statsDerived: _*)
      .selectExpr("*", qualityExpr)

  /** DuckDB CTE chain ending in `stats(doc_id, n_tokens, ...columns...,
    * quality_score)` — the oracle twin of [[statsRelation]]. */
  private[llm] def statsCtes: String =
    s"""stats_base AS (SELECT ${statsCols(DuckD).mkString(", ")} FROM documents),
        stats_derived AS (SELECT ${statsDerived.mkString(", ")} FROM stats_base),
        stats AS (SELECT *, $qualityExpr FROM stats_derived)"""

  def textStats(spark: SparkSession, dir: String): DataFrame =
    statsRelation(spark, dir).orderBy("doc_id")

  val textStatsOracle: String =
    s"""WITH base AS (SELECT ${statsCols(DuckD).mkString(", ")} FROM documents),
        derived AS (SELECT ${statsDerived.mkString(", ")} FROM base)
        SELECT *, $qualityExpr FROM derived ORDER BY doc_id"""

  // ---- language ID (n-gram / stopword heuristic) ----

  private[llm] def langScoreCols(d: Dialect): Seq[String] = {
    val low = "lower(text)"
    val cjk = d match {
      case SparkD => "[\\\\u4e00-\\\\u9fff]"
      case DuckD  => "[\\x{4e00}-\\x{9fff}]"
    }
    Seq(
      "doc_id", "lang",
      s"CAST(${reCount(low, re("\\b(the|and|of|is|to|in)\\b", d), d)} AS INTEGER) AS s_en",
      s"CAST(${reCount(low, re("\\b(el|la|los|las|de|que|y)\\b", d), d)} AS INTEGER) AS s_es",
      s"CAST(${reCount(low, re("\\b(le|les|et|des|du|une)\\b", d), d)} AS INTEGER) AS s_fr",
      s"CAST(${reCount(low, re("\\b(der|die|und|das|ein|ist)\\b", d), d)} AS INTEGER) AS s_de",
      s"CAST(${reCount("text", cjk, d)} AS INTEGER) AS s_zh")
  }

  /** Deterministic argmax cascade (fixed preference order on ties). */
  private[llm] val langPredExpr: String =
    """CASE WHEN s_zh >= 3 THEN 'zh'
            WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_fr > s_en AND s_fr >= s_es THEN 'fr'
            WHEN s_es > s_en THEN 'es'
            ELSE 'en' END AS lang_pred"""

  /** Unordered language-ID relation (see [[statsRelation]]). */
  private[llm] def langRelation(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(langScoreCols(SparkD): _*)
      .selectExpr("*", langPredExpr)
      .selectExpr("*", "CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS is_match")

  /** DuckDB CTE chain ending in `lang_t(doc_id, ..., is_match)`. */
  private[llm] def langCtes: String =
    s"""lang_scores AS (SELECT ${langScoreCols(DuckD).mkString(", ")} FROM documents),
        lang_p AS (SELECT *, $langPredExpr FROM lang_scores),
        lang_t AS (SELECT *, CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS is_match
                   FROM lang_p)"""

  def languageId(spark: SparkSession, dir: String): DataFrame =
    langRelation(spark, dir).orderBy("doc_id")

  val languageIdOracle: String =
    s"""WITH scores AS (SELECT ${langScoreCols(DuckD).mkString(", ")} FROM documents),
        pred AS (SELECT *, $langPredExpr FROM scores)
        SELECT *, CASE WHEN lang_pred = lang THEN 1 ELSE 0 END AS is_match
        FROM pred ORDER BY doc_id"""

  /** Language confusion matrix: declared `lang` vs heuristic
    * `lang_pred`, with per-declared-language shares — the corpus-QA
    * report that says WHERE the labeler and detector disagree, not
    * just how often ([[languageId]]'s per-doc is_match flattens that).
    * One hash agg onto the langs×langs grid; the share is an exact
    * integer ratio via a window over that tiny grid. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langRelation(spark, dir)
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") /
        sum(col("n")).over(Window.partitionBy("lang")).cast("double"))
      .orderBy("lang", "lang_pred")
  }

  val langConfusionOracle: String =
    s"""WITH scores AS (SELECT ${langScoreCols(DuckD).mkString(", ")} FROM documents),
        pred AS (SELECT *, $langPredExpr FROM scores),
        g AS (SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2)
        SELECT lang, lang_pred, n,
          n / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS share
        FROM g ORDER BY lang, lang_pred"""

  // ---- chance-corrected classifier agreement (Cohen's kappa) ----

  /** `text_langid_kappa`: Cohen's kappa for the language-ID heuristic
    * against the fixture's true labels — the chance-corrected summary
    * the per-cell [[langConfusion]] matrix doesn't give: raw accuracy
    * flatters any classifier on an imbalanced corpus (predicting the
    * majority language scores high), while κ subtracts the agreement
    * expected from the marginals alone: κ = (p_o − p_e)/(1 − p_e),
    * p_e = Σ_k rowshare_k · colshare_k.
    *
    * Everything before the readout is exact: cell counts, the
    * diagonal sum, and the marginal cross-product Σ row_k·col_k are
    * BIGINT (cross-multiplied so p_e never exists as a float until
    * the one identical-text readout tree). Shape: one hash agg to the
    * ≤25-cell confusion grid, marginals from two grid re-aggs, one
    * broadcast-sized join on the label key — nothing corpus-sized
    * after the first agg. */
  def langIdKappa(spark: SparkSession, dir: String): DataFrame = {
    val cells = langRelation(spark, dir)
      .groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("lang").agg(sum("n").as("row_n"))
    val cols = cells.groupBy("lang_pred").agg(sum("n").as("col_n"))
      .withColumnRenamed("lang_pred", "lang")
    val cross = rows.join(cols, Seq("lang"))
      .agg(sum(expr("row_n * col_n")).as("cross_sum"))
    val diag = cells.filter(col("lang") === col("lang_pred"))
      .agg(coalesce(sum("n"), lit(0L)).as("n_agree"))
    val total = cells.agg(sum("n").as("n_total"))
    diag.crossJoin(broadcast(total)).crossJoin(broadcast(cross))
      .selectExpr("CAST(n_total AS BIGINT) AS n_total",
        "CAST(n_agree AS BIGINT) AS n_agree",
        "CAST(cross_sum AS BIGINT) AS cross_sum",
        "CAST(n_agree AS DOUBLE) / n_total AS p_observed",
        "CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total) AS p_expected",
        """(CAST(n_agree AS DOUBLE) / n_total
            - CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total))
           / (1 - CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total))
           AS kappa""")
  }

  val langIdKappaOracle: String =
    s"""WITH scores AS (SELECT ${langScoreCols(DuckD).mkString(", ")} FROM documents),
        pred AS (SELECT *, $langPredExpr FROM scores),
        cells AS (SELECT lang, lang_pred, count(*) AS n
          FROM pred GROUP BY 1, 2),
        r AS (SELECT lang, sum(n) AS row_n FROM cells GROUP BY lang),
        c AS (SELECT lang_pred AS lang, sum(n) AS col_n
          FROM cells GROUP BY lang_pred),
        x AS (SELECT sum(r.row_n * c.col_n) AS cross_sum
          FROM r JOIN c ON r.lang = c.lang),
        d AS (SELECT coalesce(sum(n), 0) AS n_agree FROM cells
          WHERE lang = lang_pred),
        t AS (SELECT sum(n) AS n_total FROM cells)
        SELECT CAST(n_total AS BIGINT) AS n_total,
          CAST(n_agree AS BIGINT) AS n_agree,
          CAST(cross_sum AS BIGINT) AS cross_sum,
          CAST(n_agree AS DOUBLE) / n_total AS p_observed,
          CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total) AS p_expected,
          (CAST(n_agree AS DOUBLE) / n_total
            - CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total))
           / (1 - CAST(cross_sum AS DOUBLE) / (CAST(n_total AS DOUBLE) * n_total))
           AS kappa
        FROM d, t, x"""

  // ---- repetition (boilerplate / loop detection) ----

  /** Repeated word-3-gram share per document — the standard cheap
    * signal for boilerplate and degenerate generation loops in corpus
    * filtering (a doc whose 3-grams are mostly duplicates is template
    * or repetition, not prose). Per-row projection: the 3-gram
    * multiset never leaves the row. */
  private def repetitionCols(d: Dialect): Seq[String] = Seq(
    "doc_id",
    s"CAST(${arrLen("g", d)} AS INTEGER) AS n_grams",
    s"CAST(${arrLen(arrDistinct("g", d), d)} AS INTEGER) AS n_distinct_grams")

  private val repetitionDerived: Seq[String] = Seq(
    "*",
    "n_grams - n_distinct_grams AS n_repeated",
    "CASE WHEN n_grams > 0 THEN (n_grams - n_distinct_grams) / n_grams " +
      "ELSE CAST(0 AS DOUBLE) END AS repetition_ratio")

  def repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"${let1(words("text", SparkD), "wv", grams3("wv", SparkD))} AS g")
      .selectExpr(repetitionCols(SparkD): _*)
      .selectExpr(repetitionDerived: _*)
      .orderBy("doc_id")

  val repetitionOracle: String =
    s"""WITH g_t AS (SELECT doc_id, ${grams3(words("text", DuckD), DuckD)} AS g FROM documents),
        base AS (SELECT ${repetitionCols(DuckD).mkString(", ")} FROM g_t)
        SELECT ${repetitionDerived.mkString(", ")} FROM base ORDER BY doc_id"""

  // ---- BPE-style pre-tokenization count ----

  /** GPT-2-family pre-tokenizer pattern, lookahead-free so it runs on
    * both Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
    * then space-prefixed letter runs, digit runs, and punctuation
    * runs. Whitespace-only spans match no branch, so the match count
    * is the pre-token count a byte-level BPE would feed its merges.
    * The apostrophe is escaped per SQL dialect (backslash vs doubled
    * quote); backslashes per the [[re]] rule. */
  /** [[LanguageModel.tokenizerCompare]] shares the pre-token regex. */
  private[llm] def bpeReFor(d: Dialect): String = bpeRe(d)

  private def bpeRe(d: Dialect): String = d match {
    case SparkD =>
      "\\'(?:s|t|re|ve|m|ll|d)| ?[\\\\p{L}]+| ?[\\\\p{N}]+| ?[^\\\\s\\\\p{L}\\\\p{N}]+"
    case DuckD =>
      "''(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
  }

  private def bpeCols(d: Dialect): Seq[String] = Seq(
    "doc_id",
    s"CAST(${reCount("text", bpeRe(d), d)} AS INTEGER) AS n_bpe_tokens",
    s"CAST(${arrLen(words("text", d), d)} AS INTEGER) AS n_ws_tokens",
    "CAST(length(text) AS INTEGER) AS n_chars")

  private val bpeDerived: Seq[String] = Seq(
    "*",
    "CASE WHEN n_bpe_tokens > 0 THEN n_chars / n_bpe_tokens " +
      "ELSE CAST(0 AS DOUBLE) END AS chars_per_bpe_token",
    "CASE WHEN n_ws_tokens > 0 THEN n_bpe_tokens / n_ws_tokens " +
      "ELSE CAST(0 AS DOUBLE) END AS bpe_per_ws_token")

  /** Token counting at BPE granularity — the budget unit that matters
    * for context-window packing and training-cost estimates, where
    * whitespace tokens undercount by the punctuation/digit split
    * factor. Per-row codegen'd projection like the rest of the file. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(bpeCols(SparkD): _*)
      .selectExpr(bpeDerived: _*)
      .orderBy("doc_id")

  val bpeTokensOracle: String =
    s"""WITH base AS (SELECT ${bpeCols(DuckD).mkString(", ")} FROM documents)
        SELECT ${bpeDerived.mkString(", ")} FROM base ORDER BY doc_id"""

  // ---- PII pattern scan ----

  private def piiPatterns(d: Dialect): Seq[(String, String)] = Seq(
    "n_emails" -> re("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", d),
    "n_phones" -> re("\\+?[0-9][0-9()\\- ]{7,}[0-9]", d),
    "n_urls" -> re("https?://[^\\s]+", d),
    "n_id_numbers" -> re("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", d))

  private def piiCols(d: Dialect): Seq[String] =
    "doc_id" +: piiPatterns(d).map { case (name, p) =>
      s"CAST(${reCount("text", p, d)} AS INTEGER) AS $name"
    }

  private val piiDerived =
    """CASE WHEN n_emails + n_phones + n_urls + n_id_numbers > 0
       THEN 1 ELSE 0 END AS has_pii"""

  /** PII pattern scan over any relation with (doc_id, text) — the gate
    * every shipped training corpus runs before release: emails,
    * phone-number shapes, URLs, and SSN-shaped ids, counted per
    * document with an aggregate flag. Patterns are boundary-anchored
    * and lookahead-free so the same regex text runs on Java regex and
    * RE2; per-row projection, embarrassingly parallel. Detection
    * behavior on crafted positives/negatives is pinned in `LlmSpec`
    * (the fixture corpus is word-soup, so the oracle parity alone
    * would be a weak all-zeros check). */
  def piiScanDf(df: DataFrame): DataFrame =
    df.selectExpr(piiCols(SparkD): _*).selectExpr("*", piiDerived)

  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanDf(Tables.documents(spark, dir)).orderBy("doc_id")

  val piiScanOracle: String =
    s"""WITH base AS (SELECT ${piiCols(DuckD).mkString(", ")} FROM documents)
        SELECT *, $piiDerived FROM base ORDER BY doc_id"""

  /** Redaction stages, applied in order, specific before general: URL
    * first (an address inside a URL is swallowed by `[URL]`, not
    * double-masked), and SSN-shaped ids BEFORE phones (the digit-dash
    * run also matches the looser phone pattern, and the specific tag
    * is the right one). Fixed stage order is what makes the output
    * deterministic. */
  private val redactStages: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "[URL]",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "[ID]",
    "\\+?[0-9][0-9()\\- ]{7,}[0-9]" -> "[PHONE]")

  private def redactedExpr(d: Dialect): String =
    redactStages.foldLeft("text") { case (acc, (pat, tag)) =>
      d match {
        case SparkD => s"regexp_replace($acc, '${re(pat, d)}', '$tag')"
        case DuckD  => s"regexp_replace($acc, '${re(pat, d)}', '$tag', 'g')"
      }
    }

  /** PII REDACTION — the action [[piiScan]]'s detection gates: mask
    * every email/phone/URL/SSN-shaped span with a typed tag, keeping
    * the surrounding text intact (the release form of a corpus that
    * failed the scan). Same RE2-safe patterns as the scan; a chain of
    * 4 codegen'd regexp_replace stages per row, embarrassingly
    * parallel. The per-doc match counts ride along from the ORIGINAL
    * text so downstream can audit how much was masked. The fixture is
    * word-soup, so `LlmSpec` pins the replacement behavior on crafted
    * positives; the oracle proves cross-engine parity of the chain. */
  def piiRedactDf(df: DataFrame): DataFrame =
    df.selectExpr(Seq("doc_id", s"${redactedExpr(SparkD)} AS text_redacted")
      ++ piiCols(SparkD).tail: _*)

  def piiRedacted(spark: SparkSession, dir: String): DataFrame =
    piiRedactDf(Tables.documents(spark, dir)).orderBy("doc_id")

  val piiRedactedOracle: String =
    s"""SELECT doc_id, ${redactedExpr(DuckD)} AS text_redacted,
          ${piiCols(DuckD).tail.mkString(", ")}
        FROM documents ORDER BY doc_id"""

  // ---- TF-IDF-style keyword extraction ----

  private val topTermsK = 5

  /** Top-k characteristic terms per document, scored tf/df — the
    * rational-arithmetic stand-in for tf·idf (same ranking as
    * tf·(N/df) for a fixed corpus, since N is constant per run):
    * log() is avoided deliberately because libm rounding may differ
    * between engines, while a single int/int division is
    * correctly-rounded IEEE on both. Ties break on the term itself, so
    * the top-k set is total-order deterministic.
    *
    * Plan shape: explode → two hash aggregations (per-doc term counts;
    * per-term document frequency) → shuffle equi-join on term → per-doc
    * top-k window. The df relation is vocabulary-sized; at 100 TB both
    * aggregations are map-side-combined and the join is a plain
    * shuffle join on the term key. */
  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    tf.join(df, Seq("term"))
      .selectExpr("doc_id", "term", "tf", "df", "tf / df AS score")
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= topTermsK)
      .select("doc_id", "term", "tf", "df", "score", "term_rank")
      .orderBy("doc_id", "term_rank")
  }

  val topTermsOracle: String =
    s"""WITH toks AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS term
                      FROM documents),
        tf_t AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
        scored AS (SELECT tf_t.doc_id, tf_t.term, tf, df, tf / df AS score
                   FROM tf_t JOIN df_t ON tf_t.term = df_t.term)
        SELECT doc_id, term, tf, df, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS term_rank
        FROM scored
        QUALIFY term_rank <= $topTermsK
        ORDER BY doc_id, term_rank"""

  // ---- global vocabulary ----

  private val vocabK = 100

  /** Corpus-level vocabulary build — the step that feeds tokenizer
    * training and embedding vocab selection: per-term total frequency
    * and document frequency, top-[[vocabK]] by tf. The top-k is
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps, no
    * global sort — the term-stats relation is vocabulary-sized but
    * still worth not sorting at 100 TB); the rank column is a window
    * over the already-top-k rows, which is k rows on one task by
    * construction. */
  def vocabulary(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
    toks.groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("tf"), asc("term"))
      .limit(vocabK)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("tf"), asc("term"))))
      .select("rank", "term", "tf", "df")
      .orderBy("rank")
  }

  val vocabularyOracle: String =
    s"""WITH toks AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS term
                      FROM documents),
        v AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
              FROM toks GROUP BY term),
        top AS (SELECT * FROM v ORDER BY tf DESC, term LIMIT $vocabK)
        SELECT row_number() OVER (ORDER BY tf DESC, term) AS rank,
               term, tf, df
        FROM top ORDER BY rank"""

  // ---- vocabulary OOV rate ----

  /** Top-k cut for the OOV check — deliberately smaller than
    * [[vocabK]] so roughly half the fixture vocabulary is
    * out-of-vocabulary and the rates carry signal. */
  private val oovVocabK = 15

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-[[oovVocabK]] terms — the coverage number a tokenizer/vocab
    * choice is judged by before training. Plan shape: the vocab is a
    * k-row relation (TakeOrderedAndProject, no global sort) broadcast
    * against the exploded token stream; one per-doc hash agg after.
    * At 100 TB the token explode dominates and is map-side combined
    * into the doc-keyed agg — the scan's partitioning carries it. */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(desc("tf"), asc("term")).limit(oovVocabK)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0))
          .cast("long").as("n_oov"))
      .selectExpr("doc_id", "n_tokens", "n_oov",
        "n_oov / CAST(n_tokens AS DOUBLE) AS oov_rate")
      .orderBy("doc_id")
  }

  val oovRateOracle: String =
    s"""WITH toks AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS term
                      FROM documents),
        v AS (SELECT term FROM (SELECT term, count(*) AS tf FROM toks GROUP BY term)
              ORDER BY tf DESC, term LIMIT $oovVocabK),
        j AS (SELECT t.doc_id,
                CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
              FROM toks t LEFT JOIN v ON t.term = v.term),
        g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(oov) AS BIGINT) AS n_oov FROM j GROUP BY doc_id)
        SELECT doc_id, n_tokens, n_oov,
          n_oov / CAST(n_tokens AS DOUBLE) AS oov_rate
        FROM g ORDER BY doc_id"""

  // ---- benchmark decontamination ----

  /** Eval-set membership rule: every ~97th doc stands in for a held-out
    * benchmark (deterministic, so the oracle sees the same split). */
  private[llm] val evalMod = 97
  private[llm] val evalRem = 3
  private[llm] val contamMinShared = 2

  /** Benchmark decontamination — the check every training corpus runs
    * before release: training docs sharing >= [[contamMinShared]]
    * distinct word-3-grams with any eval doc are flagged, with the
    * worst-overlap eval doc reported. Candidates come from an equi-join
    * on the exploded DISTINCT 3-grams (eval side broadcast — the eval
    * set is benchmark-sized, not corpus-sized), so cost is one corpus
    * scan + a gram-keyed join, never corpus × eval. Common-phrase grams
    * fan out only on the tiny eval side. */
  /** The (train doc, eval doc, shared-gram count) relation both
    * [[contamination]] and [[Curation.qualityFunnel]] consume. */
  private[llm] def contamShared(spark: SparkSession, dir: String): DataFrame = {
    def grams(docs: DataFrame, idCol: String) = docs
      .selectExpr(s"doc_id AS $idCol",
        s"${let1(words("lower(text)", SparkD), "wv",
          arrDistinct(grams3("wv", SparkD), SparkD))} AS g")
      .select(col(idCol), explode(col("g")).as("gram"))
    val docs = Tables.documents(spark, dir)
    val evalGrams = grams(docs.filter(col("doc_id") % evalMod === evalRem), "eval_doc")
    val trainGrams = grams(docs.filter(col("doc_id") % evalMod =!= evalRem), "doc_id")
    trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id", "eval_doc")
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= contamMinShared)
  }

  /** DuckDB CTE chain ending in `contam_shared(doc_id, eval_doc,
    * n_shared_grams)` — the oracle twin of [[contamShared]]. */
  private[llm] def contamSharedCtes: String =
    s"""eg AS (SELECT doc_id AS eval_doc,
            unnest(${arrDistinct(grams3(words("lower(text)", DuckD), DuckD), DuckD)}) AS gram
          FROM documents WHERE doc_id % $evalMod = $evalRem),
        tg AS (SELECT doc_id,
            unnest(${arrDistinct(grams3(words("lower(text)", DuckD), DuckD), DuckD)}) AS gram
          FROM documents WHERE doc_id % $evalMod <> $evalRem),
        contam_shared AS (SELECT t.doc_id, e.eval_doc, count(*) AS n_shared_grams
                   FROM tg t JOIN eg e ON t.gram = e.gram
                   GROUP BY t.doc_id, e.eval_doc
                   HAVING count(*) >= $contamMinShared)"""

  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("n_shared_grams"), asc("eval_doc"))
    contamShared(spark, dir)
      .withColumn("n_eval_matches", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .selectExpr("doc_id", "CAST(n_eval_matches AS BIGINT) AS n_eval_matches",
        "eval_doc AS worst_eval_doc", "n_shared_grams")
      .orderBy("doc_id")
  }

  val contaminationOracle: String =
    s"""WITH $contamSharedCtes
        SELECT doc_id,
          CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_eval_matches,
          eval_doc AS worst_eval_doc, n_shared_grams
        FROM contam_shared
        QUALIFY row_number() OVER (PARTITION BY doc_id
          ORDER BY n_shared_grams DESC, eval_doc) = 1
        ORDER BY doc_id"""

  // ---- term frequency spectrum (frequency of frequencies) ----

  /** The Zipf diagnostic behind vocabulary sizing: how many distinct
    * terms appear in exactly `df` documents. Two map-side-combined
    * hash aggs back to back (term → df, then df → n_terms) — the
    * second agg's input is already vocabulary-sized, so the heavy
    * shuffle is the first one, keyed by term (the same key shape
    * [[vocabulary]] shuffles on). */
  def termSpectrum(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(
        s"explode(${arrDistinct(words("lower(text)", SparkD), SparkD)}) AS term")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("n_terms"))
      .orderBy("df")

  val termSpectrumOracle: String =
    s"""WITH t AS (SELECT doc_id,
            unnest(${arrDistinct(words("lower(text)", DuckD), DuckD)}) AS term
          FROM documents),
        d AS (SELECT term, count(*) AS df FROM t GROUP BY term)
        SELECT df, count(*) AS n_terms FROM d GROUP BY df ORDER BY df"""

  // ---- per-language length quantiles ----

  /** Token-count quartiles per language — the length-distribution
    * diagnostic a curation run reads before picking truncation and
    * packing parameters. Interpolated percentile over INTEGER token
    * counts, the same cross-engine-exact pairing
    * (percentile ↔ quantile_cont) the category-quartiles query pins.
    * Exact percentile is a per-group sort by design; the scaladoc
    * trade at 100 TB is approx_percentile, as documented there. */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .selectExpr("lang",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS INTEGER) AS n_tokens")
      .groupBy("lang")
      .agg(expr("percentile(n_tokens, 0.25)").as("q1"),
        expr("percentile(n_tokens, 0.5)").as("median"),
        expr("percentile(n_tokens, 0.75)").as("q3"),
        count(lit(1)).as("n_docs"))
      .orderBy("lang")
  }

  val lengthQuantilesOracle: String =
    s"""WITH t AS (SELECT lang,
            CAST(${arrLen(words("text", DuckD), DuckD)} AS INTEGER) AS n_tokens
          FROM documents)
        SELECT lang, quantile_cont(n_tokens, 0.25) AS q1,
          quantile_cont(n_tokens, 0.5) AS median,
          quantile_cont(n_tokens, 0.75) AS q3,
          count(*) AS n_docs
        FROM t GROUP BY lang ORDER BY lang"""

  // ---- sparse TF-IDF similarity pairs ----

  private val tfidfDfMax = 20
  private val tfidfQ = 10000
  private val tfidfThreshold = 0.5

  /** Weighted sparse-vector similarity via an inverted index: documents
    * as TF-IDF-weighted bags of word-3-gram features, pairwise cosine
    * computed through a term-keyed self-join — the classic sparse
    * complement to the dense embedding tiers in
    * [[graft.llm.Similarity]]. Document frequency gates the index two
    * ways: df=1 terms cannot produce a pair (dropped), and
    * df > [[tfidfDfMax]] stop-features are pruned — the lever that
    * bounds the self-join's cost at Σ df² ≤ |terms|·cap² regardless of
    * corpus size (unbounded df is the classic way a sparse self-join
    * detonates at scale). Weights tf/df are quantized to integers, so
    * every aggregate (norms, dots) is an order-independent BIGINT sum —
    * bit-stable under any partitioning — and the final cosine is one
    * fixed double expression tree over those exact integers, identical
    * in both engines. Plan shape: token hash aggs (map-side combined),
    * one term-keyed equi-join with bounded occupancy, then two
    * broadcast-sized norm joins. */
  /** The TF-IDF weights relation (doc_id, term, wq), staged-zone
    * cached: when the PlanCache side-table is enabled (bench/report
    * sessions) the weights are WRITTEN ONCE to a parquet side-table
    * and read back by all three consumers (norms + both join sides) —
    * the reference's own staged-zone pattern (write processed, read
    * thrice; cf. 01:96-101) and the right 100 TB shape for a
    * many-consumer expensive relation. Parquet (unlike an
    * InMemoryRelation, which hides size stats and was measured 2×
    * slower here) carries real file statistics, so the planner still
    * broadcasts the tiny df/norm relations off it. Verify runs with
    * the cache off and measures the cold recompute path — same
    * semantics either way. */
  private[llm] def tfidfWeights(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.sideTable(spark, "tfidf_wts", dir) {
      // direct grams3(words), NOT let1: the words array has exactly ONE
      // consumer here (the generator input, evaluated once per row), so
      // the let1 binding would only add nested-lambda interpretation
      // overhead — measured 3.4s vs 1.0s for this stream at sf0.1. let1
      // pays off when the array is referenced MULTIPLE times in one
      // projection (repetition, contamination), not in a single-use
      // generator.
      val grams = Tables.documents(spark, dir)
        .selectExpr("doc_id",
          s"explode(${grams3(words("lower(text)", SparkD), SparkD)}) AS term")
      val tf = grams.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, tfidfDfMax))
      tf.join(df, Seq("term"))
        .selectExpr("doc_id", "term",
          s"CAST(round($tfidfQ * (tf / df)) AS BIGINT) AS wq")
    }

  /** All co-term pairs with quantized dot product and cosine — the
    * UNTHRESHOLDED similarity relation [[tfidfPairs]] filters and
    * [[tfidfTopK]] caps. Side-table cached so the two consumers share
    * one inverted-index self-join per bench session. */
  private[graft] def tfidfSims(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.sideTable(spark, "tfidf_sims", dir) {
      val wts = tfidfWeights(spark, dir)
      val norms = wts.groupBy("doc_id").agg(sum(col("wq") * col("wq")).as("n2"))
      val dots = wts.as("a").join(wts.as("b"), Seq("term"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(sum(col("a.wq") * col("b.wq")).as("dot_q"))
      dots
        .join(norms.selectExpr("doc_id AS doc_a", "n2 AS na2"), Seq("doc_a"))
        .join(norms.selectExpr("doc_id AS doc_b", "n2 AS nb2"), Seq("doc_b"))
        .selectExpr("doc_a", "doc_b", "CAST(dot_q AS BIGINT) AS dot_q",
          "CAST(dot_q AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cos_sim")
    }

  def tfidfPairs(spark: SparkSession, dir: String): DataFrame =
    tfidfSims(spark, dir)
      .filter(col("cos_sim") >= tfidfThreshold)
      .orderBy("doc_a", "doc_b")

  private val tfidfTopK = 3

  /** Output-bounded variant of [[tfidfPairs]]: each document's
    * [[tfidfTopK]] most-similar partners (no threshold) — on a
    * boilerplate corpus the thresholded pair set grows
    * near-quadratically with self-similarity, while the per-doc cap
    * bounds the output at k·|docs| regardless. One doc-partitioned
    * window over the symmetrized similarity relation: shuffle by doc,
    * per-doc sort of that doc's candidate partners (bounded by its
    * co-term neighborhood), never global. */
  def tfidfTopKPartners(spark: SparkSession, dir: String): DataFrame = {
    val sims = tfidfSims(spark, dir)
    val sym = sims.selectExpr("doc_a AS doc_id", "doc_b AS partner_id",
        "dot_q", "cos_sim")
      .unionByName(sims.selectExpr("doc_b AS doc_id", "doc_a AS partner_id",
        "dot_q", "cos_sim"))
    sym.withColumn("rank", expr(
        "row_number() OVER (PARTITION BY doc_id " +
          "ORDER BY cos_sim DESC, partner_id)"))
      .filter(col("rank") <= tfidfTopK)
      .selectExpr("doc_id", "partner_id", "dot_q", "cos_sim",
        "CAST(rank AS INTEGER) AS rank")
      .orderBy("doc_id", "rank")
  }

  /** Shared CTE prefix up to the unthresholded similarity relation
    * `s` (mirrors [[tfidfSims]]). */
  private[llm] def tfidfCtes: String =
    s"""w AS (SELECT doc_id, ${words("lower(text)", DuckD)} AS wv FROM documents),
        g AS (SELECT doc_id, unnest(${grams3("wv", DuckD)}) AS term FROM w),
        tf_t AS (SELECT doc_id, term, count(*) AS tf FROM g GROUP BY 1, 2),
        df_t AS (SELECT term, count(*) AS df FROM tf_t
                 GROUP BY 1 HAVING count(*) BETWEEN 2 AND $tfidfDfMax),
        wt AS (SELECT tf_t.doc_id, tf_t.term,
                 CAST(round($tfidfQ * (tf / df)) AS BIGINT) AS wq
               FROM tf_t JOIN df_t ON tf_t.term = df_t.term),
        nrm AS (SELECT doc_id, CAST(sum(wq * wq) AS BIGINT) AS n2
                FROM wt GROUP BY 1),
        dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(sum(a.wq * b.wq) AS BIGINT) AS dot_q
               FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
        s AS (SELECT doc_a, doc_b, dot_q,
                CAST(dot_q AS DOUBLE) /
                  (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
              FROM dt JOIN nrm na ON dt.doc_a = na.doc_id
                JOIN nrm nb ON dt.doc_b = nb.doc_id)"""

  val tfidfPairsOracle: String =
    s"""WITH $tfidfCtes
        SELECT doc_a, doc_b, dot_q, cos_sim FROM s
        WHERE cos_sim >= $tfidfThreshold ORDER BY doc_a, doc_b"""

  val tfidfTopKOracle: String =
    s"""WITH $tfidfCtes,
        sym AS (
          SELECT doc_a AS doc_id, doc_b AS partner_id, dot_q, cos_sim FROM s
          UNION ALL
          SELECT doc_b AS doc_id, doc_a AS partner_id, dot_q, cos_sim FROM s),
        rk_t AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY cos_sim DESC, partner_id) AS rank
          FROM sym)
        SELECT doc_id, partner_id, dot_q, cos_sim,
          CAST(rank AS INTEGER) AS rank
        FROM rk_t WHERE rank <= $tfidfTopK
        ORDER BY doc_id, rank"""

  // ---- fingerprints ----

  private def normExpr(d: Dialect): String = d match {
    case SparkD => "lower(regexp_replace(text, '\\\\s+', ' '))"
    case DuckD  => "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
  }

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(
        "doc_id",
        s"md5(${normExpr(SparkD)}) AS fp_md5",
        s"${rollingFingerprint(words("text", SparkD), SparkD)} AS fp_rolling")
      .orderBy("doc_id")

  val fingerprintsOracle: String =
    s"""SELECT doc_id, md5(${normExpr(DuckD)}) AS fp_md5,
        ${rollingFingerprint(words("text", DuckD), DuckD)} AS fp_rolling
        FROM documents ORDER BY doc_id"""

  // ---- canonical text normalization (NFC + casefold + ws collapse) ----

  /** Non-ASCII side corpus unioned into [[normalized]]: the fixture
    * documents are pure ASCII, for which NFC is an identity — oracle
    * parity over the fixture alone would never exercise composition.
    * These rows carry genuinely decomposed sequences (combining acute/
    * ring/diaeresis, Hangul jamo) plus composed and ASCII controls, so
    * the DuckDB `nfc_normalize` comparison checks real composition
    * behavior, not a no-op. Doc ids are negative — fixture ids are
    * non-negative at every SF, so no collision. Unicode content is
    * written as Scala escapes (never raw decomposed chars in source —
    * tooling could silently re-normalize the file). Only ASCII
    * whitespace: Java and RE2 both scope regex \s to ASCII. */
  private[llm] val sideDocs: Seq[(Long, String)] = Seq(
    (-1L, "Cafe\u0301  du  Monde"), // decomposed e + U+0301, runs of spaces
    (-2L, "Caf\u00e9 du Monde"), // composed NFC form of the same text
    (-3L, "\u1100\u1161\u11a8 jamo composes"), // Hangul jamo -> U+AC01
    (-4L, " A\u030a ngstro\u0308m edge "), // ring/diaeresis + edge trim
    (-5L, "PLAIN ASCII stays put"))

  private def sideDocsValues: String =
    sideDocs.map { case (id, t) =>
      s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')"
    }.mkString(", ")

  /** The canonicalization pass that fronts hashing/dedup in a training
    * corpus: Unicode NFC composition (via the native codegen
    * [[graft.functions.NfcNormalize]] — Spark has no built-in),
    * lowercasing, whitespace collapse, and edge trim, with a changed
    * flag and the resulting length. Per-row projection; the NFC tier
    * fast-paths already-normalized (e.g. pure-ASCII) rows without
    * reallocating, so on clean corpora the pass costs one scan. The
    * [[sideDocs]] union makes the oracle comparison exercise real
    * composition; codegen/interpreted parity is pinned in
    * `NativeFunctionSpec`. */
  def normalized(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    val side = spark.createDataFrame(sideDocs).toDF("doc_id", "text")
    Tables.documents(spark, dir).select("doc_id", "text")
      .unionByName(side)
      .selectExpr("doc_id", "text",
        "trim(regexp_replace(graft_nfc(lower(text)), '\\\\s+', ' ')) AS norm_text")
      .selectExpr("doc_id", "norm_text",
        "CAST(length(norm_text) AS INTEGER) AS n_chars_norm",
        "CASE WHEN norm_text = text THEN 0 ELSE 1 END AS changed")
      .orderBy("doc_id")
  }

  def normalizedOracle: String =
    s"""WITH docs AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id, text FROM (VALUES $sideDocsValues) v(doc_id, text)),
       n_t AS (SELECT doc_id, text,
         trim(regexp_replace(nfc_normalize(lower(text)), '\\s+', ' ', 'g')) AS norm_text
       FROM docs)
       SELECT doc_id, norm_text,
         CAST(length(norm_text) AS INTEGER) AS n_chars_norm,
         CASE WHEN norm_text = text THEN 0 ELSE 1 END AS changed
       FROM n_t ORDER BY doc_id"""

  // ---- hashed linear classifier inference ----

  private val clsBuckets = 4096

  /** Per-token hashed-feature weight array: token → md5 → 32-bit
    * bucket → signed integer weight. The weight table is a
    * deterministic surrogate (a multiplicative scramble of the bucket
    * id into [-500, 500]) standing in for trained coefficients — the
    * container has no model artifacts, and what this operator pins is
    * the SERVING shape: hash → weight lookup → sum. With a real model
    * the weight expression becomes an equi-join (or broadcast map)
    * against a 2^b-row coefficient relation; everything else is
    * unchanged. */
  private def clsWeightArr(d: Dialect): String = {
    val md5s = d match {
      case SparkD => s"transform(wv, w -> md5(w))"
      case DuckD  => s"list_transform(wv, w -> md5(w))"
    }
    val bucket = s"${hexPrefix32("h")} % $clsBuckets"
    val wexpr = s"CAST(($bucket) * 2654435761 % 1001 - 500 AS BIGINT)"
    d match {
      case SparkD => s"transform($md5s, h -> $wexpr)"
      case DuckD  => s"list_transform($md5s, h -> $wexpr)"
    }
  }

  private def clsSum(arr: String, d: Dialect): String = d match {
    case SparkD => s"aggregate($arr, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    case DuckD  => s"list_reduce(list_prepend(CAST(0 AS BIGINT), $arr), " +
      "(acc, x) -> acc + x)"
  }

  /** Linear text-classifier INFERENCE at corpus scale (the
    * fastText-style quality/toxicity filter shape): every token hashes
    * into one of 2^12 feature buckets, each bucket carries a signed
    * weight, the document score is the exact BIGINT sum of its tokens'
    * weights (tf-weighted because occurrences sum), and the verdict is
    * the score's sign. The whole operator is a per-row codegen'd
    * projection — ZERO shuffles, no UDF, embarrassingly parallel at
    * any corpus size; model scoring rides the scan. Integer weights
    * keep the score order-independent and hash-exact cross-engine
    * (float dot products would be association-ordered). */
  def hashedClassifier(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"${let1(words("lower(text)", SparkD), "wv",
          s"named_struct('n', size(wv), 's', ${clsSum(clsWeightArr(SparkD), SparkD)})")} AS r")
      .selectExpr("doc_id",
        "CAST(r.n AS INTEGER) AS n_feats",
        "r.s AS score",
        "CASE WHEN r.s >= 0 THEN 1 ELSE 0 END AS keep_flag")
      .orderBy("doc_id")

  /** DuckDB CTE chain ending in `cls_s(doc_id, n, s)` — the classifier
    * score relation, shared by the inference oracle and the two
    * evaluation oracles below. */
  private def clsCtes: String =
    s"""cls_w AS (SELECT doc_id, ${words("lower(text)", DuckD)} AS wv
                  FROM documents),
        cls_s AS (SELECT doc_id, len(wv) AS n,
                    ${clsSum(clsWeightArr(DuckD), DuckD)} AS s
                  FROM cls_w)"""

  val hashedClassifierOracle: String =
    s"""WITH $clsCtes
        SELECT doc_id, CAST(n AS INTEGER) AS n_feats, s AS score,
          CASE WHEN s >= 0 THEN 1 ELSE 0 END AS keep_flag
        FROM cls_s ORDER BY doc_id"""

  // ---- classifier evaluation: ROC-AUC + reliability deciles ----

  /** ROC-AUC of the hashed-classifier score against the rule-based
    * quality gate — the eval every filtering classifier gets before it
    * touches the corpus (does the cheap hashed model rank documents
    * the way the expensive rule battery labels them?). AUC is computed
    * through the rank-sum identity AUC = U₁/(n₁·n₂) with midrank tie
    * handling — the same doubled-rank exactness discipline as the
    * Mann-Whitney battery ([[graft.sql.Analytics]]): scores collapse
    * to the DISTINCT-VALUE grain first (map-side-combined agg), the
    * rank prefix-scan runs over the score domain (bounded by the
    * weight-sum range, not the corpus), and U₁ is an exact BIGINT on
    * both engines; only the final AUC ratio is a double, in one shared
    * IEEE tree. */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = hashedClassifier(spark, dir).select("doc_id", "score")
    val lab = gateRelation(spark, dir).select(col("doc_id"), col("pass"))
    val byV = scored.join(lab, Seq("doc_id"))
      .groupBy("score")
      .agg(sum("pass").as("cnt1"), count(lit(1)).as("cnt"))
    val wPrev = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    byV.withColumn("cnt_less", coalesce(sum("cnt").over(wPrev), lit(0L)))
      .agg(sum("cnt1").as("n_pos"),
        sum(expr("cnt - cnt1")).as("n_neg"),
        sum(expr("cnt1 * (2 * cnt_less + cnt + 1)")).as("r1_doubled"))
      .selectExpr("n_pos", "n_neg",
        "r1_doubled - n_pos * (n_pos + 1) AS u1_doubled")
      .selectExpr("n_pos", "n_neg", "u1_doubled",
        "CAST(u1_doubled AS DOUBLE) / 2 / (CAST(n_pos AS DOUBLE) * n_neg) AS auc")
  }

  lazy val classifierAucOracle: String =
    s"""WITH $gateCtes, $clsCtes,
        j AS (SELECT c.doc_id, c.s AS score, g.pass
              FROM cls_s c JOIN gate g ON c.doc_id = g.doc_id),
        byv AS (SELECT score, CAST(sum(pass) AS BIGINT) AS cnt1,
                  count(*) AS cnt
                FROM j GROUP BY score),
        rk AS (SELECT *, CAST(coalesce(sum(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cnt_less
               FROM byv),
        a AS (SELECT CAST(sum(cnt1) AS BIGINT) AS n_pos,
                CAST(sum(cnt - cnt1) AS BIGINT) AS n_neg,
                CAST(sum(cnt1 * (2 * cnt_less + cnt + 1)) AS BIGINT) AS r1_doubled
              FROM rk),
        u AS (SELECT n_pos, n_neg,
                r1_doubled - n_pos * (n_pos + 1) AS u1_doubled
              FROM a)
        SELECT n_pos, n_neg, u1_doubled,
          CAST(u1_doubled AS DOUBLE) / 2 / (CAST(n_pos AS DOUBLE) * n_neg) AS auc
        FROM u"""

  /** Reliability (calibration) table for the hashed classifier: docs
    * are ranked by score and cut into ten ntile bins; each bin reports
    * its gate-pass rate and score range — the pre-Platt-scaling
    * readout that says WHERE on the score axis the classifier is
    * trustworthy (a monotone pass-rate column calibrates; a flat or
    * non-monotone one says the score is noise at that range). Window
    * input is one row per document with all heavy text work collapsed
    * to (score, pass) first — same shape and justification as the
    * user-decile report; at 100 TB you'd bucket by a hashed score
    * range first (the winsorized two-phase scan), but the per-doc
    * projection is where the volume dies. */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = hashedClassifier(spark, dir).select("doc_id", "score")
    val lab = gateRelation(spark, dir).select(col("doc_id"), col("pass"))
    val w = Window.orderBy(asc("score"), asc("doc_id"))
    scored.join(lab, Seq("doc_id"))
      .withColumn("bin", ntile(10).over(w))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("pass").as("n_pass"),
        min("score").as("min_score"), max("score").as("max_score"))
      .selectExpr("bin", "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_pass AS BIGINT) AS n_pass", "min_score", "max_score",
        "CAST(n_pass AS DOUBLE) / n_docs AS pass_rate")
      .orderBy("bin")
  }

  lazy val classifierCalibrationOracle: String =
    s"""WITH $gateCtes, $clsCtes,
        j AS (SELECT c.doc_id, c.s AS score, g.pass
              FROM cls_s c JOIN gate g ON c.doc_id = g.doc_id),
        t AS (SELECT *, ntile(10) OVER (ORDER BY score, doc_id) AS bin
              FROM j),
        g2 AS (SELECT bin, count(*) AS n_docs,
                 CAST(sum(pass) AS BIGINT) AS n_pass,
                 min(score) AS min_score, max(score) AS max_score
               FROM t GROUP BY bin)
        SELECT bin, CAST(n_docs AS BIGINT) AS n_docs, n_pass,
          min_score, max_score,
          CAST(n_pass AS DOUBLE) / n_docs AS pass_rate
        FROM g2 ORDER BY bin"""

  /** Lift and cumulative-gains table — the SELECTION view of the same
    * classifier the calibration table judges pointwise: rank documents
    * by score DESCENDING (best first, the order a filtering pipeline
    * consumes them), cut into ten ntile bins, and report per bin the
    * pass rate, the lift over the base rate, and the cumulative recall
    * of gate-passing documents. "Top 30 % of scores captures 45 % of
    * the good documents at 1.5× lift" is the sentence that decides a
    * keep-threshold; AUC alone can't say it. Same one-row-per-doc
    * window discipline as the calibration table; every measure is a
    * ratio of exact BIGINTs. */
  def classifierLiftGains(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = hashedClassifier(spark, dir).select("doc_id", "score")
    val lab = gateRelation(spark, dir).select(col("doc_id"), col("pass"))
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    val bins = scored.join(lab, Seq("doc_id"))
      .withColumn("bin", ntile(10).over(w))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("pass").as("n_pass"))
      .selectExpr("bin", "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_pass AS BIGINT) AS n_pass")
    val tot = bins.agg(
      expr("CAST(sum(n_docs) AS BIGINT) AS t_docs"),
      expr("CAST(sum(n_pass) AS BIGINT) AS t_pass"))
    bins.crossJoin(broadcast(tot))
      .selectExpr("bin", "n_docs", "n_pass",
        """CAST(sum(n_pass) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_pass""",
        "t_docs", "t_pass")
      .selectExpr("bin", "n_docs", "n_pass", "cum_pass",
        "CAST(n_pass AS DOUBLE) / n_docs AS pass_rate",
        "(CAST(n_pass AS DOUBLE) * t_docs) / (CAST(n_docs AS DOUBLE) * t_pass) AS lift",
        "CAST(cum_pass AS DOUBLE) / t_pass AS cum_recall")
      .orderBy("bin")
  }

  lazy val classifierLiftGainsOracle: String =
    s"""WITH $gateCtes, $clsCtes,
        j AS (SELECT c.doc_id, c.s AS score, g.pass
              FROM cls_s c JOIN gate g ON c.doc_id = g.doc_id),
        t AS (SELECT *, ntile(10) OVER (ORDER BY score DESC, doc_id) AS bin
              FROM j),
        b AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(pass) AS BIGINT) AS n_pass
              FROM t GROUP BY bin),
        tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
                 CAST(sum(n_pass) AS BIGINT) AS t_pass FROM b),
        c AS (SELECT CAST(bin AS INT) AS bin, n_docs, n_pass,
                CAST(sum(n_pass) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pass, t_docs, t_pass
              FROM b CROSS JOIN tt)
        SELECT bin, n_docs, n_pass, cum_pass,
          CAST(n_pass AS DOUBLE) / n_docs AS pass_rate,
          (CAST(n_pass AS DOUBLE) * t_docs) / (CAST(n_docs AS DOUBLE) * t_pass) AS lift,
          CAST(cum_pass AS DOUBLE) / t_pass AS cum_recall
        FROM c ORDER BY bin"""

  /** Optimal keep-threshold for the hashed classifier by Youden's J
    * (sensitivity + specificity − 1), the point on the ROC curve
    * farthest from chance — the threshold a one-number policy keeps.
    * The sweep runs on the DISTINCT-score grain (cumulative counts of
    * positives/negatives at-or-above each score), and the argmax is
    * EXACT: maximizing J = tp/n_pos − fp/n_neg over thresholds equals
    * maximizing the BIGINT tp·n_neg − fp·n_pos (common positive
    * denominator), so no float ever enters the comparison — ties
    * break to the highest threshold (keep less). One row out: the
    * chosen threshold with its exact confusion counts and the float
    * readouts computed once at the end. */
  def classifierOptimalThreshold(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = hashedClassifier(spark, dir).select("doc_id", "score")
    val lab = gateRelation(spark, dir).select(col("doc_id"), col("pass"))
    val byV = scored.join(lab, Seq("doc_id"))
      .groupBy("score")
      .agg(sum("pass").as("cnt1"), count(lit(1)).as("cnt"))
    byV
      .withColumn("tp", expr("CAST(sum(cnt1) OVER (ORDER BY score DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"))
      .withColumn("keep_n", expr("CAST(sum(cnt) OVER (ORDER BY score DESC " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"))
      .withColumn("n_pos", expr("CAST(sum(cnt1) OVER () AS BIGINT)"))
      .withColumn("n_all", expr("CAST(sum(cnt) OVER () AS BIGINT)"))
      .selectExpr("score AS threshold", "tp", "keep_n - tp AS fp",
        "n_pos", "n_all - n_pos AS n_neg")
      .selectExpr("*", "tp * n_neg - fp * n_pos AS j_num")
      .orderBy(desc("j_num"), desc("threshold"))
      .limit(1)
      .selectExpr("threshold", "tp", "fp", "n_pos", "n_neg", "j_num",
        "CAST(tp AS DOUBLE) / n_pos AS tpr",
        "CAST(fp AS DOUBLE) / n_neg AS fpr",
        "CAST(tp AS DOUBLE) / n_pos - CAST(fp AS DOUBLE) / n_neg AS youden_j")
  }

  lazy val classifierOptimalThresholdOracle: String =
    s"""WITH $gateCtes, $clsCtes,
        j AS (SELECT c.doc_id, c.s AS score, g.pass
              FROM cls_s c JOIN gate g ON c.doc_id = g.doc_id),
        byv AS (SELECT score, CAST(sum(pass) AS BIGINT) AS cnt1,
                  CAST(count(*) AS BIGINT) AS cnt
                FROM j GROUP BY score),
        cum AS (SELECT score,
            CAST(sum(cnt1) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
            CAST(sum(cnt) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS keep_n,
            CAST(sum(cnt1) OVER () AS BIGINT) AS n_pos,
            CAST(sum(cnt) OVER () AS BIGINT) AS n_all
          FROM byv),
        sweep AS (SELECT score AS threshold, tp, keep_n - tp AS fp,
            n_pos, n_all - n_pos AS n_neg
          FROM cum),
        best AS (SELECT *, tp * n_neg - fp * n_pos AS j_num FROM sweep
          ORDER BY j_num DESC, threshold DESC LIMIT 1)
        SELECT threshold, tp, fp, n_pos, n_neg, j_num,
          CAST(tp AS DOUBLE) / n_pos AS tpr,
          CAST(fp AS DOUBLE) / n_neg AS fpr,
          CAST(tp AS DOUBLE) / n_pos - CAST(fp AS DOUBLE) / n_neg AS youden_j
        FROM best"""

  /** Kendall's τ-b between document quality score and length, computed
    * on the 10×10 DECILE GRID (Agresti 2010 §7; the grouped-data form
    * of the rank correlation): each doc lands in a (quality decile,
    * length decile) cell, concordant/discordant pair counts come from
    * one 100×100 cell-pair comparison — never a doc-pair product —
    * and the tie corrections use the grid's row/column marginals.
    * τ-b complements the existing Spearman: Spearman squares rank
    * gaps, τ counts inversions, and on coarsened (tied-heavy) data
    * τ-b's tie handling is the principled one. C, D, and the three
    * tie sums are exact BIGINTs; τ-b itself is the single float at
    * the end (one sqrt). Decile assignment uses ntile with a doc_id
    * tiebreak so the grid is deterministic. */
  def qualityLengthKendall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = statsRelation(spark, dir)
      .select(col("doc_id"), col("quality_score"), col("n_chars"))
      .withColumn("qi", ntile(10).over(
        Window.orderBy(asc("quality_score"), asc("doc_id"))))
      .withColumn("li", ntile(10).over(
        Window.orderBy(asc("n_chars"), asc("doc_id"))))
    val cells = per.groupBy("qi", "li").agg(count(lit(1)).as("nij"))
      .selectExpr("qi", "li", "CAST(nij AS BIGINT) AS nij")
    val a = cells.selectExpr("qi AS qa", "li AS la", "nij AS na")
    val b = cells.selectExpr("qi AS qb", "li AS lb", "nij AS nb")
    val pairs = a.crossJoin(broadcast(b)).filter(
      col("qa") < col("qb") || (col("qa") === col("qb") && col("la") < col("lb")))
    val cd = pairs.agg(
      sum(expr("CASE WHEN qa < qb AND la < lb THEN na * nb ELSE 0 END")).as("c"),
      sum(expr("CASE WHEN qa < qb AND la > lb THEN na * nb ELSE 0 END")).as("d"))
    val rows = cells.groupBy("qi").agg(sum("nij").as("r"))
      .agg(sum(expr("r * (r - 1)")).as("t1_2"))
    val cols = cells.groupBy("li").agg(sum("nij").as("c"))
      .agg(sum(expr("c * (c - 1)")).as("t2_2"))
    val n = cells.agg(sum("nij").as("n"))
    cd.crossJoin(broadcast(rows)).crossJoin(broadcast(cols))
      .crossJoin(broadcast(n))
      .selectExpr("CAST(n AS BIGINT) AS n", "CAST(c AS BIGINT) AS c",
        "CAST(d AS BIGINT) AS d",
        "CAST(t1_2 AS BIGINT) AS t1_2", "CAST(t2_2 AS BIGINT) AS t2_2")
      .selectExpr("n", "c", "d",
        "n * (n - 1) - t1_2 AS den1_2", "n * (n - 1) - t2_2 AS den2_2")
      .selectExpr("n", "c", "d",
        "(c - d) / sqrt(CAST(den1_2 AS DOUBLE) / 2 * (CAST(den2_2 AS DOUBLE) / 2)) AS tau_b")
  }

  lazy val qualityLengthKendallOracle: String =
    s"""WITH $statsCtes,
        per AS (SELECT doc_id,
            ntile(10) OVER (ORDER BY quality_score, doc_id) AS qi,
            ntile(10) OVER (ORDER BY n_chars, doc_id) AS li
          FROM stats),
        cells AS (SELECT qi, li, CAST(count(*) AS BIGINT) AS nij
          FROM per GROUP BY 1, 2),
        cd AS (SELECT
            CAST(sum(CASE WHEN a.qi < b.qi AND a.li < b.li
              THEN a.nij * b.nij ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN a.qi < b.qi AND a.li > b.li
              THEN a.nij * b.nij ELSE 0 END) AS BIGINT) AS d
          FROM cells a CROSS JOIN cells b
          WHERE a.qi < b.qi OR (a.qi = b.qi AND a.li < b.li)),
        rt AS (SELECT CAST(sum(r * (r - 1)) AS BIGINT) AS t1_2
          FROM (SELECT sum(nij) AS r FROM cells GROUP BY qi)),
        ct AS (SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS t2_2
          FROM (SELECT sum(nij) AS c FROM cells GROUP BY li)),
        nt AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
        dens AS (SELECT n, c, d, t1_2, t2_2,
            n * (n - 1) - t1_2 AS den1_2, n * (n - 1) - t2_2 AS den2_2
          FROM cd CROSS JOIN rt CROSS JOIN ct CROSS JOIN nt)
        SELECT n, c, d,
          (c - d) / sqrt(CAST(den1_2 AS DOUBLE) / 2 * (CAST(den2_2 AS DOUBLE) / 2)) AS tau_b
        FROM dens"""

  /** `source_simpson_diversity`: per-source TERM diversity by the
    * Simpson index — 1 − Σp² (the probability two random tokens are
    * different types) and its inverse 1/Σp², the "effective
    * vocabulary" (Hill number of order 2). Simpson is the diversity
    * index that needs NO logarithm, which makes it the one this
    * engine can gate bit-exactly: Σc² and S are exact BIGINT token
    * sums per source, the two readouts are single divisions. The
    * entropy-based diversity lives in the lang-mix table under
    * quantized-nano discipline; this is its log-free vocabulary-grain
    * complement, and the one to prefer cross-engine. Term counts per
    * (source, term) are one map-side-combined agg; per-source squares
    * another — two shuffles on bounded keys at any corpus size. */
  def sourceSimpsonDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("source",
        s"explode(${words("lower(text)", SparkD)}) AS term")
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum("c").as("s"),
        sum(expr("c * c")).as("c2"))
      .selectExpr("source", "CAST(n_types AS BIGINT) AS n_types",
        "CAST(s AS BIGINT) AS n_tokens", "CAST(c2 AS BIGINT) AS c2")
      .selectExpr("source", "n_types", "n_tokens",
        "1 - CAST(c2 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * n_tokens) AS simpson",
        "(CAST(n_tokens AS DOUBLE) * n_tokens) / c2 AS effective_vocab")
      .orderBy("source")

  val sourceSimpsonDiversityOracle: String =
    s"""WITH toks AS (SELECT source,
           unnest(${words("lower(text)", DuckD)}) AS term
         FROM documents),
       per AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         FROM toks GROUP BY 1, 2),
       agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(c * c) AS BIGINT) AS c2
         FROM per GROUP BY source)
       SELECT source, n_types, n_tokens,
         1 - CAST(c2 AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * n_tokens) AS simpson,
         (CAST(n_tokens AS DOUBLE) * n_tokens) / c2 AS effective_vocab
       FROM agg ORDER BY source"""

  /** `text_source_novelty`: each source's EXCLUSIVE contribution — of
    * the distinct 3-gram shingle types a source contains, how many
    * appear in NO other source. This is the marginal-value table for
    * source selection (a feed whose content is 95 % covered by other
    * feeds adds little beyond duplication risk; corpus-level dedup
    * stats can't see this because they count pairs, not coverage).
    * Shingle types are md5-hashed before the corpus-wide distinct so
    * the shuffle carries 16-byte keys; the per-gram source count and
    * the per-source rollup are both map-side-combined hash aggs on
    * bounded-width keys — one scan plus two aggregations at any
    * corpus size. */
  def sourceNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sg = Tables.documents(spark, dir)
      .selectExpr("source",
        s"${let1(words("lower(text)", SparkD), "wv", shingles("wv", SparkD))} AS sh")
      .select(col("source"), explode(col("sh")).as("g"))
      .selectExpr("source", "md5(g) AS h")
      .distinct()
    val perGram = sg.groupBy("h").agg(count(lit(1)).as("n_sources"))
    sg.join(perGram, Seq("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum(expr("CASE WHEN n_sources = 1 THEN 1 ELSE 0 END")).as("n_exclusive"))
      .selectExpr("source", "CAST(n_types AS BIGINT) AS n_types",
        "CAST(n_exclusive AS BIGINT) AS n_exclusive",
        "CAST(n_exclusive AS DOUBLE) / n_types AS exclusive_share")
      .orderBy("source")
  }

  val sourceNoveltyOracle: String =
    s"""WITH wv_t AS (SELECT source, ${words("lower(text)", DuckD)} AS wv
          FROM documents),
        sg AS MATERIALIZED (SELECT DISTINCT source,
            md5(unnest(${shingles("wv", DuckD)})) AS h
          FROM wv_t),
        pg AS (SELECT h, count(*) AS n_sources FROM sg GROUP BY h),
        g AS (SELECT sg.source, count(*) AS n_types,
                CAST(sum(CASE WHEN pg.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive
              FROM sg JOIN pg ON sg.h = pg.h GROUP BY sg.source)
        SELECT source, CAST(n_types AS BIGINT) AS n_types, n_exclusive,
          CAST(n_exclusive AS DOUBLE) / n_types AS exclusive_share
        FROM g ORDER BY source"""

  // ---- corpus n-gram repetition spectrum ----

  private val repeatLens = Seq(1, 2, 4, 8, 16, 32, 64)

  /** `text_repeat_spectrum`: the corpus-wide window-repetition profile
    * — for each window length L in [[repeatLens]], how many token
    * windows exist, how many are distinct, how many KINDS repeat, the
    * repeated token mass, and the worst offender's occurrence count.
    * This is the memorization-risk readout behind exact-substring
    * dedup (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better"): the L at which repeated mass stops
    * decaying is where verbatim boilerplate lives, and the spectrum
    * says WHICH L a span-dedup pass should target. One corpus scan:
    * the doc's token array is bound once, all seven window arrays are
    * concatenated as (len, hash) structs and exploded together; the
    * (len, hash) hash-agg is map-side combined, so the shuffle carries
    * distinct windows, not positions — the plan a 100 TB n-gram count
    * actually uses. Windows are md5-hashed so shuffle rows stay
    * narrow; counts are exact integers. */
  def repeatSpectrum(spark: SparkSession, dir: String): DataFrame = {
    // r13 optimization: the window fan used to md5 an array_join of
    // STRING slices — ~sum(L)=127 token-string copies plus a joined
    // string build per position. Windows now slice a per-token
    // xxhash64 LONG array (8-byte copies) and key the count on a
    // 96-bit combined hash (xxhash64 + murmur3 of the same long
    // slice): n_distinct is an output here, so a 64-bit key alone
    // would be too collision-prone at corpus scale, while 96 bits
    // keeps the expected collision count << 1 even at 1e12 windows —
    // the same order of by-construction reliance the md5 key already
    // made (2^-128 vs 2^-96 per pair, both ≈ 0 at fixture scale where
    // the oracle compares exactly).
    val arrs = repeatLens.map { l =>
      s"""CASE WHEN size(hv) >= $l THEN transform(sequence(0, size(hv) - $l),
            i -> named_struct('len', $l, 'a', slice(hv, i + 1, $l)))
          ELSE array() END"""
    }.mkString("concat(", ", ", ")")
    val hv = let1(words("lower(text)", SparkD), "wv",
      "transform(wv, t -> xxhash64(t))")
    val windows = Tables.documents(spark, dir)
      .selectExpr(s"${let1(hv, "hv", arrs)} AS ws")
      .select(explode(col("ws")).as("w"))
      .selectExpr("w.len AS len", "xxhash64(w.a) AS h", "hash(w.a) AS h2")
    windows.groupBy("len", "h", "h2").agg(count(lit(1)).as("cnt"))
      .groupBy("len")
      .agg(sum("cnt").as("n_windows"),
        count(lit(1)).as("n_distinct"),
        sum(expr("CASE WHEN cnt > 1 THEN 1 ELSE 0 END")).as("n_repeated_kinds"),
        sum(expr("CASE WHEN cnt > 1 THEN cnt ELSE 0 END")).as("repeated_mass"),
        max("cnt").as("max_count"))
      .selectExpr("len", "CAST(n_windows AS BIGINT) AS n_windows",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "CAST(n_repeated_kinds AS BIGINT) AS n_repeated_kinds",
        "CAST(repeated_mass AS BIGINT) AS repeated_mass",
        "CAST(max_count AS BIGINT) AS max_count",
        "CASE WHEN n_windows > 0 THEN CAST(repeated_mass AS DOUBLE) / n_windows " +
          "ELSE CAST(0 AS DOUBLE) END AS repeated_share")
      .orderBy("len")
  }

  val repeatSpectrumOracle: String = {
    val fan = repeatLens.map { l =>
      s"""SELECT $l AS len,
            md5(array_to_string(wv[i + 1:i + $l], ' ')) AS h
          FROM wt2, unnest(range(0, CASE WHEN len(wv) >= $l
            THEN len(wv) - $l + 1 ELSE 0 END)) AS t(i)"""
    }.mkString(" UNION ALL ")
    s"""WITH wt2 AS MATERIALIZED (SELECT ${words("lower(text)", DuckD)} AS wv
          FROM documents),
        fan AS ($fan),
        cnts AS (SELECT len, h, count(*) AS cnt FROM fan GROUP BY len, h),
        g AS (SELECT len, CAST(sum(cnt) AS BIGINT) AS n_windows,
                count(*) AS n_distinct,
                CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_kinds,
                CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS repeated_mass,
                CAST(max(cnt) AS BIGINT) AS max_count
              FROM cnts GROUP BY len)
        SELECT len, n_windows, CAST(n_distinct AS BIGINT) AS n_distinct,
          n_repeated_kinds, repeated_mass, max_count,
          CASE WHEN n_windows > 0 THEN CAST(repeated_mass AS DOUBLE) / n_windows
            ELSE CAST(0 AS DOUBLE) END AS repeated_share
        FROM g ORDER BY len"""
  }

  /** `text_top_repeats`: the worst-offender table the
    * [[repeatSpectrum]] points at — for each window length L, the
    * most-repeated token window WITH its text and occurrence count
    * (only lengths where something actually repeats). ONE corpus
    * fan-out: the window aggregation carries (xxhash64, count, and a
    * 16-byte REPRESENTATIVE pointer — the min (doc_id, pos) seeing
    * that hash) through the shuffle, so text recovery for the ≤7
    * winning hashes re-reads only the representatives' documents and
    * slices the one winning window out of each — the earlier version
    * re-derived ALL windows a second time to semi-join the winners
    * (the `def windowed` double fan-out the r10 verdict flagged:
    * 8.01 s at sf0.1, 2× the fan-out cost). Narrow-shuffle-first
    * still holds: no window STRING exists anywhere except the final
    * handful of winners — the discipline that keeps this runnable
    * when windows are 64 tokens wide and the corpus is 100 TB. */
  def topRepeats(spark: SparkSession, dir: String): DataFrame = {
    // windows stay token ARRAYS: xxhash64 hashes the slice directly
    // (8-byte longs through the shuffle). Engine-side hash choice is
    // invisible to the oracle: h never reaches the output, only counts
    // and the recovered text do, and count ties are broken on the
    // window TEXT (hash order would be an engine artifact) — every
    // max-count hash per length recovers its text, min-text wins.
    //
    // Duplicate-dense guard (VERDICT r12 #8): byte-identical documents
    // collapse BEFORE the 7-length window fan-out — one representative
    // (the group-min doc_id) fans windows with multiplicity k, and the
    // count aggregate is sum(k). Exactness: identical texts yield
    // identical window sets, so per-hash counts are unchanged, and the
    // true min (doc_id, pos) rep of any hash is reachable through the
    // group-min doc (members share positions; the group min doc_id IS
    // the rep doc). On a crawl where a viral page repeats k times the
    // window shuffle carries its windows ONCE, not k times — the
    // repeated-mass blowup the sf1.0 lane measured (4.3× wall at 10×
    // data with 5× byte-identical copies) was exactly this.
    // r13 optimization: windows hash LONG slices of a per-token
    // xxhash64 array instead of string-array slices — the 7-length
    // fan used to copy ~sum(L)=127 token STRINGS per position; now it
    // copies 8-byte longs. Counts are unchanged (equal token windows
    // give equal hash arrays), and the engine-side hash stays
    // invisible to the oracle exactly as before: h never reaches the
    // output, and the existing reliance on xxhash64 being
    // collision-free over the window space already subsumes the
    // token-level reuse. (A min-struct single-pass collapse was
    // measured and REJECTED: aggregating a text-carrying struct
    // forces SortAggregate — var-length buffers can't hash-agg — and
    // cost +3 s over the narrow group + join-back.)
    val docs = Tables.documents(spark, dir)
    val groups = docs.selectExpr("md5(text) AS fp", "doc_id")
      .groupBy("fp").agg(min("doc_id").as("doc_id"), count(lit(1)).as("k"))
    val fanDocs = docs.join(groups.select("doc_id", "k"), Seq("doc_id"))
    val arrs = repeatLens.map { l =>
      s"""CASE WHEN size(hv) >= $l THEN transform(sequence(0, size(hv) - $l),
            i -> named_struct('len', $l, 'pos', i, 'h', xxhash64(slice(hv, i + 1, $l))))
          ELSE array() END"""
    }.mkString("concat(", ", ", ")")
    val hv = let1(words("lower(text)", SparkD), "wv",
      "transform(wv, t -> xxhash64(t))")
    val windows = fanDocs
      .selectExpr("doc_id", "k", s"${let1(hv, "hv", arrs)} AS ws")
      .select(col("doc_id"), col("k"), explode(col("ws")).as("w"))
      .selectExpr("w.len AS len", "w.h AS h", "k",
        "named_struct('doc_id', doc_id, 'pos', w.pos) AS rep")
    val cnts = windows.groupBy("len", "h")
      .agg(sum(col("k")).as("cnt"), min(col("rep")).as("rep"))
      .filter(col("cnt") > 1)
    val maxc = cnts.groupBy("len").agg(max(col("cnt")).as("n_occurrences"))
    val winners = cnts.join(maxc, Seq("len"))
      .filter(col("cnt") === col("n_occurrences"))
      .selectExpr("len", "n_occurrences",
        "rep.doc_id AS doc_id", "rep.pos AS pos")
    // recover each winner's text from its representative document: the
    // winners relation is |repeatLens| × (count ties) rows — broadcast
    // it, re-tokenize only the matching documents, slice out exactly
    // the winning window
    val repDocs = Tables.documents(spark, dir)
      .join(broadcast(winners.select("doc_id").distinct()),
        Seq("doc_id"), "left_semi")
      .selectExpr("doc_id", s"${words("lower(text)", SparkD)} AS wv")
    winners.join(repDocs, Seq("doc_id"))
      .selectExpr("len", "n_occurrences",
        "array_join(slice(wv, pos + 1, len), ' ') AS window_text")
      .groupBy("len")
      .agg(max(col("n_occurrences")).cast("long").as("n_occurrences"),
        min(col("window_text")).as("window_text"))
      .orderBy("len")
  }

  val topRepeatsOracle: String = {
    val fan = repeatLens.map { l =>
      s"""SELECT $l AS len, array_to_string(wv[i + 1:i + $l], ' ') AS t
          FROM wt2, unnest(range(0, CASE WHEN len(wv) >= $l
            THEN len(wv) - $l + 1 ELSE 0 END)) AS x(i)"""
    }.mkString(" UNION ALL ")
    s"""WITH wt2 AS MATERIALIZED (SELECT ${words("lower(text)", DuckD)} AS wv
          FROM documents),
        cnts AS (SELECT len, t, count(*) AS cnt FROM ($fan) f0
                 GROUP BY len, t)
        SELECT len, CAST(cnt AS BIGINT) AS n_occurrences, t AS window_text
        FROM (SELECT *, row_number() OVER (PARTITION BY len
                ORDER BY cnt DESC, t) AS rn
              FROM cnts WHERE cnt > 1) z
        WHERE rn = 1 ORDER BY len"""
  }

  // ---- PMI collocations ----

  private val collocK = 30
  private val collocMinCount = 5

  /** Corpus-level collocation mining: adjacent token bigrams ranked by
    * lift = p(ab) / (p(a)·p(b)) — exp(PMI), the same total order as
    * PMI for a fixed corpus, computed WITHOUT ln() (libm rounding
    * differs across engines; one IEEE multiply-divide tree is
    * correctly rounded on both). All four counts ride two map-side-
    * combined hash aggregations (unigram occurrences; adjacent pairs),
    * the totals are 1-row broadcast relations, and products are taken
    * in DOUBLE because at real corpus scale n_a·n_b overflows BIGINT
    * (~3e9² ≫ 2^63) — the same wrap-vs-promote hazard
    * [[graft.sql.Analytics]] hit in association-rule lift. Min pair
    * count [[collocMinCount]] is the standard PMI noise floor (rare
    * pairs otherwise dominate the ranking). */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(expr(words("lower(text)", SparkD))).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).as("n_term"))
    val pairs = docs.selectExpr(
        s"${let1(words("lower(text)", SparkD), "wv",
          "CASE WHEN size(wv) >= 2 THEN transform(sequence(0, size(wv) - 2), " +
            "i -> named_struct('ta', wv[i], 'tb', wv[i + 1])) " +
            "ELSE array() END")} AS bg")
      .select(explode(col("bg")).as("p"))
      .select(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
    val big = pairs.groupBy("term_a", "term_b").agg(count(lit(1)).as("n_pair"))
    val uniTotal = uni.agg(sum("n_term").as("n_term_total"))
    val pairTotal = big.agg(sum("n_pair").as("n_pair_total"))
    val liftExpr =
      "(CAST(n_pair AS DOUBLE) * n_term_total * n_term_total) / " +
        "(CAST(n_a AS DOUBLE) * n_b * n_pair_total) AS lift"
    big.filter(col("n_pair") >= collocMinCount)
      .join(uni.selectExpr("term AS term_a", "n_term AS n_a"), Seq("term_a"))
      .join(uni.selectExpr("term AS term_b", "n_term AS n_b"), Seq("term_b"))
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(pairTotal))
      .selectExpr("term_a", "term_b", "n_pair", "n_a", "n_b", liftExpr)
      .orderBy(desc("lift"), asc("term_a"), asc("term_b"))
      .limit(collocK)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("lift"), asc("term_a"), asc("term_b"))))
      .select("rank", "term_a", "term_b", "n_pair", "n_a", "n_b", "lift")
      .orderBy("rank")
  }

  val collocationsOracle: String =
    s"""WITH w_t AS (SELECT doc_id, ${words("lower(text)", DuckD)} AS wv
                     FROM documents),
        toks AS (SELECT doc_id, unnest(wv) AS term FROM w_t),
        uni AS (SELECT term, count(*) AS n_term FROM toks GROUP BY term),
        bg AS (SELECT wv[i] AS term_a, wv[i + 1] AS term_b
               FROM w_t, unnest(range(1, len(wv))) t(i)
               WHERE len(wv) >= 2),
        big AS (SELECT term_a, term_b, count(*) AS n_pair
                FROM bg GROUP BY term_a, term_b),
        ut AS (SELECT sum(n_term) AS n_term_total FROM uni),
        pt AS (SELECT sum(n_pair) AS n_pair_total FROM big),
        scored AS (SELECT b.term_a, b.term_b, b.n_pair,
            ua.n_term AS n_a, ub.n_term AS n_b,
            (CAST(b.n_pair AS DOUBLE) * n_term_total * n_term_total) /
              (CAST(ua.n_term AS DOUBLE) * ub.n_term * n_pair_total) AS lift
          FROM big b
          JOIN uni ua ON b.term_a = ua.term
          JOIN uni ub ON b.term_b = ub.term
          CROSS JOIN ut CROSS JOIN pt
          WHERE b.n_pair >= $collocMinCount),
        top AS (SELECT * FROM scored
                ORDER BY lift DESC, term_a, term_b LIMIT $collocK)
        SELECT row_number() OVER (ORDER BY lift DESC, term_a, term_b) AS rank,
          term_a, term_b, n_pair, n_a, n_b, lift
        FROM top ORDER BY rank"""

  // ---- rule-based quality gate (Gopher-style heuristics) ----

  /** Per-doc counting columns the gate rules compare. Everything is an
    * exact integer; every ratio threshold below is applied as an
    * integer cross-multiply, so no float ever decides a pass/fail
    * boundary (the [[graft.sql.Analytics]] discipline) and both
    * engines agree bit-for-bit. */
  private[llm] def gateCols(d: Dialect): Seq[String] = {
    val w = words("lower(text)", d)
    val stopKinds = d match {
      case SparkD =>
        s"size(array_distinct(regexp_extract_all(lower(text), '${re(stopRe, SparkD)}', 0)))"
      case DuckD =>
        s"len(list_distinct(regexp_extract_all(lower(text), '$stopRe')))"
    }
    val alphaTokens = d match {
      case SparkD => s"size(filter($w, t -> t rlike '[A-Za-z]'))"
      case DuckD  => s"len(list_filter($w, t -> regexp_matches(t, '[A-Za-z]')))"
    }
    val g3counts = d match {
      case SparkD => let1(w, "wv",
        let1(grams3("wv", SparkD), "g3",
          "named_struct('ng', size(g3), 'nd', size(array_distinct(g3)))"))
      case DuckD => "" // DuckDB binds wv/g3 via CTE columns instead
    }
    statsCols(d) ++ Seq(
      s"CAST($stopKinds AS INTEGER) AS n_stop_kinds",
      s"CAST($alphaTokens AS INTEGER) AS n_alpha_tokens") ++ (d match {
      case SparkD => Seq(
        s"CAST($g3counts.ng AS INTEGER) AS n_g3",
        s"CAST($g3counts.nd AS INTEGER) AS n_g3_distinct")
      case DuckD => Seq(
        s"CAST(${arrLen(grams3(words("lower(text)", DuckD), DuckD), DuckD)} AS INTEGER) AS n_g3",
        s"CAST(${arrLen(arrDistinct(grams3(words("lower(text)", DuckD), DuckD), DuckD), DuckD)} AS INTEGER) AS n_g3_distinct")
    })
  }

  /** The six gate rules — identical SQL text in both dialects.
    * Thresholds follow the published filtering heuristics (Gopher /
    * C4): doc length in tokens, mean word length in [3,10], symbol
    * ratio <= 20%, >= 2 distinct stopwords present, >= 80% alphabetic
    * tokens, and duplicate-3-gram fraction <= 50%. */
  private[llm] val gateRules: Seq[String] = Seq(
    "CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 THEN 1 ELSE 0 END AS r_len",
    "CASE WHEN 3 * n_tokens <= n_chars_no_ws AND n_chars_no_ws <= 10 * n_tokens THEN 1 ELSE 0 END AS r_word_len",
    "CASE WHEN 5 * punct_count <= n_chars THEN 1 ELSE 0 END AS r_symbol",
    "CASE WHEN n_stop_kinds >= 2 THEN 1 ELSE 0 END AS r_stopword",
    "CASE WHEN 5 * n_alpha_tokens >= 4 * n_tokens THEN 1 ELSE 0 END AS r_alpha",
    "CASE WHEN 2 * n_g3_distinct >= n_g3 THEN 1 ELSE 0 END AS r_repetition")

  private[llm] val gateVerdict: Seq[String] = Seq(
    "r_len + r_word_len + r_symbol + r_stopword + r_alpha + r_repetition AS n_rules_passed",
    "CASE WHEN r_len + r_word_len + r_symbol + r_stopword + r_alpha + r_repetition = 6 " +
      "THEN 1 ELSE 0 END AS pass")

  /** Unordered gate relation — [[Curation.qualityFunnel]] reuses it as
    * a join input. */
  private[llm] def gateRelation(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr(gateCols(SparkD): _*)
      .selectExpr(("*" +: gateRules): _*)
      .selectExpr(("*" +: gateVerdict): _*)

  /** DuckDB CTE chain ending in `gate(doc_id, ..counts.., r_*,
    * n_rules_passed, pass)` — the oracle twin of [[gateRelation]]. */
  private[llm] def gateCtes: String =
    s"""gate_base AS (SELECT ${gateCols(DuckD).mkString(", ")} FROM documents),
        gate_rules AS (SELECT *, ${gateRules.mkString(", ")} FROM gate_base),
        gate AS (SELECT *, ${gateVerdict.mkString(", ")} FROM gate_rules)"""

  /** Rule-based quality gate — the multi-heuristic document filter
    * every training pipeline runs before dedup (Rae et al. 2021 §A1.1
    * "Gopher rules"; Raffel et al. 2020's C4 filters). Each rule is an
    * independent 0/1 flag so downstream consumers can ablate a single
    * rule without re-running the scan; `pass` is the conjunction. A
    * per-row codegen'd projection riding the scan — no shuffle, no
    * join: at 100 TB this is exactly one pass over the corpus. */
  def qualityGate(spark: SparkSession, dir: String): DataFrame =
    gateRelation(spark, dir)
      .select("doc_id", "n_tokens", "n_stop_kinds", "n_alpha_tokens",
        "n_g3", "n_g3_distinct", "r_len", "r_word_len", "r_symbol",
        "r_stopword", "r_alpha", "r_repetition", "n_rules_passed", "pass")
      .orderBy("doc_id")

  val qualityGateOracle: String =
    s"""WITH $gateCtes
        SELECT doc_id, n_tokens, n_stop_kinds, n_alpha_tokens,
          n_g3, n_g3_distinct, r_len, r_word_len, r_symbol,
          r_stopword, r_alpha, r_repetition, n_rules_passed, pass
        FROM gate ORDER BY doc_id"""

  // ---- negative-sampling distribution (word2vec unigram^0.75) ----

  private val negSampleK = 100

  /** `text_negative_sampling`: the smoothed unigram sampling table
    * word2vec-family training draws negatives from — p(w) ∝ count^0.75
    * (Mikolov et al. 2013's empirical flattening exponent), emitted as
    * the top-[[negSampleK]] terms with exact counts, micro-quantized
    * weights, shares against the FULL-vocabulary total, and the
    * cumulative share (the bucket boundaries an alias-table build
    * consumes). count^0.75 composes as sqrt(c)·sqrt(sqrt(c)) — two
    * correctly-rounded IEEE ops, no libm pow (the quarter-power trick
    * from the temperature-mixing table). The share denominator is one
    * map-side-combined agg over the whole vocabulary; the cum-share
    * window sees only the K output rows. */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(spark, dir)
      .select(explode(expr(words("lower(text)", SparkD))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .selectExpr("term", "cnt",
        "CAST(round(sqrt(CAST(cnt AS DOUBLE)) * sqrt(sqrt(CAST(cnt AS DOUBLE))) * 1e6) AS BIGINT) AS w_q")
    val tot = counts.agg(sum("w_q").as("w_tot"))
    val wTop = Window.orderBy(desc("cnt"), asc("term"))
    counts
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= negSampleK)
      .crossJoin(broadcast(tot))
      .withColumn("cum_w", expr(
        "sum(w_q) OVER (ORDER BY cnt DESC, term ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
      .selectExpr("rk", "term", "CAST(cnt AS BIGINT) AS cnt", "w_q",
        "CAST(w_q AS DOUBLE) / w_tot AS share",
        "CAST(cum_w AS DOUBLE) / w_tot AS cum_share")
      .orderBy("rk")
  }

  val negativeSamplingOracle: String =
    s"""WITH toks AS (SELECT unnest(${words("lower(text)", DuckD)}) AS term
          FROM documents),
        cnts AS (SELECT term, count(*) AS cnt,
            CAST(round(sqrt(CAST(count(*) AS DOUBLE)) * sqrt(sqrt(CAST(count(*) AS DOUBLE))) * 1e6) AS BIGINT) AS w_q
          FROM toks GROUP BY term),
        tt AS (SELECT CAST(sum(w_q) AS BIGINT) AS w_tot FROM cnts),
        top AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, term) AS rk
                FROM cnts
                QUALIFY row_number() OVER (ORDER BY cnt DESC, term) <= $negSampleK),
        cw AS (SELECT *, CAST(sum(w_q) OVER (ORDER BY cnt DESC, term
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w
               FROM top)
        SELECT rk, term, CAST(cnt AS BIGINT) AS cnt, w_q,
          CAST(w_q AS DOUBLE) / w_tot AS share,
          CAST(cum_w AS DOUBLE) / w_tot AS cum_share
        FROM cw CROSS JOIN tt ORDER BY rk"""

  // ---- per-source unigram entropy ----

  /** `text_source_entropy`: Shannon entropy of each source's unigram
    * distribution (plug-in estimator, nats) plus the vocabulary-
    * normalized form H/ln(V) — the lexical-diversity signal that
    * separates templated/boilerplate feeds (low H for their size)
    * from natural prose at a glance, complementing TTR (which ignores
    * the shape of the frequency distribution). Per-term contributions
    * (c/T)·ln(c/T) are nano-quantized before the per-source sum, so
    * the readout is order-independent; ln appears only under the
    * established quantize-the-readout discipline. Two
    * map-side-combined aggs ((source, term) then source), nothing
    * else. */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    val st = Tables.documents(spark, dir)
      .select(col("source"), explode(expr(words("lower(text)", SparkD))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    val pt = st.groupBy("source").agg(sum("c").as("t_toks"))
    st.join(pt, Seq("source"))
      .selectExpr("source", "t_toks",
        "CAST(round((CAST(c AS DOUBLE) / t_toks) * ln(CAST(c AS DOUBLE) / t_toks) * 1e9) AS BIGINT) AS h_nano")
      .groupBy("source", "t_toks")
      .agg(count(lit(1)).as("vocab"), sum("h_nano").as("hsum"))
      .selectExpr("source", "CAST(t_toks AS BIGINT) AS n_tokens",
        "CAST(vocab AS BIGINT) AS vocab",
        "-(CAST(hsum AS DOUBLE)) / 1e9 AS entropy_nats",
        """CASE WHEN vocab > 1
             THEN (-(CAST(hsum AS DOUBLE)) / 1e9) / ln(CAST(vocab AS DOUBLE))
             ELSE CAST(0 AS DOUBLE) END AS norm_entropy""")
      .orderBy("source")
  }

  val sourceEntropyOracle: String =
    s"""WITH toks AS (SELECT source, unnest(${words("lower(text)", DuckD)}) AS term
          FROM documents),
        st AS (SELECT source, term, count(*) AS c FROM toks GROUP BY source, term),
        pt AS (SELECT source, CAST(sum(c) AS BIGINT) AS t_toks FROM st GROUP BY source),
        hh AS (SELECT st.source, pt.t_toks,
            CAST(round((CAST(st.c AS DOUBLE) / pt.t_toks) * ln(CAST(st.c AS DOUBLE) / pt.t_toks) * 1e9) AS BIGINT) AS h_nano
          FROM st JOIN pt ON st.source = pt.source),
        g AS (SELECT source, t_toks, count(*) AS vocab,
                CAST(sum(h_nano) AS BIGINT) AS hsum
              FROM hh GROUP BY source, t_toks)
        SELECT source, t_toks AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
          -(CAST(hsum AS DOUBLE)) / 1e9 AS entropy_nats,
          CASE WHEN vocab > 1
            THEN (-(CAST(hsum AS DOUBLE)) / 1e9) / ln(CAST(vocab AS DOUBLE))
            ELSE CAST(0 AS DOUBLE) END AS norm_entropy
        FROM g ORDER BY source"""

  // ---- windowed skip-gram PMI (word2vec co-occurrence shape) ----

  private val skipWindow = 3
  private val skipK = 30
  private val skipMinCount = 5

  /** Windowed co-occurrence mining: unordered token pairs within
    * distance ≤ [[skipWindow]] ranked by lift = p(ab)/(p(a)·p(b)) —
    * the word2vec/GloVe co-occurrence matrix restricted to its top
    * PMI entries. Extends [[collocations]] (distance exactly 1,
    * ordered) to the skip-gram context window every embedding trainer
    * actually consumes.
    *
    * Scale shape: pair generation is ARRAY-LOCAL (a per-row transform
    * over the token array — offsets never leave the row), so the only
    * shuffles are the two count hash-aggs, both map-side combined.
    * The positional self-join a naive formulation would use (tokens ⋈
    * tokens on doc_id, |i−j| ≤ w) never happens: at 100 TB that join
    * shuffles every token w times; the array form shuffles each pair
    * key once, already partially counted. Products stay in DOUBLE
    * ([[collocations]]' overflow dodge); pairs are canonicalized
    * (least, greatest) so the matrix is stored symmetric-once. */
  def skipgramPmi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      explode(expr(words("lower(text)", SparkD))).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).as("n_term"))
    val pairArr = (1 to skipWindow).map { o =>
      s"CASE WHEN size(wv) > $o THEN transform(sequence(0, size(wv) - 1 - $o), " +
        s"i -> named_struct('ta', least(wv[i], wv[i + $o]), 'tb', greatest(wv[i], wv[i + $o]))) " +
        "ELSE array() END"
    }.mkString("concat(", ", ", ")")
    val pairs = docs
      .selectExpr(s"${let1(words("lower(text)", SparkD), "wv", pairArr)} AS pr")
      .select(explode(col("pr")).as("p"))
      .select(col("p.ta").as("term_a"), col("p.tb").as("term_b"))
    val big = pairs.groupBy("term_a", "term_b").agg(count(lit(1)).as("n_pair"))
    val uniTotal = uni.agg(sum("n_term").as("n_term_total"))
    val pairTotal = big.agg(sum("n_pair").as("n_pair_total"))
    val liftExpr =
      "(CAST(n_pair AS DOUBLE) * n_term_total * n_term_total) / " +
        "(CAST(n_a AS DOUBLE) * n_b * n_pair_total) AS lift"
    big.filter(col("n_pair") >= skipMinCount)
      .join(uni.selectExpr("term AS term_a", "n_term AS n_a"), Seq("term_a"))
      .join(uni.selectExpr("term AS term_b", "n_term AS n_b"), Seq("term_b"))
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(pairTotal))
      .selectExpr("term_a", "term_b", "n_pair", "n_a", "n_b", liftExpr)
      .orderBy(desc("lift"), asc("term_a"), asc("term_b"))
      .limit(skipK)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("lift"), asc("term_a"), asc("term_b"))))
      .select("rank", "term_a", "term_b", "n_pair", "n_a", "n_b", "lift")
      .orderBy("rank")
  }

  /** Count of ACTUALLY GENERATED (exploded) skip-gram pairs, for the
    * conservation spec against the closed form Σ_o max(0, n−o) — a
    * dropped or duplicated offset branch in the transform shows up as
    * a mass mismatch. */
  private[graft] def skipgramPairTotalForTest(spark: SparkSession,
      dir: String): Long = {
    val docs = Tables.documents(spark, dir)
    val pairArr = (1 to skipWindow).map { o =>
      s"CASE WHEN size(wv) > $o THEN transform(sequence(0, size(wv) - 1 - $o), " +
        s"i -> named_struct('ta', least(wv[i], wv[i + $o]), 'tb', greatest(wv[i], wv[i + $o]))) " +
        "ELSE array() END"
    }.mkString("concat(", ", ", ")")
    docs.selectExpr(s"${let1(words("lower(text)", SparkD), "wv", pairArr)} AS pr")
      .select(explode(col("pr")).as("p"))
      .count()
  }

  val skipgramPmiOracle: String =
    s"""WITH w_t AS (SELECT doc_id, ${words("lower(text)", DuckD)} AS wv
                     FROM documents),
        toks AS (SELECT doc_id, unnest(wv) AS term FROM w_t),
        uni AS (SELECT term, count(*) AS n_term FROM toks GROUP BY term),
        sg AS (SELECT least(wv[i], wv[i + o.o]) AS term_a,
                      greatest(wv[i], wv[i + o.o]) AS term_b
               FROM w_t, (VALUES (1), (2), (3)) o(o),
                    unnest(range(1, len(wv))) t(i)
               WHERE i + o.o <= len(wv)),
        big AS (SELECT term_a, term_b, count(*) AS n_pair
                FROM sg GROUP BY term_a, term_b),
        ut AS (SELECT sum(n_term) AS n_term_total FROM uni),
        pt AS (SELECT sum(n_pair) AS n_pair_total FROM big),
        scored AS (SELECT b.term_a, b.term_b, b.n_pair,
            ua.n_term AS n_a, ub.n_term AS n_b,
            (CAST(b.n_pair AS DOUBLE) * n_term_total * n_term_total) /
              (CAST(ua.n_term AS DOUBLE) * ub.n_term * n_pair_total) AS lift
          FROM big b
          JOIN uni ua ON b.term_a = ua.term
          JOIN uni ub ON b.term_b = ub.term
          CROSS JOIN ut CROSS JOIN pt
          WHERE b.n_pair >= $skipMinCount),
        top AS (SELECT * FROM scored
                ORDER BY lift DESC, term_a, term_b LIMIT $skipK)
        SELECT row_number() OVER (ORDER BY lift DESC, term_a, term_b) AS rank,
          term_a, term_b, n_pair, n_a, n_b, lift
        FROM top ORDER BY rank"""

  // ---- sentence segmentation stats ----

  /** Per-doc sentence segmentation on terminal punctuation runs
    * ([.!?]+) — the grain sentence-level dedup, chunk alignment, and
    * readability metrics all need before anything smarter (a real
    * splitter adds abbreviation rules; the regex IS the deterministic
    * core both engines share). Purely array-local per row — zero
    * shuffles; empty segments from trailing terminators are dropped
    * after trim so "a. b." is 2 sentences, not 3. Mean length is an
    * exact-count division in one tree. */
  def sentences(spark: SparkSession, dir: String): DataFrame = {
    val segs = "filter(transform(split(text, '[.!?]+'), s -> trim(s)), s -> length(s) > 0)"
    Tables.documents(spark, dir)
      .selectExpr("doc_id", s"$segs AS sg")
      .selectExpr("doc_id",
        "CAST(size(sg) AS BIGINT) AS n_sentences",
        "CAST(aggregate(sg, CAST(0 AS BIGINT), (a, s) -> a + length(s)) AS BIGINT) AS sentence_chars",
        "CAST(coalesce(aggregate(sg, CAST(0 AS BIGINT), (a, s) -> greatest(a, length(s))), 0) AS BIGINT) AS max_sentence")
      .selectExpr("doc_id", "n_sentences", "sentence_chars", "max_sentence",
        "CASE WHEN n_sentences > 0 THEN CAST(sentence_chars AS DOUBLE) / n_sentences ELSE CAST(0 AS DOUBLE) END AS mean_sentence")
      .orderBy("doc_id")
  }

  val sentencesOracle: String =
    """WITH sg_t AS (SELECT doc_id,
          list_filter(list_transform(string_split_regex(text, '[.!?]+'), s -> trim(s)),
            s -> length(s) > 0) AS sg
        FROM documents),
       agg AS (SELECT doc_id,
          CAST(len(sg) AS BIGINT) AS n_sentences,
          CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(sg, s -> CAST(length(s) AS BIGINT))), (a, s) -> a + s) AS BIGINT) AS sentence_chars,
          CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(sg, s -> CAST(length(s) AS BIGINT))), (a, s) -> greatest(a, s)), 0) AS BIGINT) AS max_sentence
        FROM sg_t)
       SELECT doc_id, n_sentences, sentence_chars, max_sentence,
         CASE WHEN n_sentences > 0 THEN CAST(sentence_chars AS DOUBLE) / n_sentences ELSE CAST(0 AS DOUBLE) END AS mean_sentence
       FROM agg ORDER BY doc_id"""

  // ---- char-level Simpson diversity ----

  /** Per-doc character diversity as the inverse Simpson index
    * 1/Σp_c² — the entropy-free compressibility proxy (repeated-char
    * or single-token garbage scores near its distinct-char floor,
    * healthy prose near its alphabet size) that needs no ln() and no
    * float until the last division: Σn_c² and n² are exact BIGINTs
    * from one (doc, char) hash-agg. Characters come from a
    * newline-safe class match, so the count grain is every byte of
    * text. The low-diversity flag is an integer cross-multiply
    * (inv_simpson < 4 ⇔ 4·Σn_c² > n²·1... spelled exactly), so no
    * float decides the boundary. */
  def charDiversity(spark: SparkSession, dir: String): DataFrame =
    // multi-consumer doc-grain relation: session-cached like the
    // other staged prefixes (Verify still measures the cold path)
    graft.PlanCache(spark, "char_diversity", dir) {
    val chars = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        "explode(regexp_extract_all(text, '[\\\\s\\\\S]', 0)) AS ch")
    val perChar = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perChar.groupBy("doc_id").agg(
          sum("nc").as("n"),
          sum(expr("nc * nc")).as("sum_sq"),
          count(lit(1)).as("n_distinct")),
        Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n, 0) AS BIGINT) AS n_chars_m",
        "CAST(coalesce(n_distinct, 0) AS BIGINT) AS n_distinct_chars",
        "CAST(coalesce(sum_sq, 0) AS BIGINT) AS sum_sq",
        "CASE WHEN coalesce(n, 0) > 0 THEN CAST(n AS DOUBLE) * n / sum_sq ELSE CAST(0 AS DOUBLE) END AS inv_simpson",
        // low-diversity ⇔ 1/Σp² < 8 ⇔ n² < 8·Σn_c² (exact integers)
        "CASE WHEN coalesce(n, 0) > 0 AND n * n < 8 * sum_sq THEN 1 ELSE 0 END AS low_diversity")
      .orderBy("doc_id")
  }

  val charDiversityOracle: String =
    """WITH ch_t AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
        FROM documents),
       pc AS (SELECT doc_id, ch, count(*) AS nc FROM ch_t GROUP BY doc_id, ch),
       agg AS (SELECT doc_id, sum(nc) AS n, sum(nc * nc) AS sum_sq,
           count(*) AS n_distinct
         FROM pc GROUP BY doc_id)
       SELECT d.doc_id,
         CAST(coalesce(a.n, 0) AS BIGINT) AS n_chars_m,
         CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct_chars,
         CAST(coalesce(a.sum_sq, 0) AS BIGINT) AS sum_sq,
         CASE WHEN coalesce(a.n, 0) > 0 THEN CAST(a.n AS DOUBLE) * a.n / a.sum_sq ELSE CAST(0 AS DOUBLE) END AS inv_simpson,
         CASE WHEN coalesce(a.n, 0) > 0 AND a.n * a.n < 8 * a.sum_sq THEN 1 ELSE 0 END AS low_diversity
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       ORDER BY d.doc_id"""

  // ---- type-token ratio by length (Heaps-law readout) ----

  /** Type-token ratio by document-length bucket — the Heaps-law
    * diagnostic (TTR falls with length for natural text; FLAT TTR
    * across buckets is the signature of templated/generated text
    * whose vocabulary doesn't grow). Buckets are decades of token
    * count in 25-token steps (the fixture's 10–99-token docs spread
    * across four buckets; at web scale widen the step); per-doc
    * distinct counts are
    * array-local (`array_distinct` inside the row); per-bucket means
    * are exact-sum divisions. */
  def ttrByLength(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .selectExpr(
        s"${let1(words("lower(text)", SparkD), "wv",
          "named_struct('n', size(wv), 'u', size(array_distinct(wv)))")} AS r")
      .selectExpr("r.n AS n", "r.u AS u")
      .filter("n > 0")
      .selectExpr("n", "u", "CAST(n DIV 25 AS INT) AS bucket")
    base.groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        sum("u").as("total_types"))
      .selectExpr("CAST(bucket AS INT) AS len_bucket", "n_docs",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(total_types AS BIGINT) AS total_types",
        "CAST(total_types AS DOUBLE) / total_tokens AS ttr")
      .orderBy("len_bucket")
  }

  val ttrByLengthOracle: String =
    s"""WITH w_t AS (SELECT ${words("lower(text)", DuckD)} AS wv FROM documents),
        b AS (SELECT ${arrLen("wv", DuckD)} AS n,
                ${arrLen(arrDistinct("wv", DuckD), DuckD)} AS u
              FROM w_t WHERE ${arrLen("wv", DuckD)} > 0),
        g AS (SELECT n // 25 AS bucket,
                count(*) AS n_docs, sum(n) AS total_tokens, sum(u) AS total_types
              FROM b GROUP BY 1)
        SELECT CAST(bucket AS INTEGER) AS len_bucket,
          CAST(n_docs AS BIGINT) AS n_docs,
          CAST(total_tokens AS BIGINT) AS total_tokens,
          CAST(total_types AS BIGINT) AS total_types,
          CAST(total_types AS DOUBLE) / total_tokens AS ttr
        FROM g ORDER BY len_bucket"""

  // ---- term burstiness ----

  private val burstK = 20

  /** Church–Gale burstiness for the corpus's heaviest terms: the
    * variance-to-mean ratio of per-document counts — VMR ≈ 1 is
    * Poisson (function words sprinkle uniformly), VMR ≫ 1 is bursty
    * (content words clump in the documents that are ABOUT them). The
    * classic statistic behind stopword discovery and idf's empirical
    * justification. Per-term moments come from the (doc, term) tf
    * relation plus the corpus doc count (zero-occurrence docs enter
    * through the identity Σ(tf−μ)² = Σtf² − 2μΣtf + Nμ² — no explicit
    * zero rows ever materialize); VMR is milli-quantized at readout. */
  def termBurstiness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val tf = docs.select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val byTerm = tf.groupBy("term").agg(
      count(lit(1)).as("df"),
      sum("tf").as("stf"),
      sum(expr("tf * tf")).as("stf2"))
    val top = byTerm.crossJoin(broadcast(nDocs))
      .orderBy(desc("df"), asc("term")).limit(burstK)
    top.selectExpr("term", "df", "stf",
        "CAST(stf AS DOUBLE) / nd AS mu", "CAST(stf2 AS DOUBLE) AS s2d",
        "CAST(nd AS DOUBLE) AS ndd")
      .selectExpr("term", "df", "stf",
        "CAST(round(mu * 1000000) AS BIGINT) AS mean_tf_micro",
        // VMR = (Σtf² − 2μΣtf + Nμ²) / ((N−1)·μ)
        """CAST(round((s2d - 2 * mu * stf + ndd * mu * mu)
             / ((ndd - 1) * mu) * 1000) AS BIGINT) AS vmr_milli""")
      .orderBy(desc("df"), asc("term"))
  }

  val termBurstinessOracle: String =
    s"""WITH w_t AS (SELECT doc_id, ${words("lower(text)", DuckD)} AS wv
                     FROM documents),
        nd_t AS (SELECT count(*) AS nd FROM documents),
        tf_b AS (SELECT doc_id, unnest(wv) AS term FROM w_t),
        tf_t AS (SELECT doc_id, term, count(*) AS tf
                 FROM tf_b GROUP BY doc_id, term),
        bt AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS stf,
                 CAST(sum(tf * tf) AS BIGINT) AS stf2
               FROM tf_t GROUP BY term),
        top AS (SELECT bt.*, nd FROM bt CROSS JOIN nd_t
                ORDER BY df DESC, term LIMIT $burstK),
        v AS (SELECT term, df, stf,
            CAST(stf AS DOUBLE) / nd AS mu,
            CAST(stf2 AS DOUBLE) AS s2d, CAST(nd AS DOUBLE) AS ndd
          FROM top)
        SELECT term, CAST(df AS BIGINT) AS df, stf,
          CAST(round(mu * 1000000) AS BIGINT) AS mean_tf_micro,
          CAST(round((s2d - 2 * mu * stf + ndd * mu * mu)
            / ((ndd - 1) * mu) * 1000) AS BIGINT) AS vmr_milli
        FROM v ORDER BY df DESC, term"""

  // ---- per-document keywords ----

  private val docKeywordK = 3

  /** Per-document keyword extraction: each doc's top [[docKeywordK]]
    * TF-IDF terms — the per-doc descriptor (search snippets, topic
    * tags, routing features) the corpus-grain [[topTerms]] and
    * cluster-grain [[graft.llm.Retrieval.clusterTopTerms]] don't
    * give. Rides the staged weights relation: one doc-partitioned
    * window over (doc, term) rows, weight ties broken by term — no
    * additional scan of text, exact integer weights end to end. */
  def docKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(desc("wq"), asc("term"))
    tfidfWeights(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= docKeywordK)
      .selectExpr("doc_id", "rank", "term", "CAST(wq AS BIGINT) AS weight")
      .orderBy("doc_id", "rank")
  }

  val docKeywordsOracle: String =
    s"""WITH $tfidfCtes,
        r AS (SELECT doc_id, term, wq, CAST(row_number() OVER
            (PARTITION BY doc_id ORDER BY wq DESC, term) AS BIGINT) AS rank
          FROM wt)
        SELECT doc_id, rank, term, CAST(wq AS BIGINT) AS weight
        FROM r WHERE rank <= $docKeywordK ORDER BY doc_id, rank"""

  // ---- DSIR importance-resampling weights ----

  private val dsirBuckets = 4096

  /** Data Selection via Importance Resampling (Xie et al. 2023): score
    * every raw document by how much its hashed-n-gram distribution
    * looks like a TARGET corpus (here: the `lang = 'en'` slice) versus
    * the raw corpus — the published recipe for skewing a 100 TB crawl
    * toward a domain without training a model. Per-token feature =
    * md5 → 2^12 bucket (the [[hashedClassifier]] family); the two
    * bucket distributions get add-1 smoothing; a document's importance
    * weight is Σ_tokens ln(p̂(b)/q̂(b)).
    *
    * Scale shape: both distributions are ONE map-side-combined agg
    * each over the token stream; the model is a ≤ 4096-row relation,
    * BROADCAST to a token-level equi-join that rides the scan — the
    * corpus is never shuffled on anything wider than its own tokens.
    * Determinism: ln() is quantized to nano-units AT THE BUCKET MODEL
    * (4096 rows, the [[LanguageModel]] BM25 discipline), so per-doc
    * sums are exact BIGINT arithmetic — order-independent under any
    * partitioning. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame =
    // multi-consumer doc-grain relation: session-cached like the
    // other staged prefixes (Verify still measures the cold path)
    graft.PlanCache(spark, "dsir_weights", dir) {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"), col("lang"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
      .withColumn("b", expr(s"${hexPrefix32("md5(term)")} % $dsirBuckets"))
    val qCnt = toks.groupBy("b").agg(count(lit(1)).as("n_q"))
    val pCnt = toks.filter(col("lang") === "en")
      .groupBy("b").agg(count(lit(1)).as("n_p"))
    val totals = qCnt.agg(sum("n_q").as("nq_total")).crossJoin(
      pCnt.agg(sum("n_p").as("np_total")))
    // q covers every observed bucket (p's support ⊆ q's), so the left
    // join is total; smoothing keeps empty-in-target buckets finite.
    val model = qCnt.join(pCnt, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .selectExpr("b",
        "CAST(round(ln(((CAST(coalesce(n_p, 0) AS DOUBLE) + 1) / " +
          s"(CAST(np_total AS DOUBLE) + $dsirBuckets)) / " +
          "((CAST(n_q AS DOUBLE) + 1) / " +
          s"(CAST(nq_total AS DOUBLE) + $dsirBuckets))) * 1e9) AS BIGINT) AS w_nano")
    val perDoc = toks.join(broadcast(model), Seq("b"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("w_nano").as("logw_sum"))
    docs.select("doc_id", "lang")
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id", "lang",
        "CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens",
        "CAST(coalesce(logw_sum, 0) AS BIGINT) AS logw_nano",
        // resampling-eligible = looks more target than raw on net
        "CASE WHEN coalesce(logw_sum, 0) > 0 THEN 1 ELSE 0 END AS prefer_flag")
      .orderBy("doc_id")
  }

  val dsirWeightsOracle: String =
    s"""WITH w_t AS (SELECT doc_id, lang, ${words("lower(text)", DuckD)} AS wv
                     FROM documents),
        toks AS (SELECT doc_id, lang, unnest(wv) AS term FROM w_t),
        bt AS (SELECT doc_id, lang,
                 ${hexPrefix32("md5(term)")} % $dsirBuckets AS b
               FROM toks),
        qc AS (SELECT b, count(*) AS n_q FROM bt GROUP BY b),
        pc AS (SELECT b, count(*) AS n_p FROM bt WHERE lang = 'en' GROUP BY b),
        tot AS (SELECT (SELECT sum(n_q) FROM qc) AS nq_total,
                       (SELECT sum(n_p) FROM pc) AS np_total),
        model AS (SELECT qc.b,
            CAST(round(ln(((CAST(coalesce(pc.n_p, 0) AS DOUBLE) + 1) /
                (CAST(np_total AS DOUBLE) + $dsirBuckets)) /
              ((CAST(qc.n_q AS DOUBLE) + 1) /
                (CAST(nq_total AS DOUBLE) + $dsirBuckets))) * 1e9) AS BIGINT) AS w_nano
          FROM qc LEFT JOIN pc ON qc.b = pc.b CROSS JOIN tot),
        perdoc AS (SELECT bt.doc_id, count(*) AS n_tokens,
            sum(m.w_nano) AS logw_sum
          FROM bt JOIN model m ON bt.b = m.b GROUP BY bt.doc_id)
        SELECT d.doc_id, d.lang,
          CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
          CAST(coalesce(p.logw_sum, 0) AS BIGINT) AS logw_nano,
          CASE WHEN coalesce(p.logw_sum, 0) > 0 THEN 1 ELSE 0 END AS prefer_flag
        FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id"""

  // ---- tokenizer fertility by language ----

  /** Tokenizer fertility rollup — chars per BPE-style pre-token BY
    * LANGUAGE, the multilingual tokenizer-equity readout (a tokenizer
    * trained on English famously spends 2-4x more tokens per
    * character on other scripts, which silently taxes their context
    * budget and training compute; fertility per language is the
    * number every multilingual data card reports). Reuses
    * [[bpeTokens]]' regex pre-token count; exact BIGINT sums per
    * language, one IEEE division per readout column at the 5-row
    * language grain. Map-side combined onto |langs| groups — one scan
    * at any corpus size. */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("lang",
        s"CAST(${reCount("text", bpeRe(SparkD), SparkD)} AS BIGINT) AS n_bpe",
        s"CAST(${arrLen(words("text", SparkD), SparkD)} AS BIGINT) AS n_ws",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum("n_bpe").as("sum_bpe"), sum("n_ws").as("sum_ws"))
      .selectExpr("lang", "n_docs", "sum_chars", "sum_bpe", "sum_ws",
        "CAST(sum_chars AS DOUBLE) / sum_bpe AS chars_per_token",
        "CAST(sum_bpe AS DOUBLE) / sum_ws AS tokens_per_word")
      .orderBy("lang")

  val tokenFertilityOracle: String =
    s"""WITH base AS (SELECT lang,
          CAST(${reCount("text", bpeRe(DuckD), DuckD)} AS BIGINT) AS n_bpe,
          CAST(${arrLen(words("text", DuckD), DuckD)} AS BIGINT) AS n_ws,
          CAST(length(text) AS BIGINT) AS n_chars
        FROM documents)
        SELECT lang, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
          CAST(sum(n_ws) AS BIGINT) AS sum_ws,
          CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_bpe) AS BIGINT)
            AS chars_per_token,
          CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_ws) AS BIGINT)
            AS tokens_per_word
        FROM base GROUP BY lang ORDER BY lang"""

  // ---- Zipf rank-frequency law fit ----

  /** Zipf's-law fit over the term rank-frequency curve: OLS slope of
    * ln(freq) on ln(rank) across the full vocabulary — natural text
    * sits near −1, and large deviations flag synthetic, templated, or
    * heavily-duplicated corpora (this fixture's tiny fixed word pool
    * reads as a plateau, slope ≈ −0.3 — exactly the anomaly the
    * diagnostic exists to catch). Completes the lexical-statistics
    * pair with the Heaps-law TTR readout ([[ttrByLength]]).
    *
    * Exactness: ranks are exact (tf desc, term tie-break); both ln()
    * values nano-quantize immediately (the [[dsirWeights]] ln
    * discipline), moments of nano products go through DECIMAL(38,0)/
    * HUGEINT, and the slope/intercept emerge from one fixed IEEE
    * tree, nano-quantized. Vocabulary-grain throughout — corpus
    * touched once by the term count. */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    // The rank runs over the FULL vocabulary (a web-scale corpus has
    // 1e8+ distinct terms, millions tied at tf = 1), so it rides the
    // two-phase Scale.globalRank instead of a one-partition window:
    // tf is pinned exactly as the first bucket column, and the 2-char
    // term prefix splits the huge tie classes — lexicographically
    // order-aligned because prefix(a) < prefix(b) implies a < b.
    val ranked = graft.ops.Scale.globalRank(
      Tables.documents(spark, dir)
        .select(explode(expr(words("lower(text)", SparkD))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("tf")),
      Seq(expr("-tf"), expr("substring(term, 1, 2)")),
      Seq(org.apache.spark.sql.functions.desc("tf"),
        org.apache.spark.sql.functions.asc("term")), "rank")
      .selectExpr(
        "CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9) AS BIGINT) AS lx",
        "CAST(round(ln(CAST(tf AS DOUBLE)) * 1e9) AS BIGINT) AS ly")
    ranked.agg(
      expr("CAST(count(1) AS BIGINT)").as("n"),
      expr("CAST(sum(lx) AS BIGINT)").as("sx"),
      expr("CAST(sum(ly) AS BIGINT)").as("sy"),
      expr(s"sum(CAST(lx AS $dec) * lx)").as("sxx"),
      expr(s"sum(CAST(lx AS $dec) * ly)").as("sxy"))
      .selectExpr("n",
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS cxx",
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cxy",
        "CAST(sx AS DOUBLE) AS sxd", "CAST(sy AS DOUBLE) AS syd")
      .selectExpr("n", "cxy / cxx AS slope", "cxx", "sxd", "syd")
      .selectExpr("n",
        "CAST(round(slope * 1e9) AS BIGINT) AS slope_nano",
        "CAST(round((syd - slope * sxd) / n) AS BIGINT) AS intercept_nano")
  }

  val zipfSlopeOracle: String =
    s"""WITH v AS (SELECT term, count(*) AS tf FROM (
            SELECT unnest(${words("lower(text)", DuckD)}) AS term
            FROM documents) t
          GROUP BY term),
        ranked AS (SELECT
            CAST(round(ln(CAST(row_number() OVER (ORDER BY tf DESC, term) AS DOUBLE)) * 1e9) AS BIGINT) AS lx,
            CAST(round(ln(CAST(tf AS DOUBLE)) * 1e9) AS BIGINT) AS ly
          FROM v),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
            sum(CAST(lx AS HUGEINT) * lx) AS sxx,
            sum(CAST(lx AS HUGEINT) * ly) AS sxy
          FROM ranked),
        c AS (SELECT n,
            CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx AS cxx,
            CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy AS cxy,
            CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
          FROM m),
        sl AS (SELECT n, cxy / cxx AS slope, cxx, sxd, syd FROM c)
        SELECT n,
          CAST(round(slope * 1e9) AS BIGINT) AS slope_nano,
          CAST(round((syd - slope * sxd) / n) AS BIGINT) AS intercept_nano
        FROM sl"""

  // ---- Misra–Gries heavy-hitter discovery audit ----

  private val hhK = 64

  /** `text_heavyhitters_audit`: heavy-token DISCOVERY via the native
    * [[graft.functions.SpaceSavingAgg]] Misra–Gries aggregate
    * (`graft_heavyhitters`), audited against exact counts. The sketch
    * side never shuffles raw tokens — each task summarizes its slice
    * in 64 counters and 64 structs per task cross the wire; the exact
    * side is the one keyed aggregate the audit needs anyway.
    *
    * What the gate can honestly pin: MG counter VALUES are arrival-
    * order-dependent, but two bounds are theorems under ANY task
    * layout (the mergeable-summaries reduction — see the aggregate's
    * scaladoc): cnt ≤ true, and true − cnt ≤ n/(k+1), hence every
    * token with true count > n/(k+1) is retained. So the query emits
    * the EXACT-heavy tokens (exact·(k+1) > n, a deterministic set
    * with < k+1 members by pigeonhole) with exact counts and three
    * literal-1 flags — retained-in-sketch, no-overcount, slack-within-
    * bound (all integer cross-multiplied comparisons). A sketch bug
    * flips a flag and fails the hash compare at whatever partitioning
    * the driver runs. Tokens enter the sketch as xxhash64 keys
    * (64-bit: collision odds over a 10⁵ vocab ≈ 1e-10 — documented,
    * not handled). */
  def heavyHittersAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    val toks = Tables.documents(spark, dir)
      .select(explode(expr(words("lower(text)", SparkD))).as("term"))
      .selectExpr("term", "xxhash64(term) AS h")
    val sketch = toks
      .agg(expr(s"graft_heavyhitters(h, $hhK)").as("sk"))
      .selectExpr("explode(sk) AS e")
      .selectExpr("e.key AS h", "e.cnt AS cnt")
    val exact = toks.groupBy("term", "h").agg(count(lit(1)).as("exact_cnt"))
    // n_stream rides an INDEPENDENT one-row aggregate cross-joined to
    // the exact side — when it lived on the sketch rows, an
    // exact-heavy key MISSING from the sketch made n_stream NULL and
    // the heaviness filter dropped the row, so the in_sketch=0 flag
    // this audit exists for was unreachable: a retention bug would
    // have surfaced as a row-set mismatch, not a flipped flag
    // (ADVICE r8).
    exact
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("n_stream"))))
      .join(broadcast(sketch), Seq("h"), "left")
      .filter(expr(s"exact_cnt * ${hhK + 1} > n_stream"))
      .selectExpr("term", "CAST(exact_cnt AS BIGINT) AS exact_cnt",
        "CASE WHEN cnt IS NOT NULL THEN 1 ELSE 0 END AS in_sketch",
        "CASE WHEN cnt IS NOT NULL AND cnt <= exact_cnt THEN 1 ELSE 0 END " +
          "AS no_overcount",
        s"""CASE WHEN cnt IS NOT NULL
              AND (exact_cnt - cnt) * ${hhK + 1} <= n_stream
            THEN 1 ELSE 0 END AS slack_ok""")
      .orderBy(desc("exact_cnt"), asc("term"))
  }

  // ---- in-engine classifier TRAINING: exact-integer hard-sigmoid GD ----

  private val gdRounds = 16
  /** Hard-sigmoid slope divisor: p_micro = clamp(5e5 + s/2^10, 0, 1e6). */
  private val gdSlopeDiv = 1024L
  /** Damping divisor on the diagonal-Newton step (2 = half-steps). */
  private val gdDamp = 2L

  /** Per-doc integer feature/label projection for the GD trainer:
    * bias, capped token count, capped stopword-kind count, alphabetic
    * token share in milli — all exact BIGINTs off the one
    * [[gateRelation]] scan; label = the rule gate's verdict. */
  private def gdFeatExprs(d: Dialect): Seq[String] = Seq(
    "doc_id",
    "CAST(1 AS BIGINT) AS x0",
    "CAST(least(n_tokens, 1000) AS BIGINT) AS x1",
    "CAST(least(n_stop_kinds, 50) AS BIGINT) AS x2",
    s"CAST(${intDiv("(1000 * n_alpha_tokens)", "greatest(n_tokens, 1)", d)} AS BIGINT) AS x3",
    "CAST(pass AS BIGINT) AS y")

  /** The per-row signed error in MILLI units under weights (w0..w3) —
    * ONE expression text both engines run. Hard sigmoid instead of
    * the logistic: clamp(1/2 + s/2^10) is exact integer arithmetic
    * end to end, where exp() would put an iterated, amplified libm
    * divergence inside an 8-round recursion (the one place the
    * engine's no-libm-in-query rule is load-bearing rather than
    * stylistic). The milli downscale bounds Σ e·x at 1e6 per row, so
    * the gradient sum stays inside BIGINT to ~1e12 rows. */
  private def gdErrExpr(d: Dialect): String =
    intDiv(
      s"(least(1000000, greatest(0, 500000 + ${intDiv(
        "(w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3)", gdSlopeDiv.toString, d)})) " +
        "- y * 1000000)",
      "1000", d)

  /** One weight-update expression per feature: a DAMPED
    * DIAGONAL-NEWTON step (NLMS-style). Plain uniform-rate GD was
    * written first and REPLACED: the features span three orders of
    * magnitude (bias 1 vs alpha-share ~1000), so any single learning
    * rate either saturated the large features into a constant
    * predictor or froze the small ones — measured 38% then 62%
    * (= majority class) training accuracy on the fixture. The fix
    * preconditions each gradient by its feature's mean square q_i
    * (E[x_i²], exact integer, computed once and carried in the weight
    * row): for the quadratic region of the hard sigmoid this IS the
    * Newton step — the bias converges in one round — damped by 2 for
    * the clamped region. step_i = ((g_i/n)·1000·slope) / (q_i·damp),
    * all truncating integer division on both engines (Spark DIV;
    * DuckDB // — both truncate toward zero, verified on negatives). */
  private def gdStepExpr(i: Int, d: Dialect): String =
    s"w${i}o - ${intDiv(
      s"(${intDiv(s"g$i", "n", d)} * ${1000 * gdSlopeDiv})",
      s"(q${i}o * $gdDamp)", d)} AS w$i"

  /** `classifier_train_gd`: TRAIN a linear quality classifier inside
    * the engine — distill the rule-based [[qualityGate]] into four
    * interpretable weights by batch gradient descent, every round a
    * single map-side-combined aggregate over the feature relation
    * (the Pregel-shaped loop the PageRank/BPE/unigram-EM tiers
    * already use, applied to model fitting). State between rounds is
    * a ONE-ROW weight relation carried through
    * [[graft.ops.Checkpoints.cutRound]]; nothing is collected to the
    * driver and no step depends on partitioning — integer arithmetic
    * makes the whole 8-round trajectory bit-exact against the DuckDB
    * oracle's unrolled recurrence, which is the strongest correctness
    * statement a trainer can make (not "converges to similar loss":
    * IDENTICAL weights). Output: the four weights plus exact training
    * accuracy/positive-rate micros, as a (feature, value) ledger. */
  def classifierTrainGd(spark: SparkSession, dir: String): DataFrame = {
    val feats = gdFeats(spark, dir)
    feats.crossJoin(broadcast(gdTrainedWeights(spark, dir)))
      .selectExpr("w0", "w1", "w2", "w3", "y",
        "w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3 AS s")
      .agg(max("w0").as("w0"), max("w1").as("w1"),
        max("w2").as("w2"), max("w3").as("w3"),
        count(lit(1)).as("n"),
        sum(expr("CASE WHEN (s >= 0) = (y = 1) THEN 1 ELSE 0 END")).as("n_ok"),
        sum("y").as("n_pos"))
      .selectExpr(
        s"""stack(6,
             'w_bias', w0,
             'w_tokens_capped', w1,
             'w_stop_kinds_capped', w2,
             'w_alpha_milli', w3,
             'train_acc_micro', ${intDiv("(1000000 * n_ok)", "n", SparkD)},
             'train_pos_micro', ${intDiv("(1000000 * n_pos)", "n", SparkD)}
           ) AS (feature, value)""")
      .orderBy("feature")
  }

  private def gdFeats(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "gd_feats", dir) {
      gateRelation(spark, dir).selectExpr(gdFeatExprs(SparkD): _*)
    }

  /** The 16-round training loop, returning the ONE-ROW weight
    * relation — shared by the training readout and the corpus-apply
    * query (PlanCache key `gd_weights`). */
  private def gdTrainedWeights(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "gd_weights", dir) {
    val feats = gdFeats(spark, dir)
    // weight row carries the per-feature mean squares q_i — the
    // Newton preconditioner, computed once from the same scan
    var w = feats
      .agg(count(lit(1)).as("n"),
        sum(expr("x0 * x0")).as("s0"), sum(expr("x1 * x1")).as("s1"),
        sum(expr("x2 * x2")).as("s2"), sum(expr("x3 * x3")).as("s3"))
      .selectExpr(
        Seq("CAST(0 AS BIGINT) AS w0", "CAST(0 AS BIGINT) AS w1",
          "CAST(0 AS BIGINT) AS w2", "CAST(0 AS BIGINT) AS w3") ++
        (0 to 3).map(i =>
          s"greatest(${intDiv(s"s$i", "n", SparkD)}, 1) AS q$i"): _*)
    for (r <- 1 to gdRounds) {
      w = feats.crossJoin(broadcast(w))
        .selectExpr("w0", "w1", "w2", "w3", "q0", "q1", "q2", "q3",
          "x0", "x1", "x2", "x3", s"${gdErrExpr(SparkD)} AS e")
        .agg(max("w0").as("w0o"), max("w1").as("w1o"),
          max("w2").as("w2o"), max("w3").as("w3o"),
          max("q0").as("q0o"), max("q1").as("q1o"),
          max("q2").as("q2o"), max("q3").as("q3o"),
          count(lit(1)).as("n"),
          sum(expr("e * x0")).as("g0"), sum(expr("e * x1")).as("g1"),
          sum(expr("e * x2")).as("g2"), sum(expr("e * x3")).as("g3"))
        .selectExpr((0 to 3).map(gdStepExpr(_, SparkD)) ++
          (0 to 3).map(i => s"q${i}o AS q$i"): _*)
        .transform(graft.ops.Checkpoints.cutRound(_, r))
    }
    w
  }

  /** `classifier_train_apply`: close the train→apply loop — score the
    * WHOLE corpus with the learned weights and report the per-source
    * confusion matrix against the rule gate (the table that says
    * where the distilled model disagrees with its teacher, which is
    * where a human reviews before swapping the cheap model in). One
    * broadcast of the one-row weight relation, one scan, a
    * source-grain agg — inference is exactly as scalable as the gate
    * itself. */
  def classifierTrainApply(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    gdFeats(spark, dir)
      .crossJoin(broadcast(gdTrainedWeights(spark, dir)))
      .selectExpr("doc_id", "y",
        "CASE WHEN w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3 >= 0 THEN 1 ELSE 0 END AS pred")
      .join(src, Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END")).as("tp"),
        sum(expr("CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END")).as("fp"),
        sum(expr("CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END")).as("fn"),
        sum(expr("CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END")).as("tn"))
      .selectExpr("source", "n_docs", "tp", "fp", "fn", "tn",
        s"${intDiv("(1000000 * (tp + tn))", "n_docs", SparkD)} AS acc_micro")
      .orderBy("source")
  }

  /** Shared oracle CTE prefix: gate chain → feature projection →
    * initial weights → the unrolled 16-round recurrence, ending in
    * `gdw$gdRounds`. */
  private def gdOracleCtes: String = {
    val roundCtes = (1 to gdRounds).map { r =>
      s"""gdr$r AS (SELECT max(w0) AS w0o, max(w1) AS w1o,
             max(w2) AS w2o, max(w3) AS w3o,
             max(q0) AS q0o, max(q1) AS q1o,
             max(q2) AS q2o, max(q3) AS q3o,
             count(*) AS n,
             sum(e * x0) AS g0, sum(e * x1) AS g1,
             sum(e * x2) AS g2, sum(e * x3) AS g3
           FROM (SELECT w.w0, w.w1, w.w2, w.w3,
                   w.q0, w.q1, w.q2, w.q3,
                   f.x0, f.x1, f.x2, f.x3,
                   ${gdErrExpr(DuckD)} AS e
                 FROM gd_feats f CROSS JOIN gdw${r - 1} w)),
          gdw$r AS (SELECT ${(0 to 3).map(gdStepExpr(_, DuckD)).mkString(", ")},
              q0o AS q0, q1o AS q1, q2o AS q2, q3o AS q3
            FROM gdr$r)"""
    }.mkString(",\n        ")
    val qInit = (0 to 3).map(i =>
      s"greatest(${intDiv(s"sum(x$i * x$i)", "count(*)", DuckD)}, 1) AS q$i")
      .mkString(", ")
    s"""$gateCtes,
        gd_feats AS (SELECT ${gdFeatExprs(DuckD).mkString(", ")} FROM gate),
        gdw0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                        CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
                        $qInit
                 FROM gd_feats),
        $roundCtes"""
  }

  val classifierTrainGdOracle: String =
    s"""WITH $gdOracleCtes,
        fin AS (SELECT max(w.w0) AS w0, max(w.w1) AS w1,
            max(w.w2) AS w2, max(w.w3) AS w3,
            count(*) AS n,
            sum(CASE WHEN (f.x0 * w.w0 + f.x1 * w.w1 + f.x2 * w.w2
                  + f.x3 * w.w3 >= 0) = (f.y = 1)
                THEN 1 ELSE 0 END) AS n_ok,
            sum(f.y) AS n_pos
          FROM gd_feats f CROSS JOIN gdw$gdRounds w)
        SELECT feature, CAST(value AS BIGINT) AS value FROM (
          SELECT 'w_bias' AS feature, w0 AS value FROM fin
          UNION ALL SELECT 'w_tokens_capped', w1 FROM fin
          UNION ALL SELECT 'w_stop_kinds_capped', w2 FROM fin
          UNION ALL SELECT 'w_alpha_milli', w3 FROM fin
          UNION ALL SELECT 'train_acc_micro',
            ${intDiv("(1000000 * n_ok)", "n", DuckD)} FROM fin
          UNION ALL SELECT 'train_pos_micro',
            ${intDiv("(1000000 * n_pos)", "n", DuckD)} FROM fin)
        ORDER BY feature"""

  val classifierTrainApplyOracle: String =
    s"""WITH $gdOracleCtes,
        scored AS (SELECT f.doc_id, f.y,
            CASE WHEN f.x0 * w.w0 + f.x1 * w.w1 + f.x2 * w.w2
                   + f.x3 * w.w3 >= 0 THEN 1 ELSE 0 END AS pred
          FROM gd_feats f CROSS JOIN gdw$gdRounds w),
        conf AS (SELECT d.source,
            count(*) AS n_docs,
            CAST(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
            CAST(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
            CAST(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
            CAST(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM scored s JOIN documents d ON s.doc_id = d.doc_id
          GROUP BY d.source)
        SELECT source, n_docs, tp, fp, fn, tn,
          ${intDiv("(1000000 * (tp + tn))", "n_docs", DuckD)} AS acc_micro
        FROM conf ORDER BY source"""

  /** The oracle recomputes the deterministic part (exact-heavy set)
    * and asserts the theorem flags as literal 1s. */
  val heavyHittersAuditOracle: String =
    s"""WITH toks AS (SELECT unnest(${words("lower(text)", DuckD)}) AS term
          FROM documents),
        tf AS (SELECT term, count(*) AS exact_cnt FROM toks GROUP BY term),
        n AS (SELECT count(*) AS n_stream FROM toks)
        SELECT term, CAST(exact_cnt AS BIGINT) AS exact_cnt,
          1 AS in_sketch, 1 AS no_overcount, 1 AS slack_ok
        FROM tf, n WHERE exact_cnt * ${hhK + 1} > n_stream
        ORDER BY exact_cnt DESC, term"""
}
