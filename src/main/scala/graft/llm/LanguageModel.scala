package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Corpus n-gram language-model scoring — the classic perplexity-proxy
  * quality filter of LLM data pipelines (cf. CCNet-style "score every
  * document with a small LM, drop the tail"): build bigram statistics
  * over the WHOLE corpus, then score each document by the average
  * conditional probability of its own bigrams under that model.
  *
  * Determinism discipline: each conditional probability
  * p(w2|w1) = c(w1,w2)/c(w1·) is ONE double division of exact BIGINT
  * counts, immediately quantized to nano-units (round(1e9·p) — one
  * correctly-rounded IEEE op, identical in both engines); per-document
  * totals are then SUMS OF BIGINTS, order-independent under any
  * partitioning, and the readout divides once at the end. No float
  * accumulation anywhere (the same reasoning as the chi-square /
  * Kaplan-Meier queries: a float sum's value depends on partition
  * order, which a 1000-executor run cannot keep stable).
  *
  * Plan shape at scale: tokenization and bigram assembly are per-row
  * projections (array transform — NO self-join on position); bigram and
  * antecedent counts are two map-side-combined hash aggregations; each
  * document's bigrams then join the model on the bigram key (shuffle
  * equi-join; the model relation is vocabulary²-bounded, far smaller
  * than the corpus) and collapse back to doc grain in one more
  * map-side-combined agg. A production run would materialize the model
  * relation once (PlanCache.sideTable pattern) and prune it to the
  * top-M vocabulary; the join shape is unchanged.
  */
object LanguageModel {

  /** Per-doc bigram rows: (doc_id, bg) with bg = "w1 w2" — tokens are
    * whitespace-split lowercase (the corpus-wide convention shared
    * with vocabulary/topTerms, so the LM sees the same token stream
    * the tokenizer-training queries see). */
  private def bigramExpr(d: Dialect): String = {
    val w = words("lower(text)", d)
    d match {
      case SparkD =>
        s"CASE WHEN size($w) >= 2 THEN transform(sequence(0, size($w) - 2), " +
          s"i -> concat(element_at($w, i + 1), ' ', element_at($w, i + 2))) " +
          "ELSE array() END"
      case DuckD =>
        s"CASE WHEN len($w) >= 2 THEN list_transform(range(1, len($w)), " +
          s"i -> concat($w[i], ' ', $w[i + 1])) " +
          "ELSE [] END"
    }
  }

  /** First token of a bigram string (tokens never contain whitespace,
    * so the first space is the separator). */
  private def w1Of(bg: String, d: Dialect): String = d match {
    case SparkD => s"substring_index($bg, ' ', 1)"
    case DuckD  => s"split_part($bg, ' ', 1)"
  }

  /** Per-document average bigram probability under the corpus bigram
    * model, in nano-units. Documents with fewer than two tokens carry
    * zero bigrams and score NULL→0 through the left join, keeping the
    * operator total over the corpus. */
  def bigramScore(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(expr(bigramExpr(SparkD))).as("bg"))
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", expr(w1Of("bg", SparkD)))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val model = c2.join(c1, Seq("w1"))
      .selectExpr("bg",
        "CAST(round(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE) * 1e9) AS BIGINT) AS p_nano")
    val perDoc = bigrams.join(model, Seq("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_nano").as("p_sum"))
    Tables.documents(spark, dir).select("doc_id", "n_chars")
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams",
        "CAST(coalesce(p_sum, 0) AS BIGINT) AS p_sum_nano",
        """CASE WHEN coalesce(n_bigrams, 0) > 0
             THEN (CAST(p_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) / 1e9
             ELSE CAST(0 AS DOUBLE) END AS avg_bigram_prob""")
      .orderBy("doc_id")
  }

  // ---- inverted index ----

  private val postingK = 20

  /** Inverted-index build for the corpus's heaviest terms: per term,
    * document frequency, total term frequency, and the posting list
    * rendered as a canonical "doc:tf" string in doc_id order — the
    * search-index primitive (and the retrieval side of RAG data prep).
    *
    * Posting lists ARE the partitioning story: the index shuffles once
    * on the term key, each term's postings assemble independently, and
    * the per-term row is as large as that term's corpus footprint —
    * which is why real indexes shard exactly this way. The canonical
    * string form (sort_array before join vs string_agg ORDER BY) makes
    * the whole list one hash-comparable value, the same trick the
    * supplier-roster query pins. */
  def postingLists(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("total_tf"),
        expr("""array_join(transform(
                  sort_array(collect_list(struct(doc_id AS d, tf AS t))),
                  s -> concat(s.d, ':', s.t)), ',')""").as("postings"))
      .orderBy(desc("df"), asc("term"))
      .limit(postingK)
      .selectExpr("term", "df", "CAST(total_tf AS BIGINT) AS total_tf",
        "postings")
  }

  val postingListsOracle: String =
    s"""WITH tf_t AS (
          SELECT term, doc_id, count(*) AS tf FROM (
            SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS term
            FROM documents)
          GROUP BY term, doc_id)
        SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
          string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        FROM tf_t GROUP BY term
        ORDER BY df DESC, term LIMIT $postingK"""

  // ---- BM25 ranking ----

  private val bm25K = 20

  /** BM25 retrieval scoring against the corpus's own top-3 terms (a
    * deterministic stand-in for a user query): the standard Okapi
    * formula with k1=1.2, b=0.75, idf = ln(1 + (N−df+0.5)/(df+0.5)).
    * Each (doc, term) score is ONE fixed IEEE tree over exact integer
    * inputs (tf, df, N, dl, Σdl — length normalization uses
    * dl·N/Σdl, the exact-rational form of dl/avgdl), quantized to
    * nano-units immediately (ln() wobbles by 1 ulp between engines on
    * rare inputs — the weighted-sample lesson — and quantization
    * confines that to rounding-boundary coincidences); per-document
    * totals are order-independent BIGINT sums.
    *
    * Plan shape: the query-term relation (3 rows) and the two global
    * scalars broadcast; scoring touches only the tf rows of query
    * terms (semi-join on the term key); the readout is one top-k.
    * That is the BM25 serving shape at any corpus size — score only
    * the postings of queried terms, never the corpus. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val globals = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val qterms = dfT.orderBy(desc("df"), asc("term")).limit(3)
    val termScore =
      """CAST(round(
           ln(CAST(1 AS DOUBLE)
              + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
           * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
             / (CAST(tf AS DOUBLE)
                + CAST(1.2 AS DOUBLE)
                  * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE)
                       * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
                          / CAST(sum_dl AS DOUBLE))))
           * 1e9) AS BIGINT)"""
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(globals))
      .selectExpr("doc_id", s"$termScore AS s_nano")
      .groupBy("doc_id").agg(sum("s_nano").as("score_nano"))
      .orderBy(desc("score_nano"), asc("doc_id"))
      .limit(bm25K)
      .selectExpr("doc_id", "CAST(score_nano AS BIGINT) AS score_nano",
        "CAST(score_nano AS DOUBLE) / 1e9 AS bm25")
  }

  val bm25TopKOracle: String =
    s"""WITH toks AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS term
          FROM documents),
        tf_t AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        df_t AS (SELECT term, count(*) AS df FROM tf_t GROUP BY term),
        dl_t AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        g AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl_t),
        q AS (SELECT term, df FROM df_t ORDER BY df DESC, term LIMIT 3),
        scored AS (
          SELECT tf_t.doc_id,
            CAST(round(
              ln(CAST(1 AS DOUBLE)
                 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
              * (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE)))
                / (CAST(tf AS DOUBLE)
                   + CAST(1.2 AS DOUBLE)
                     * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE)
                          * (CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE)
                             / CAST(sum_dl AS DOUBLE))))
              * 1e9) AS BIGINT) AS s_nano
          FROM tf_t JOIN q USING (term)
          JOIN dl_t ON tf_t.doc_id = dl_t.doc_id
          CROSS JOIN g)
        SELECT doc_id, CAST(sum(s_nano) AS BIGINT) AS score_nano,
          CAST(sum(s_nano) AS DOUBLE) / 1e9 AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY score_nano DESC, doc_id LIMIT $bm25K"""

  // ---- BPE merge-step candidates ----

  private val bpeTopK = 10

  /** One step of byte-pair-encoding training, relationally: the
    * corpus-frequency-weighted count of every ADJACENT character pair
    * inside words, ranked — the argmax is exactly the merge BPE would
    * perform next, and the top-k is the candidate list. Training loops
    * this (merge, re-pair, recount); each iteration is the same two
    * hash aggregations, so the loop is as distributable as its worst
    * agg. Works on the distinct-word relation weighted by word
    * frequency (vocabulary-sized, NOT corpus-sized — the standard BPE
    * trick: pair counts collapse over word types, then scale by type
    * frequency). Pairs come from fixed substr arithmetic (words are
    * short; identical spelling on both engines). */
  def bpeMergeStep(spark: SparkSession, dir: String): DataFrame = {
    val pairsOf =
      "transform(sequence(1, length(word) - 1), " +
        "i -> concat(substr(word, i, 1), substr(word, i + 1, 1)))"
    val wordFreq = Tables.documents(spark, dir)
      .select(explode(expr(words("lower(text)", SparkD))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
    wordFreq
      .select(col("wf"), explode(expr(pairsOf)).as("pair"))
      .groupBy("pair").agg(sum("wf").as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(bpeTopK)
      .withColumn("merge_rank", expr("row_number() OVER (ORDER BY n DESC, pair)"))
      .selectExpr("merge_rank", "pair", "CAST(n AS BIGINT) AS n")
      .orderBy("merge_rank")
  }

  val bpeMergeStepOracle: String =
    s"""WITH wf_t AS (
          SELECT word, count(*) AS wf FROM (
            SELECT unnest(${words("lower(text)", DuckD)}) AS word
            FROM documents)
          GROUP BY word HAVING length(word) >= 2),
        pairs AS (
          SELECT wf, unnest(list_transform(range(1, length(word)),
            i -> substr(word, i, 1) || substr(word, i + 1, 1))) AS pair
          FROM wf_t),
        counts AS (
          SELECT pair, sum(wf) AS n FROM pairs GROUP BY pair
          ORDER BY n DESC, pair LIMIT $bpeTopK)
        SELECT row_number() OVER (ORDER BY n DESC, pair) AS merge_rank,
          pair, CAST(n AS BIGINT) AS n
        FROM counts ORDER BY merge_rank"""

  // ---- iterated BPE training (k merge rounds) ----

  private val bpeRounds = 4

  /** Per-round CTE block — DIALECT-FREE SQL (windows, gaps-and-islands,
    * NOT EXISTS, LIMIT all parse identically in Spark and DuckDB), so
    * Spark executes literally the same text the oracle runs. Round r
    * over `seq_${r-1}(word, wf, pos, tok)`:
    *   adj   — each token with its successor (lead over position);
    *   win   — the argmax pair by frequency-weighted count, total
    *           tie order (n DESC, left, right): THE merge BPE performs;
    *   cand  — occurrences of the winning pair;
    *   isl   — maximal runs of overlapping occurrences ("aaaa" has
    *           candidates at 1,2,3 but only 1-2 and 3-4 merge): break
    *           when this candidate's position is not the previous
    *           candidate's partner;
    *   keep  — greedy leftmost-first within each run = odd row_number;
    *   seq_r — heads take the concatenated token, consumed partners
    *           vanish (NOT EXISTS), everyone else passes through.
    * Gaps in `pos` after a merge are harmless: adjacency is always
    * "next surviving position", via lead. */
  private def bpeRoundCtes(r: Int): String = {
    val p = r - 1
    s"""adj_$r AS (SELECT word, wf, pos, tok,
          lead(pos) OVER (PARTITION BY word ORDER BY pos) AS npos,
          lead(tok) OVER (PARTITION BY word ORDER BY pos) AS ntok
        FROM seq_$p),
       win_$r AS (SELECT tok AS wl, ntok AS wr, sum(wf) AS n
        FROM adj_$r WHERE ntok IS NOT NULL GROUP BY tok, ntok
        ORDER BY n DESC, wl, wr LIMIT 1),
       cand_$r AS (SELECT a.word, a.wf, a.pos, a.tok, a.npos, a.ntok
        FROM adj_$r a JOIN win_$r w ON a.tok = w.wl AND a.ntok = w.wr),
       isl_$r AS (SELECT *, CASE WHEN
          lag(npos) OVER (PARTITION BY word ORDER BY pos) = pos
          THEN 0 ELSE 1 END AS brk FROM cand_$r),
       isl2_$r AS (SELECT *, sum(brk) OVER (PARTITION BY word ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl_$r),
       keep_$r AS (SELECT * FROM (SELECT *, row_number() OVER
          (PARTITION BY word, island ORDER BY pos) AS rn FROM isl2_$r)
        WHERE rn % 2 = 1),
       seq_$r AS (SELECT s.word, s.wf, s.pos,
          CASE WHEN k.pos IS NOT NULL THEN concat(s.tok, k.ntok)
               ELSE s.tok END AS tok
        FROM seq_$p s
        LEFT JOIN keep_$r k ON s.word = k.word AND s.pos = k.pos
        WHERE NOT EXISTS (SELECT 1 FROM keep_$r x
          WHERE x.word = s.word AND x.npos = s.pos))"""
  }

  /** Full ORACLE SQL (DuckDB): base char-level sequence per DISTINCT
    * word weighted by type frequency (vocabulary-sized, the standard
    * BPE trick), then [[bpeRounds]] unrolled rounds, then the learned
    * merge table. DuckDB materializes each CTE once, so the
    * unrolled-text form is fine there; the Spark side runs the SAME
    * per-round relational steps as a checkpointed loop instead
    * ([[bpeTrain]]) because an inlined CTE chain re-evaluates
    * `seq_{r-1}` twice per round — 2^k recomputation of the base. */
  /** Base + all round CTEs (no final SELECT) — shared by the trainer
    * and encoder oracles. */
  private def bpeCtes(docsRel: String): String = {
    val base =
      s"""wf_t AS (SELECT word, count(*) AS wf FROM (
            SELECT unnest(${words("lower(text)", DuckD)}) AS word
            FROM $docsRel)
          GROUP BY word HAVING length(word) >= 2),
         pos_t AS (SELECT word, wf,
            unnest(range(1, length(word) + 1)) AS pos FROM wf_t),
         seq_0 AS (SELECT word, wf, pos, substr(word, pos, 1) AS tok
            FROM pos_t)"""
    val rounds = (1 to bpeRounds).map(bpeRoundCtes).mkString(",\n")
    s"$base,\n$rounds"
  }

  private def bpeTrainSql(docsRel: String): String = {
    val table = (1 to bpeRounds).map(r =>
      s"""SELECT $r AS merge_rank, wl AS left_tok, wr AS right_tok,
            concat(wl, wr) AS merged, CAST(n AS BIGINT) AS n
          FROM win_$r""").mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes(docsRel)},
        merges AS ($table)
        SELECT CAST(merge_rank AS INTEGER) AS merge_rank, left_tok,
          right_tok, merged, n
        FROM merges ORDER BY merge_rank"""
  }

  /** One merge round over `seq(word, wf, pos, tok)` — the DataFrame
    * form of [[bpeRoundCtes]], expression-for-expression. Returns the
    * merged sequence (checkpointed by the caller) and the one-row
    * winner relation. */
  private def bpeRound(seq: DataFrame): (DataFrame, DataFrame) = {
    val adj = seq.selectExpr("word", "wf", "pos", "tok",
      "lead(pos) OVER (PARTITION BY word ORDER BY pos) AS npos",
      "lead(tok) OVER (PARTITION BY word ORDER BY pos) AS ntok")
    val win = adj.filter("ntok IS NOT NULL")
      .groupBy("tok", "ntok").agg(sum("wf").as("n"))
      .orderBy(desc("n"), asc("tok"), asc("ntok")).limit(1)
      .selectExpr("tok AS wl", "ntok AS wr", "n")
    val cand = adj.join(broadcast(win),
        col("tok") === col("wl") && col("ntok") === col("wr"))
      .select("word", "wf", "pos", "tok", "npos", "ntok")
    val keep = cand
      .selectExpr("*",
        "CASE WHEN lag(npos) OVER (PARTITION BY word ORDER BY pos) = pos " +
          "THEN 0 ELSE 1 END AS brk")
      .selectExpr("*",
        "sum(brk) OVER (PARTITION BY word ORDER BY pos " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island")
      .selectExpr("*",
        "row_number() OVER (PARTITION BY word, island ORDER BY pos) AS rn")
      .filter("rn % 2 = 1")
    val heads = keep.selectExpr("word AS hw", "pos AS hp", "ntok AS hn")
    val partners = keep.selectExpr("word AS pw", "npos AS pp")
    val next = seq
      .join(partners, col("word") === col("pw") && col("pos") === col("pp"),
        "left_anti")
      .join(heads, col("word") === col("hw") && col("pos") === col("hp"),
        "left_outer")
      .selectExpr("word", "wf", "pos",
        "CASE WHEN hp IS NOT NULL THEN concat(tok, hn) ELSE tok END AS tok")
    (next, win)
  }

  /** BPE tokenizer TRAINING as a distributed relational computation:
    * [[bpeRounds]] greedy merges with exact reference semantics —
    * overlapping pair counts, frequency-weighted over word TYPES, and
    * leftmost-first merging inside runs (the "aaaa" case) via
    * gaps-and-islands — each round two window passes and two
    * vocabulary-sized joins, `localCheckpoint` bounding the plan like
    * the PageRank loop (without it the lineage re-derives the base
    * 2^k times). Nothing touches the corpus after the initial
    * word-frequency aggregate: tokenizer-training state is the
    * VOCABULARY, not the corpus — why this is cheap even at 100 TB.
    * The output is the trained artifact itself, the ordered merge
    * table; the DuckDB oracle runs the same relational steps as one
    * unrolled CTE chain. */
  /** Run the training rounds; returns (per-round winner tables, final
    * per-word-type token sequence). The final sequence IS the encoded
    * form of every word type — [[bpeEncode]] reuses it. */
  private def bpeTrainRounds(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) = {
    val base = Tables.documents(spark, dir)
      .select(explode(expr(words("lower(text)", SparkD))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .selectExpr("word", "wf", "explode(sequence(1, length(word))) AS pos")
      .selectExpr("word", "wf", "pos", "substr(word, pos, 1) AS tok")
    var seq = base.transform(graft.ops.Checkpoints.cut)
    val wins = (1 to bpeRounds).map { r =>
      val (next, win) = bpeRound(seq)
      seq = next.transform(graft.ops.Checkpoints.cutRound(_, r))
      win.selectExpr(s"CAST($r AS INTEGER) AS merge_rank",
        "wl AS left_tok", "wr AS right_tok",
        "concat(wl, wr) AS merged", "CAST(n AS BIGINT) AS n")
        .transform(graft.ops.Checkpoints.cut) // pin the winner BEFORE the next round mutates lineage
    }
    (wins, seq)
  }

  /** The two trained artifacts, session-cached from ONE run of the
    * training rounds: the ordered merge table and the final
    * per-word-type token sequence. Training cost is 16 rounds of
    * eager lineage cuts — tiny data, real latency — paid once per
    * bench session instead of once per consumer (bpeTrain, bpeEncode,
    * tokenizerFertility); both relations come back already
    * lineage-cut, so the memo needs no persist. Verify still measures
    * the cold path (PlanCache is off there). */
  private def bpeArtifacts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    graft.PlanCache.memo[(DataFrame, DataFrame)](spark, "bpe_artifacts", dir,
      alive = t => !t._1.sparkSession.sparkContext.isStopped) {
      val (wins, seq) = bpeTrainRounds(spark, dir)
      (wins.reduce(_.unionByName(_)), seq)
    }

  private def bpeMergesCached(spark: SparkSession, dir: String): DataFrame =
    bpeArtifacts(spark, dir)._1

  private def bpeSeqCached(spark: SparkSession, dir: String): DataFrame =
    bpeArtifacts(spark, dir)._2

  def bpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeMergesCached(spark, dir).orderBy("merge_rank")

  val bpeTrainOracle: String = bpeTrainSql("documents")

  /** APPLY the trained tokenizer — per-document token count and
    * compression under the [[bpeRounds]]-merge vocabulary. Encoding
    * happens on word TYPES (the final training sequence already IS
    * each type's encoded form — vocabulary-sized state again), then
    * one equi-join scores every corpus word occurrence; a document's
    * token count is an exact integer sum. Single-char words never
    * entered training (length ≥ 2 filter) and encode as one token —
    * the coalesce. Compression = alphabetic chars per token, THE
    * number a tokenizer is judged by, here per doc so quality
    * filtering can use it (pathological text compresses badly). */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val typeToks = bpeSeqCached(spark, dir)
      .groupBy("word").agg(count(lit(1)).as("n_toks"))
      .selectExpr("word AS tw", "n_toks")
    val docWords = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"explode(${words("lower(text)", SparkD)}) AS word")
    docWords
      .join(typeToks, col("word") === col("tw"), "left_outer")
      .selectExpr("doc_id", "CAST(length(word) AS BIGINT) AS wlen",
        "CAST(coalesce(n_toks, 1) AS BIGINT) AS wtoks")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("wlen")).as("n_chars_alpha"),
        sum(col("wtoks")).as("n_tokens"))
      .selectExpr("doc_id", "n_words", "n_chars_alpha", "n_tokens",
        "CAST(n_chars_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token")
      .orderBy("doc_id")
  }

  val bpeEncodeOracle: String = {
    s"""WITH ${bpeCtes("documents")},
        enc AS (SELECT word, count(*) AS n_toks FROM seq_$bpeRounds
          GROUP BY word),
        dw AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS word
          FROM documents),
        scored AS (SELECT dw.doc_id,
            CAST(length(dw.word) AS BIGINT) AS wlen,
            CAST(coalesce(enc.n_toks, 1) AS BIGINT) AS wtoks
          FROM dw LEFT JOIN enc ON dw.word = enc.word)
        SELECT doc_id, count(*) AS n_words,
          CAST(sum(wlen) AS BIGINT) AS n_chars_alpha,
          CAST(sum(wtoks) AS BIGINT) AS n_tokens,
          CAST(sum(wlen) AS DOUBLE) / CAST(sum(wtoks) AS DOUBLE)
            AS chars_per_token
        FROM scored GROUP BY doc_id ORDER BY doc_id"""
  }

  /** `text_tokenizer_fertility`: tokens-per-word and chars-per-token
    * of the trained BPE vocabulary, split by document language — the
    * tokenizer-bias readout multilingual pipelines run before fixing a
    * vocabulary (a language whose fertility is 2× pays 2× the context
    * budget per word; cf. the fertility tables in the XLM-R / NLLB
    * tokenizer analyses). Same relations as [[bpeEncode]] — the
    * vocabulary is type-level and tiny, the per-word join is a
    * broadcast, the per-lang rollup is a 5-row partial agg — with the
    * doc grain swapped for the language grain and exact integer
    * sufficient statistics all the way to the two readout divisions. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val typeToks = bpeSeqCached(spark, dir)
      .groupBy("word").agg(count(lit(1)).as("n_toks"))
      .selectExpr("word AS tw", "n_toks")
    Tables.documents(spark, dir)
      .selectExpr("lang", s"explode(${words("lower(text)", SparkD)}) AS word")
      .join(typeToks, col("word") === col("tw"), "left_outer")
      .selectExpr("lang", "CAST(length(word) AS BIGINT) AS wlen",
        "CAST(coalesce(n_toks, 1) AS BIGINT) AS wtoks")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum(col("wlen")).as("n_chars"),
        sum(col("wtoks")).as("n_tokens"))
      .selectExpr("lang", "n_words", "n_chars", "n_tokens",
        "CAST(n_tokens AS DOUBLE) / n_words AS fertility",
        "CAST(n_chars AS DOUBLE) / n_tokens AS chars_per_token")
      .orderBy("lang")
  }

  val tokenizerFertilityOracle: String =
    s"""WITH ${bpeCtes("documents")},
        enc AS (SELECT word, count(*) AS n_toks FROM seq_$bpeRounds
          GROUP BY word),
        dw AS (SELECT lang, unnest(${words("lower(text)", DuckD)}) AS word
          FROM documents),
        scored AS (SELECT dw.lang,
            CAST(length(dw.word) AS BIGINT) AS wlen,
            CAST(coalesce(enc.n_toks, 1) AS BIGINT) AS wtoks
          FROM dw LEFT JOIN enc ON dw.word = enc.word)
        SELECT lang, count(*) AS n_words,
          CAST(sum(wlen) AS BIGINT) AS n_chars,
          CAST(sum(wtoks) AS BIGINT) AS n_tokens,
          CAST(sum(wtoks) AS DOUBLE) / count(*) AS fertility,
          CAST(sum(wlen) AS DOUBLE) / CAST(sum(wtoks) AS BIGINT) AS chars_per_token
        FROM scored GROUP BY lang ORDER BY lang"""

  val bigramScoreOracle: String = {
    val d = DuckD
    s"""WITH bigrams AS (
          SELECT doc_id, unnest(${bigramExpr(d)}) AS bg FROM documents),
        c2_t AS (SELECT bg, count(*) AS c2 FROM bigrams GROUP BY bg),
        c2w AS (SELECT bg, c2, ${w1Of("bg", d)} AS w1 FROM c2_t),
        c1_t AS (SELECT w1, sum(c2) AS c1 FROM c2w GROUP BY w1),
        model AS (SELECT bg,
            CAST(round(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE) * 1e9) AS BIGINT) AS p_nano
          FROM c2w JOIN c1_t USING (w1)),
        per_doc AS (SELECT doc_id, count(*) AS n_bigrams, sum(p_nano) AS p_sum
          FROM bigrams JOIN model USING (bg) GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(coalesce(p_sum, 0) AS BIGINT) AS p_sum_nano,
          CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN (CAST(p_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) / 1e9
            ELSE CAST(0 AS DOUBLE) END AS avg_bigram_prob
        FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
        ORDER BY d.doc_id"""
  }

  // ---- Kneser-Ney smoothed bigram model ----

  /** Second token of a bigram string (exactly one space by
    * construction — tokens never contain whitespace). */
  private def w2Of(bg: String, d: Dialect): String = d match {
    case SparkD => s"substring_index($bg, ' ', -1)"
    case DuckD  => s"split_part($bg, ' ', 2)"
  }

  /** Interpolated Kneser-Ney probability of one bigram TYPE, as one
    * fixed arithmetic tree over exact BIGINT inputs, nano-quantized:
    *   p_kn(w2|w1) = max(c2 − D, 0)/c1 + (D·n1f/c1)·(n1b/T)
    * with absolute discount D = 0.75, c2 = c(w1 w2), c1 = c(w1 ·),
    * n1f = |{w : c(w1 w) > 0}| (types following w1 — the backoff
    * weight's numerator), n1b = |{w : c(w w2) > 0}| (types preceding
    * w2 — the CONTINUATION count that distinguishes KN from plain
    * backoff: "francisco" is frequent but follows almost nothing), and
    * T = total distinct bigram types. Both engines evaluate the
    * identical expression text over identical integers, so every IEEE
    * op is the same correctly-rounded op → identical doubles →
    * identical nano quantization (the [[bigramScore]] discipline,
    * extended from one division to a fixed tree). */
  private def knExpr(c2: String, c1: String, n1f: String, n1b: String,
      tt: String): String =
    s"""CAST(round((greatest(CAST($c2 AS DOUBLE) - 0.75, CAST(0 AS DOUBLE))
          / CAST($c1 AS DOUBLE)
          + 0.75 * CAST($n1f AS DOUBLE) / CAST($c1 AS DOUBLE)
            * (CAST($n1b AS DOUBLE) / CAST($tt AS DOUBLE))) * 1e9) AS BIGINT)"""
      .replaceAll("\\s+", " ")

  /** Per-document average interpolated Kneser-Ney bigram probability —
    * the smoothed upgrade of [[bigramScore]] and the model family real
    * perplexity-based quality filters actually use (raw MLE assigns
    * p=0 to any unseen continuation; KN redistributes discount mass by
    * continuation DIVERSITY, so formulaic boilerplate — high raw
    * probability, low continuation diversity — scores differently from
    * fluent prose, which is exactly the signal a corpus filter wants).
    *
    * Plan shape at scale (same skeleton as [[bigramScore]]): bigram
    * assembly is a per-row projection; the model is built from the
    * bigram-TYPE relation (vocabulary-bounded, far smaller than the
    * corpus) with two map-side-combined aggs — one per antecedent
    * (c1 and n1f fused in a single groupBy) and one per continuation
    * (n1b) — plus a one-row type-count broadcast; scoring is one
    * shuffle equi-join of the corpus bigrams against the model and one
    * map-side-combined collapse to doc grain. Nothing corpus-sized is
    * broadcast; nothing is iterated. */
  def knBigramScore(spark: SparkSession, dir: String): DataFrame =
    // session-cached: the model build is the expensive part and has two
    // consumers (this readout and Curation.perplexityBuckets' terciles)
    graft.PlanCache(spark, "kn_doc_scores", dir) {
      knBigramScoreDf(Tables.documents(spark, dir))
    }

  /** [[knBigramScore]] over an explicit (doc_id, text) relation —
    * exposed for the hand-computed truth-table spec. */
  private[graft] def knBigramScoreDf(docs: DataFrame): DataFrame = {
    val bigrams = docs
      .select(col("doc_id"), explode(expr(bigramExpr(SparkD))).as("bg"))
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c2"))
      .withColumn("w1", expr(w1Of("bg", SparkD)))
      .withColumn("w2", expr(w2Of("bg", SparkD)))
    val fwd = c2.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1f"))
    val bwd = c2.groupBy("w2").agg(count(lit(1)).as("n1b"))
    val types = c2.agg(count(lit(1)).as("tt"))
    val model = c2.join(fwd, Seq("w1")).join(bwd, Seq("w2"))
      .crossJoin(broadcast(types))
      .selectExpr("bg", s"${knExpr("c2", "c1", "n1f", "n1b", "tt")} AS p_nano")
    val perDoc = bigrams.join(model, Seq("bg"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p_nano").as("p_sum"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams",
        "CAST(coalesce(p_sum, 0) AS BIGINT) AS kn_sum_nano",
        """CASE WHEN coalesce(n_bigrams, 0) > 0
             THEN (CAST(p_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) / 1e9
             ELSE CAST(0 AS DOUBLE) END AS avg_kn_prob""")
      .orderBy("doc_id")
  }

  val knBigramScoreOracle: String = {
    val d = DuckD
    s"""WITH bigrams AS (
          SELECT doc_id, unnest(${bigramExpr(d)}) AS bg FROM documents),
        c2_t AS (SELECT bg, count(*) AS c2 FROM bigrams GROUP BY bg),
        c2w AS (SELECT bg, c2, ${w1Of("bg", d)} AS w1, ${w2Of("bg", d)} AS w2
          FROM c2_t),
        fwd AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM c2w GROUP BY w1),
        bwd AS (SELECT w2, count(*) AS n1b FROM c2w GROUP BY w2),
        types_t AS (SELECT count(*) AS tt FROM c2_t),
        model AS (SELECT bg,
            ${knExpr("c2", "c1", "n1f", "n1b", "tt")} AS p_nano
          FROM c2w JOIN fwd USING (w1) JOIN bwd USING (w2) CROSS JOIN types_t),
        per_doc AS (SELECT doc_id, count(*) AS n_bigrams, sum(p_nano) AS p_sum
          FROM bigrams JOIN model USING (bg) GROUP BY doc_id)
        SELECT d.doc_id,
          CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
          CAST(coalesce(p_sum, 0) AS BIGINT) AS kn_sum_nano,
          CASE WHEN coalesce(n_bigrams, 0) > 0
            THEN (CAST(p_sum AS DOUBLE) / CAST(n_bigrams AS DOUBLE)) / 1e9
            ELSE CAST(0 AS DOUBLE) END AS avg_kn_prob
        FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
        ORDER BY d.doc_id"""
  }

  // ---- unigram-LM (SentencePiece-style) Viterbi segmentation ----

  private val uniMaxLen = 16   // DP round budget; longer words excluded
  private val uniMaxPiece = 4  // candidate piece length cap
  private val uniMinCount = 5  // piece vocabulary floor (chars always kept)
  private val uniSentinel = -900000000000000000L

  /** Unigram-LM tokenizer segmentation (Kudo 2018, the SentencePiece
    * model family) as a distributed relational DP — the third member
    * of the tokenizer tier after BPE train/encode: a piece vocabulary
    * is seeded from frequency-weighted substrings (length ≤ 4, count
    * ≥ 5, single chars always kept so segmentation is TOTAL), scored
    * with nano-quantized log-probabilities, and each word type gets
    * its max-likelihood segmentation by Viterbi over character
    * positions.
    *
    * The DP runs as [[uniMaxLen]] bounded relational rounds (the
    * [[bpeTrainRounds]] discipline): round i computes packed(i) — the
    * best score for the first i chars — from the previous four
    * positions via four vocabulary lookups; state is ONE ROW PER WORD
    * TYPE with the last four DP values as columns, so nothing in the
    * loop ever exceeds the vocabulary grain and the corpus is touched
    * exactly once (the word-frequency aggregate). Lineage is cut per
    * round ([[graft.ops.Checkpoints]]).
    *
    * Exactness: scores and the tie-break ride ONE BIGINT — packed =
    * 64·Σ lnp_nano − n_pieces — so "max score, then fewest pieces" is
    * a single integer max (scores are integral nanos, so distinct
    * scores differ by ≥ 64 after scaling and the piece count ≤ 16
    * can never flip an order; both engines unpack with the same
    * truncated-% arithmetic on negative values). */
  // uniTypes/uniVocab/emUsedCounts carry eager lineage cuts, so every
  // CALL materializes (viterbi, em_step, prune_iter and the forward
  // cache each re-derived the word-type table per query). Session-
  // cached like the other staged relations; Verify still measures the
  // cold path (PlanCache off there).
  private def uniTypes(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "uni_types", dir) {
      import graft.ops.Checkpoints
      Tables.documents(spark, dir)
        .select(explode(expr(words("lower(text)", SparkD))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("wf"))
        .filter(s"length(word) BETWEEN 1 AND $uniMaxLen")
        .selectExpr("word", "wf", "CAST(length(word) AS INT) AS len")
        .transform(Checkpoints.cut)
    }

  /** Piece vocabulary with counts AND nano log-probs (see
    * [[unigramViterbi]] doc for the seeding rule). */
  private def uniVocab(types: DataFrame): DataFrame = {
    import graft.ops.Checkpoints
    val occ = types
      .selectExpr("word", "wf", "len",
        "explode(sequence(1, len)) AS pos")
      .selectExpr(Seq("wf") ++ (1 to uniMaxPiece).map(l =>
        s"CASE WHEN pos + $l - 1 <= len THEN substr(word, pos, $l) END AS pc_$l"): _*)
      .selectExpr("wf", s"stack($uniMaxPiece, " +
        (1 to uniMaxPiece).map(l => s"pc_$l").mkString(", ") + ") AS piece")
      .filter("piece IS NOT NULL")
    val counts = occ.groupBy("piece").agg(sum("wf").as("cnt"))
      .filter(s"cnt >= $uniMinCount OR length(piece) = 1")
    counts
      .join(broadcast(counts.agg(sum("cnt").as("tot"))))
      .selectExpr("piece", "cnt",
        "CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano")
      .transform(Checkpoints.cut)
  }

  /** Forward Viterbi DP (see [[unigramViterbi]]); the result carries
    * best_final plus per-position ARGMAX columns al1..al16 (smallest
    * piece length achieving the max at each position — the backtrack
    * pointers, so [[unigramEmStep]] never touches the vocabulary
    * again). */
  private def uniForward(types: DataFrame, vocab: DataFrame): DataFrame = {
    import graft.ops.Checkpoints
    // r13 optimization: the per-position piece lookups used to be up
    // to FOUR broadcast hash joins per round — and because every
    // round is lineage-cut, none of those 64 broadcast builds could
    // be reused across rounds (measured: the 16-round chain was
    // ~4.5 s of job latency at sf0.1). The vocabulary is folded ONCE
    // into a one-row piece→lnp_nano map relation (itself cut, so the
    // per-round broadcast build is a 1-row collect) and each round
    // attaches it with one trivial cross-join; lookups become
    // element_at expressions — NULL on a missing key, exactly the
    // left-outer join's semantics, so every DP value is unchanged.
    // The map is vocabulary-sized (the same bound the broadcast hash
    // relations already assumed).
    val vmapRel = Checkpoints.cut(vocab.agg(
      org.apache.spark.sql.functions.map_from_entries(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct(
            col("piece"), col("lnp_nano")))).as("vmap")))
    var dp = types.selectExpr("word", "wf", "len",
      "CAST(0 AS BIGINT) AS pm1", "CAST(NULL AS BIGINT) AS pm2",
      "CAST(NULL AS BIGINT) AS pm3", "CAST(NULL AS BIGINT) AS pm4",
      "CAST(NULL AS BIGINT) AS best_final")
    for (i <- 1 to uniMaxLen) {
      val ls = (1 to uniMaxPiece).filter(_ <= i)
      // two-stage projection inside the round: lnp_l columns first
      // (each map probe evaluated once), then the CASE tree over them
      // — the same column boundary the joins used to provide
      val r = dp.crossJoin(broadcast(vmapRel))
        .selectExpr(Seq("*") ++ ls.map(l =>
          s"element_at(vmap, substr(word, ${i - l + 1}, $l)) AS lnp_$l"): _*)
      val terms = ls.map(l =>
        s"coalesce(pm$l + 64 * lnp_$l - 1, CAST($uniSentinel AS BIGINT))")
      val best = if (terms.size == 1) terms.head
        else s"greatest(${terms.mkString(", ")})"
      val newp = s"CASE WHEN $i <= len THEN $best END"
      val argl = "CASE WHEN " + ls.map(l =>
        s"${terms(ls.indexOf(l))} = ($best) THEN $l").mkString(" WHEN ") +
        " END"
      val keepAl = (1 until i).map(j => s"al$j")
      dp = r.selectExpr(Seq("word", "wf", "len",
        s"$newp AS pm1", "pm1 AS pm2", "pm2 AS pm3", "pm3 AS pm4",
        s"CASE WHEN $i = len THEN $newp ELSE best_final END AS best_final",
        s"CASE WHEN $i <= len THEN CAST(($argl) AS INT) END AS al$i")
        ++ keepAl: _*)
        .transform(Checkpoints.cutRound(_, i))
    }
    dp
  }

  /** Forward DP shared by the three unigram consumers (viterbi, EM
    * step, tokenizer compare) — session-cached like the other staged
    * relations; Verify still measures the cold path (PlanCache is off
    * there). */
  private def uniForwardCached(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "uni_forward", dir) {
      val types = uniTypes(spark, dir)
      uniForward(types, uniVocabCached(spark, dir))
    }

  private def uniVocabCached(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "uni_vocab", dir) {
      uniVocab(uniTypes(spark, dir))
    }

  private def emUsedCountsCached(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache(spark, "uni_em_used", dir) {
      emUsedCounts(uniForwardCached(spark, dir))
    }

  def unigramViterbi(spark: SparkSession, dir: String): DataFrame = {
    uniForwardCached(spark, dir)
      .selectExpr("word", "wf", "len", "best_final",
        "CAST(-(best_final % 64) AS INT) AS n_pieces")
      .selectExpr("word", "wf", "len", "n_pieces",
        "(best_final + n_pieces) DIV 64 AS score_nano",
        "CAST(len AS DOUBLE) / n_pieces AS chars_per_piece")
      .orderBy("word")
  }

  val unigramViterbiOracle: String = {
    val occSelects = (1 to uniMaxPiece).map(l =>
      s"""SELECT wf, substr(word, CAST(p.p AS INT) + 1, $l) AS piece
          FROM wt, range(0, $uniMaxLen) p(p)
          WHERE p.p + $l <= len""").mkString("\n          UNION ALL ")
    val rounds = (1 to uniMaxLen).map { i =>
      val ls = (1 to uniMaxPiece).filter(_ <= i)
      val joins = ls.map(l =>
        s"LEFT JOIN vocab v$l ON v$l.piece = substr(d.word, ${i - l + 1}, $l)")
        .mkString(" ")
      val terms = ls.map(l =>
        s"coalesce(d.pm$l + 64 * v$l.lnp_nano - 1, CAST($uniSentinel AS BIGINT))")
      val best = if (terms.size == 1) terms.head
        else s"greatest(${terms.mkString(", ")})"
      s"""dp$i AS (SELECT d.word, d.wf, d.len,
          CASE WHEN $i <= d.len THEN $best END AS pm1,
          d.pm1 AS pm2, d.pm2 AS pm3, d.pm3 AS pm4,
          CASE WHEN $i = d.len
            THEN CASE WHEN $i <= d.len THEN $best END
            ELSE d.best_final END AS best_final
        FROM dp${i - 1} d $joins)"""
    }.mkString(",\n        ")
    s"""WITH wt AS (
          SELECT word, count(*) AS wf, CAST(length(word) AS INT) AS len
          FROM (SELECT unnest(${words("lower(text)", DuckD)}) AS word
                FROM documents)
          GROUP BY word HAVING length(word) BETWEEN 1 AND $uniMaxLen),
        occ AS ($occSelects),
        counts AS (SELECT piece, CAST(sum(wf) AS BIGINT) AS cnt FROM occ
          GROUP BY piece
          HAVING sum(wf) >= $uniMinCount OR length(piece) = 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM counts),
        vocab AS (SELECT piece,
            CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano
          FROM counts, tot),
        dp0 AS (SELECT word, wf, len,
          CAST(0 AS BIGINT) AS pm1, CAST(NULL AS BIGINT) AS pm2,
          CAST(NULL AS BIGINT) AS pm3, CAST(NULL AS BIGINT) AS pm4,
          CAST(NULL AS BIGINT) AS best_final FROM wt),
        $rounds
        SELECT word, wf, len,
          CAST(-(best_final % 64) AS INT) AS n_pieces,
          (best_final + (-(best_final % 64))) // 64 AS score_nano,
          CAST(len AS DOUBLE) / (-(best_final % 64)) AS chars_per_piece
        FROM dp$uniMaxLen ORDER BY word"""
  }

  /** One hard-EM (Viterbi-EM) training step for the unigram LM — the
    * E-step segments every word type by [[uniForward]]'s DP, the
    * backtrack reads the stored per-position ARGMAX-length pointers
    * (al1..al16), and the M-step recounts pieces under the chosen
    * segmentations, frequency-weighted. This is the iteration
    * SentencePiece training runs (segment → recount → reprune);
    * emitting old vs new log-probs per piece makes the probability
    * mass movement — toward pieces the Viterbi paths actually use —
    * directly inspectable and hash-checkable.
    *
    * The backtrack is the interesting plan shape: because the forward
    * pass stored argmax POINTERS, backtracking is [[uniMaxLen]] pure
    * column projections — pos_k = pos_{k-1} − al[pos_{k-1}], piece_k
    * = substr(word, ...) — with NO joins and NO vocabulary lookups;
    * the only shuffles in the whole step are the two vocabulary-grain
    * aggregates. Unused pieces keep a row (em_count 0, new_lnp NULL)
    * so pruning candidates are visible. */
  /** Backtracked per-piece Viterbi counts (piece, em_count) off a
    * forward DP result — shared by [[unigramEmStep]] and
    * [[unigramPruneIter]]. */
  private def emUsedCounts(forward: DataFrame): DataFrame = {
    var bt = forward.withColumn("pos_0", col("len"))
    val alArr = (1 to uniMaxLen).map(j => s"al$j").mkString("array(", ", ", ")")
    for (k <- 1 to uniMaxLen) {
      bt = bt
        .withColumn(s"l_$k", expr(
          s"CASE WHEN pos_${k - 1} > 0 THEN " +
            s"element_at($alArr, CAST(pos_${k - 1} AS INT)) END"))
        .withColumn(s"piece_$k", expr(
          s"CASE WHEN pos_${k - 1} > 0 THEN " +
            s"substr(word, pos_${k - 1} - l_$k + 1, l_$k) END"))
        .withColumn(s"pos_$k", expr(
          s"CASE WHEN pos_${k - 1} > 0 THEN pos_${k - 1} - l_$k ELSE 0 END"))
    }
    val pieceArr = (1 to uniMaxLen).map(k => s"piece_$k")
      .mkString("array(", ", ", ")")
    bt.selectExpr("wf", s"explode($pieceArr) AS piece")
      .filter("piece IS NOT NULL")
      .groupBy("piece").agg(sum("wf").as("em_count"))
  }

  def unigramEmStep(spark: SparkSession, dir: String): DataFrame = {
    val vocab = uniVocabCached(spark, dir)
    val used = emUsedCountsCached(spark, dir)
    val total = used.agg(sum("em_count").as("em_tot"))
    vocab
      .join(used, Seq("piece"), "left_outer")
      .join(broadcast(total))
      .selectExpr("piece", "cnt AS seed_count", "lnp_nano AS seed_lnp_nano",
        "CAST(coalesce(em_count, 0) AS BIGINT) AS em_count",
        "CASE WHEN coalesce(em_count, 0) > 0 THEN " +
          "CAST(round(ln(CAST(em_count AS DOUBLE) / CAST(em_tot AS DOUBLE)) * 1e9) AS BIGINT) " +
          "END AS em_lnp_nano")
      .orderBy("piece")
  }

  val unigramEmStepOracle: String = {
    // forward CTEs with argmax-length columns
    val rounds = (1 to uniMaxLen).map { i =>
      val ls = (1 to uniMaxPiece).filter(_ <= i)
      val joins = ls.map(l =>
        s"LEFT JOIN vocab v$l ON v$l.piece = substr(d.word, ${i - l + 1}, $l)")
        .mkString(" ")
      val terms = ls.map(l =>
        s"coalesce(d.pm$l + 64 * v$l.lnp_nano - 1, CAST($uniSentinel AS BIGINT))")
      val best = if (terms.size == 1) terms.head
        else s"greatest(${terms.mkString(", ")})"
      val argl = "CASE WHEN " + ls.zipWithIndex.map { case (l, ix) =>
        s"${terms(ix)} = ($best) THEN $l" }.mkString(" WHEN ") + " END"
      val keepAl = (1 until i).map(j => s"d.al$j").mkString(", ")
      val keepAlSel = if (i == 1) "" else s", $keepAl"
      s"""dpe$i AS (SELECT d.word, d.wf, d.len,
          CASE WHEN $i <= d.len THEN $best END AS pm1,
          d.pm1 AS pm2, d.pm2 AS pm3, d.pm3 AS pm4,
          CASE WHEN $i <= d.len THEN CAST(($argl) AS INT) END AS al$i$keepAlSel
        FROM dpe${i - 1} d $joins)"""
    }.mkString(",\n        ")
    // backtrack CTEs: pure projections off the al columns
    val alList = (1 to uniMaxLen).map(j => s"al$j").mkString("list_value(", ", ", ")")
    val btRounds = (1 to uniMaxLen).map { k =>
      s"""bt$k AS (SELECT *,
          CASE WHEN pos_${k - 1} > 0
            THEN $alList[CAST(pos_${k - 1} AS INT)] END AS l_$k,
          CASE WHEN pos_${k - 1} > 0
            THEN substr(word, CAST(pos_${k - 1} AS INT) - $alList[CAST(pos_${k - 1} AS INT)] + 1,
                        $alList[CAST(pos_${k - 1} AS INT)]) END AS piece_$k,
          CASE WHEN pos_${k - 1} > 0
            THEN pos_${k - 1} - $alList[CAST(pos_${k - 1} AS INT)] ELSE 0 END AS pos_$k
        FROM bt${k - 1})"""
    }.mkString(",\n        ")
    val pieceList = (1 to uniMaxLen).map(k => s"piece_$k")
      .mkString("list_value(", ", ", ")")
    s"""WITH wt AS (
          SELECT word, count(*) AS wf, CAST(length(word) AS INT) AS len
          FROM (SELECT unnest(${words("lower(text)", DuckD)}) AS word
                FROM documents)
          GROUP BY word HAVING length(word) BETWEEN 1 AND $uniMaxLen),
        occ AS (${(1 to uniMaxPiece).map(l =>
          s"""SELECT wf, substr(word, CAST(p.p AS INT) + 1, $l) AS piece
          FROM wt, range(0, $uniMaxLen) p(p)
          WHERE p.p + $l <= len""").mkString("\n          UNION ALL ")}),
        counts AS (SELECT piece, CAST(sum(wf) AS BIGINT) AS cnt FROM occ
          GROUP BY piece
          HAVING sum(wf) >= $uniMinCount OR length(piece) = 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM counts),
        vocab AS (SELECT piece, cnt,
            CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano
          FROM counts, tot),
        dpe0 AS (SELECT word, wf, len,
          CAST(0 AS BIGINT) AS pm1, CAST(NULL AS BIGINT) AS pm2,
          CAST(NULL AS BIGINT) AS pm3, CAST(NULL AS BIGINT) AS pm4 FROM wt),
        $rounds,
        bt0 AS (SELECT *, len AS pos_0 FROM dpe$uniMaxLen),
        $btRounds,
        used AS (SELECT piece, CAST(sum(wf) AS BIGINT) AS em_count FROM (
            SELECT wf, unnest($pieceList) AS piece FROM bt$uniMaxLen) u
          WHERE piece IS NOT NULL GROUP BY piece),
        em_tot AS (SELECT CAST(sum(em_count) AS BIGINT) AS em_tot FROM used)
        SELECT v.piece, v.cnt AS seed_count, v.lnp_nano AS seed_lnp_nano,
          CAST(coalesce(u.em_count, 0) AS BIGINT) AS em_count,
          CASE WHEN coalesce(u.em_count, 0) > 0 THEN
            CAST(round(ln(CAST(u.em_count AS DOUBLE) / CAST(t.em_tot AS DOUBLE)) * 1e9) AS BIGINT)
            END AS em_lnp_nano
        FROM vocab v LEFT JOIN used u ON v.piece = u.piece
        CROSS JOIN em_tot t
        ORDER BY v.piece"""
  }

  /** Three-way tokenizer comparison per document — whitespace words,
    * BPE-style regex pre-tokens, and the trained unigram-LM
    * segmentation — with chars-per-token for each: the head-to-head
    * readout a tokenizer decision actually needs (compression rate
    * by tokenizer, per doc, so quality filters can also flag docs
    * that compress anomalously under ANY tokenizer). The unigram
    * count rides the word-TYPE grain: [[unigramViterbi]]'s per-type
    * piece counts join the corpus word stream once — the corpus is
    * never re-segmented (the [[bpeEncode]] types-then-join shape). */
  def tokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val typePieces = unigramViterbi(spark, dir)
      .select(col("word"), col("n_pieces").cast("long").as("np"))
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(words("lower(text)", SparkD))).as("word"))
      .join(typePieces, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws"), sum("np").as("n_unigram"))
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n_chars",
        s"CAST(${reCount("text", TextAnalysis.bpeReFor(SparkD), SparkD)} AS BIGINT) AS n_bpe")
      .join(perDoc, Seq("doc_id"), "left_outer")
      .selectExpr("doc_id", "n_chars", "n_bpe",
        "CAST(coalesce(n_ws, 0) AS BIGINT) AS n_ws",
        "CAST(coalesce(n_unigram, 0) AS BIGINT) AS n_unigram")
      .selectExpr("doc_id", "n_chars", "n_ws", "n_bpe", "n_unigram",
        "CASE WHEN n_bpe > 0 THEN CAST(n_chars AS DOUBLE) / n_bpe " +
          "ELSE 0.0 END AS chars_per_bpe",
        "CASE WHEN n_unigram > 0 THEN CAST(n_chars AS DOUBLE) / n_unigram " +
          "ELSE 0.0 END AS chars_per_unigram")
      .orderBy("doc_id")
  }

  val tokenizerCompareOracle: String =
    s"""WITH uni AS (
          SELECT word, CAST(n_pieces AS BIGINT) AS np
          FROM ($unigramViterbiOracle) u),
        toks AS (SELECT doc_id, unnest(${words("lower(text)", DuckD)}) AS word
          FROM documents),
        per_doc AS (SELECT t.doc_id, count(*) AS n_ws,
            CAST(sum(u.np) AS BIGINT) AS n_unigram
          FROM toks t JOIN uni u ON t.word = u.word
          GROUP BY t.doc_id)
        SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
          CAST(${reCount("text", TextAnalysis.bpeReFor(DuckD), DuckD)} AS BIGINT) AS n_bpe,
          CAST(coalesce(p.n_ws, 0) AS BIGINT) AS n_ws,
          CAST(coalesce(p.n_unigram, 0) AS BIGINT) AS n_unigram,
          CASE WHEN ${reCount("text", TextAnalysis.bpeReFor(DuckD), DuckD)} > 0
            THEN CAST(length(d.text) AS DOUBLE) / ${reCount("text", TextAnalysis.bpeReFor(DuckD), DuckD)}
            ELSE 0.0 END AS chars_per_bpe,
          CASE WHEN coalesce(p.n_unigram, 0) > 0
            THEN CAST(length(d.text) AS DOUBLE) / p.n_unigram
            ELSE 0.0 END AS chars_per_unigram
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
        ORDER BY d.doc_id"""

  /** One full prune-and-resegment iteration of unigram-LM training —
    * the loop SentencePiece actually runs: seed vocab → Viterbi
    * segment → recount on the chosen paths → PRUNE unused pieces and
    * renormalize → re-segment under the new model. Emitted as a
    * two-row likelihood card (stage, vocab size, used pieces, corpus
    * log-likelihood in exact nano-BIGINTs): the EM stage's LL is
    * guaranteed ≥ the seed stage's — recounting on fixed
    * segmentations is the ML estimate for those paths (Gibbs), and
    * re-segmenting under the new model can only improve further —
    * and the spec pins that inequality. All heavy state stays at the
    * word-type / vocabulary grain; the corpus is touched once. */
  def unigramPruneIter(spark: SparkSession, dir: String): DataFrame = {
    val types = uniTypes(spark, dir)
    val vocab1 = uniVocabCached(spark, dir)
    val fwd1 = uniForwardCached(spark, dir)
    val used = emUsedCountsCached(spark, dir)
    val vocab2 = graft.PlanCache(spark, "uni_vocab2", dir) { used
      .join(broadcast(used.agg(sum("em_count").as("emt"))))
      .selectExpr("piece",
        "CAST(round(ln(CAST(em_count AS DOUBLE) / CAST(emt AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano")
      .transform(graft.ops.Checkpoints.cut)
    }
    // second 16-round DP pass under the pruned vocab: deterministic
    // per fixture dir, so session-cache it like uni_forward — the
    // iteration latency (an eager lineage cut per round) is the cost,
    // not the word-type data
    val fwd2 = graft.PlanCache(spark, "uni_forward_pruned", dir) {
      uniForward(types, vocab2)
    }
    def ll(fwd: DataFrame, stage: String, nVocab: DataFrame): DataFrame = {
      val scored = fwd.selectExpr("wf",
        "(best_final + (-(best_final % 64))) DIV 64 AS score_nano")
        .agg(sum(expr("wf * score_nano")).as("corpus_ll_nano"),
          count(lit(1)).as("n_words"))
      scored.join(broadcast(nVocab.agg(count(lit(1)).as("n_vocab"))))
        .selectExpr(s"'$stage' AS stage", "n_vocab", "n_words",
          "corpus_ll_nano")
    }
    ll(fwd1, "seed", vocab1)
      .unionByName(ll(fwd2, "pruned_em", vocab2))
      .orderBy("stage")
  }

  /** Parameterized DuckDB DP chain (same structure as the Spark
    * rounds): `prefix`0..`prefix`16 CTEs carrying best_final + the
    * argmax columns, reading piece log-probs from `vocabName`. */
  private def uniDpChainSql(prefix: String, vocabName: String): String =
    (1 to uniMaxLen).map { i =>
      val ls = (1 to uniMaxPiece).filter(_ <= i)
      val joins = ls.map(l =>
        s"LEFT JOIN $vocabName v$l ON v$l.piece = substr(d.word, ${i - l + 1}, $l)")
        .mkString(" ")
      val terms = ls.map(l =>
        s"coalesce(d.pm$l + 64 * v$l.lnp_nano - 1, CAST($uniSentinel AS BIGINT))")
      val best = if (terms.size == 1) terms.head
        else s"greatest(${terms.mkString(", ")})"
      val argl = "CASE WHEN " + ls.zipWithIndex.map { case (l, ix) =>
        s"${terms(ix)} = ($best) THEN $l" }.mkString(" WHEN ") + " END"
      val keepAl = (1 until i).map(j => s"d.al$j").mkString(", ")
      val keepAlSel = if (i == 1) "" else s", $keepAl"
      s"""$prefix$i AS (SELECT d.word, d.wf, d.len,
          CASE WHEN $i <= d.len THEN $best END AS pm1,
          d.pm1 AS pm2, d.pm2 AS pm3, d.pm3 AS pm4,
          CASE WHEN $i = d.len
            THEN CASE WHEN $i <= d.len THEN $best END
            ELSE d.best_final END AS best_final,
          CASE WHEN $i <= d.len THEN CAST(($argl) AS INT) END AS al$i$keepAlSel
        FROM $prefix${i - 1} d $joins)"""
    }.mkString(",\n        ")

  private def uniDpBaseSql(prefix: String): String =
    s"""${prefix}0 AS (SELECT word, wf, len,
        CAST(0 AS BIGINT) AS pm1, CAST(NULL AS BIGINT) AS pm2,
        CAST(NULL AS BIGINT) AS pm3, CAST(NULL AS BIGINT) AS pm4,
        CAST(NULL AS BIGINT) AS best_final FROM wt)"""

  private def uniBtChainSql(fromCte: String): String = {
    val alList = (1 to uniMaxLen).map(j => s"al$j")
      .mkString("list_value(", ", ", ")")
    val rounds = (1 to uniMaxLen).map { k =>
      s"""bt$k AS (SELECT *,
          CASE WHEN pos_${k - 1} > 0
            THEN substr(word, CAST(pos_${k - 1} AS INT) - $alList[CAST(pos_${k - 1} AS INT)] + 1,
                        $alList[CAST(pos_${k - 1} AS INT)]) END AS piece_$k,
          CASE WHEN pos_${k - 1} > 0
            THEN pos_${k - 1} - $alList[CAST(pos_${k - 1} AS INT)] ELSE 0 END AS pos_$k
        FROM bt${k - 1})"""
    }.mkString(",\n        ")
    s"""bt0 AS (SELECT *, len AS pos_0 FROM $fromCte),
        $rounds"""
  }

  val unigramPruneIterOracle: String = {
    val pieceList = (1 to uniMaxLen).map(k => s"piece_$k")
      .mkString("list_value(", ", ", ")")
    val llOf = (cte: String) =>
      s"""SELECT CAST(sum(wf * ((best_final + (-(best_final % 64))) // 64)) AS BIGINT)
            AS corpus_ll_nano, count(*) AS n_words
          FROM $cte"""
    s"""WITH wt AS MATERIALIZED (
          SELECT word, count(*) AS wf, CAST(length(word) AS INT) AS len
          FROM (SELECT unnest(${words("lower(text)", DuckD)}) AS word
                FROM documents)
          GROUP BY word HAVING length(word) BETWEEN 1 AND $uniMaxLen),
        occ AS (${(1 to uniMaxPiece).map(l =>
          s"""SELECT wf, substr(word, CAST(p.p AS INT) + 1, $l) AS piece
          FROM wt, range(0, $uniMaxLen) p(p)
          WHERE p.p + $l <= len""").mkString("\n          UNION ALL ")}),
        counts AS (SELECT piece, CAST(sum(wf) AS BIGINT) AS cnt FROM occ
          GROUP BY piece
          HAVING sum(wf) >= $uniMinCount OR length(piece) = 1),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM counts),
        vocab AS MATERIALIZED (SELECT piece,
            CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano
          FROM counts, tot),
        ${uniDpBaseSql("dpe")},
        ${uniDpChainSql("dpe", "vocab")},
        ${uniBtChainSql(s"dpe$uniMaxLen")},
        used AS MATERIALIZED (SELECT piece, CAST(sum(wf) AS BIGINT) AS em_count FROM (
            SELECT wf, unnest($pieceList) AS piece FROM bt$uniMaxLen) u
          WHERE piece IS NOT NULL GROUP BY piece),
        em_tot AS (SELECT CAST(sum(em_count) AS BIGINT) AS emt FROM used),
        vocab2 AS MATERIALIZED (SELECT piece,
            CAST(round(ln(CAST(em_count AS DOUBLE) / CAST(emt AS DOUBLE)) * 1e9) AS BIGINT) AS lnp_nano
          FROM used, em_tot),
        ${uniDpBaseSql("dp2_")},
        ${uniDpChainSql("dp2_", "vocab2")},
        ll1 AS (${llOf(s"dpe$uniMaxLen")}),
        ll2 AS (${llOf(s"dp2_$uniMaxLen")}),
        nv1 AS (SELECT count(*) AS n_vocab FROM vocab),
        nv2 AS (SELECT count(*) AS n_vocab FROM vocab2)
        SELECT 'seed' AS stage, nv1.n_vocab, ll1.n_words, ll1.corpus_ll_nano
        FROM ll1, nv1
        UNION ALL
        SELECT 'pruned_em', nv2.n_vocab, ll2.n_words, ll2.corpus_ll_nano
        FROM ll2, nv2
        ORDER BY stage"""
  }
}
