package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Deduplication operators for large-scale text/embedding corpora:
  * exact (hash group-by), MinHash+LSH (shingle → 16 minhashes → 4
  * band buckets → bucket-join candidates → exact-Jaccard verify),
  * SimHash (32-bit, token bit-balance), blocked n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design: nothing here is quadratic in the corpus.
  *   - MinHash candidates come from an equi-join on (band_idx,
  *     band_val) — a plain shuffle join whose cost is bounded by bucket
  *     occupancy, the standard LSH trick at 100 TB;
  *   - SimHash / n-gram / embedding pair generation is blocked on a
  *     bounded-cardinality key (lang, source, label) — at real scale
  *     the block key becomes the LSH band or an IVF cell;
  *   - exact-Jaccard verification runs only on candidate pairs.
  * Every operator has a DuckDB oracle generated from the same Gen
  * builders.
  */
object Dedup {

  // ---- exact dedup over normalized-text fingerprint ----

  private def normExpr(d: Dialect): String = d match {
    case SparkD => "lower(regexp_replace(text, '\\\\s+', ' '))"
    case DuckD  => "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
  }

  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", s"md5(${normExpr(SparkD)}) AS fp_md5")
      .groupBy("fp_md5")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_doc"))
      .orderBy("fp_md5")

  val exactDedupOracle: String =
    s"""SELECT fp_md5, count(*) AS n_docs, min(doc_id) AS canonical_doc
        FROM (SELECT doc_id, md5(${normExpr(DuckD)}) AS fp_md5 FROM documents)
        GROUP BY fp_md5 ORDER BY fp_md5"""

  // ---- MinHash + LSH ----

  private val nSigs = 16
  private val nBands = 4

  private def shinglesSql(d: Dialect): String = shingles(words("text", d), d)

  private def sigCols(d: Dialect): Seq[String] =
    (0 until nSigs).map(j => s"${minhashSig("sh", j, d)} AS sig_$j")

  private def bandCols: Seq[String] =
    (0 until nBands).map { b =>
      val parts = (0 until 4).map(r => s"sig_${b * 4 + r}").mkString(", ")
      s"md5(concat($parts)) AS band_$b"
    }

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", s"${shinglesSql(SparkD)} AS sh")
      .selectExpr(Seq("doc_id", "lang") ++ sigCols(SparkD): _*)
      .selectExpr(Seq("*") ++ bandCols: _*)
      .orderBy("doc_id")

  private def minhashCtes(d: Dialect): String =
    s"""sh_t AS (SELECT doc_id, lang, ${shinglesSql(d)} AS sh FROM documents),
        sig_t AS (SELECT doc_id, lang, ${sigCols(d).mkString(", ")} FROM sh_t),
        band_t AS (SELECT *, ${bandCols.mkString(", ")} FROM sig_t)"""

  val minhashSignaturesOracle: String =
    s"WITH ${minhashCtes(DuckD)} SELECT * FROM band_t ORDER BY doc_id"

  /** Candidate pairs from band-bucket equi-join, verified with exact
    * Jaccard on the distinct shingle sets; kept at jaccard >= 0.5. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val bandStack = (0 until nBands).map(b => s"$b, band_$b").mkString(", ")
    val bands = sigs.selectExpr("doc_id",
      s"stack($nBands, $bandStack) AS (band_idx, band_val)")
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_val") === col("b.band_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sh = Tables.documents(spark, dir)
      .selectExpr("doc_id", s"${shinglesSql(SparkD)} AS sh")
      .selectExpr("doc_id", "sh", s"CAST(${arrLen("sh", SparkD)} AS INTEGER) AS n")
    cands
      .join(sh.selectExpr("doc_id AS doc_a", "sh AS sh_a", "n AS na"), Seq("doc_a"))
      .join(sh.selectExpr("doc_id AS doc_b", "sh AS sh_b", "n AS nb"), Seq("doc_b"))
      .selectExpr("doc_a", "doc_b", "na", "nb",
        s"CAST(${interSize("sh_a", "sh_b", SparkD)} AS INTEGER) AS intersection_size")
      .selectExpr("doc_a", "doc_b", "intersection_size",
        "na + nb - intersection_size AS union_size")
      .selectExpr("*", "intersection_size / union_size AS jaccard")
      .filter(col("jaccard") >= 0.5)
      .orderBy("doc_a", "doc_b")
  }

  val minhashPairsOracle: String = {
    val bandUnion = (0 until nBands)
      .map(b => s"SELECT doc_id, $b AS band_idx, band_$b AS band_val FROM band_t")
      .mkString(" UNION ALL ")
    s"""WITH ${minhashCtes(DuckD)},
        bands AS ($bandUnion),
        cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                   AND a.doc_id < b.doc_id),
        shn AS (SELECT doc_id, sh, CAST(${arrLen("sh", DuckD)} AS INTEGER) AS n FROM sh_t),
        inter AS (SELECT c.doc_a, c.doc_b, sa.n AS na, sb.n AS nb,
                    CAST(${interSize("sa.sh", "sb.sh", DuckD)} AS INTEGER) AS intersection_size
                  FROM cands c
                  JOIN shn sa ON c.doc_a = sa.doc_id
                  JOIN shn sb ON c.doc_b = sb.doc_id),
        sized AS (SELECT doc_a, doc_b, intersection_size,
                    na + nb - intersection_size AS union_size FROM inter)
        SELECT * FROM (SELECT *, intersection_size / union_size AS jaccard FROM sized)
        WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b"""
  }

  // ---- SimHash ----

  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(expr(words("text", SparkD))).as("w"))
      .selectExpr("doc_id", "lang", "md5(w) AS hw")
      .selectExpr("doc_id", "lang", s"${hexPrefix32("hw")} AS h")
    val sums = simhashBitSums("h", SparkD).map(expr)
    toks.groupBy("doc_id", "lang")
      .agg(sums.head, sums.tail: _*)
      .selectExpr("doc_id", "lang", s"${simhashAssemble(SparkD)} AS simhash")
      .orderBy("doc_id")
  }

  private def simhashCtes(d: Dialect): String = {
    val unnestW = d match {
      case DuckD => s"SELECT doc_id, lang, unnest(${words("text", d)}) AS w FROM documents"
      case SparkD => sys.error("spark side built via DataFrame API")
    }
    s"""toks AS ($unnestW),
        tmd AS (SELECT doc_id, lang, md5(w) AS hw FROM toks),
        th AS (SELECT doc_id, lang, ${hexPrefix32("hw")} AS h FROM tmd),
        bits AS (SELECT doc_id, lang, ${simhashBitSums("h", d).mkString(", ")}
                 FROM th GROUP BY doc_id, lang),
        sim_t AS (SELECT doc_id, lang, ${simhashAssemble(d)} AS simhash FROM bits)"""
  }

  val simhashSignaturesOracle: String =
    s"WITH ${simhashCtes(DuckD)} SELECT * FROM sim_t ORDER BY doc_id"

  /** Near-dup pairs by Hamming distance <= 8, blocked on lang. */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = simhashSignatures(spark, dir)
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b", "a.lang AS lang",
        s"CAST(bit_count(${bitXor("a.simhash", "b.simhash", SparkD)}) AS INTEGER) AS hamming")
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  val simhashPairsOracle: String =
    s"""WITH ${simhashCtes(DuckD)}
        SELECT * FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
            CAST(bit_count(${bitXor("a.simhash", "b.simhash", DuckD)}) AS INTEGER) AS hamming
          FROM sim_t a JOIN sim_t b
            ON a.lang = b.lang AND a.doc_id < b.doc_id)
        WHERE hamming <= 8 ORDER BY doc_a, doc_b"""

  // ---- blocked n-gram Jaccard ----

  /** Exact word-3-gram Jaccard within (lang, source) blocks; kept at
    * jaccard >= 0.3. The block key bounds the pair count. */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .selectExpr("doc_id", "lang", "source", s"${shinglesSql(SparkD)} AS sh")
      .selectExpr("doc_id", "lang", "source", "sh",
        s"CAST(${arrLen("sh", SparkD)} AS INTEGER) AS n")
    sh.as("a")
      .join(sh.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b", "a.lang AS lang",
        "a.source AS source", "a.n AS na", "b.n AS nb",
        s"CAST(${interSize("a.sh", "b.sh", SparkD)} AS INTEGER) AS intersection_size")
      .selectExpr("doc_a", "doc_b", "lang", "source", "intersection_size",
        "na + nb - intersection_size AS union_size")
      .selectExpr("*", "intersection_size / union_size AS jaccard")
      .filter(col("jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  val ngramJaccardPairsOracle: String =
    s"""WITH sh_t AS (SELECT doc_id, lang, source, ${shinglesSql(DuckD)} AS sh FROM documents),
        shn AS (SELECT *, CAST(${arrLen("sh", DuckD)} AS INTEGER) AS n FROM sh_t),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
                    a.source AS source, a.n AS na, b.n AS nb,
                    CAST(${interSize("a.sh", "b.sh", DuckD)} AS INTEGER) AS intersection_size
                  FROM shn a JOIN shn b
                    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id),
        sized AS (SELECT doc_a, doc_b, lang, source, intersection_size,
                    na + nb - intersection_size AS union_size FROM inter)
        SELECT * FROM (SELECT *, intersection_size / union_size AS jaccard FROM sized)
        WHERE jaccard >= 0.3 ORDER BY doc_a, doc_b"""

  // ---- embedding-cosine near-dup ----

  /** Cosine near-dup pairs within label blocks, cosine >= 0.4.
    * Norms precomputed per vector: 1 dot + 1 multiply per pair. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    val e = Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", s"${toDoubleArr("embedding", SparkD)} AS v")
      .selectExpr("vec_id", "label", "v", s"${norm64("v", SparkD)} AS nrm")
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b", "a.label AS label",
        s"${cosineWithNorms("a.v", "b.v", "a.nrm", "b.nrm", SparkD)} AS cosine")
      .filter(col("cosine") >= 0.4)
      .orderBy("vec_a", "vec_b")
  }

  val embeddingNearDupOracle: String =
    s"""WITH e0 AS (SELECT vec_id, label, ${toDoubleArr("embedding", DuckD)} AS v FROM embeddings),
        e AS (SELECT *, ${norm64("v", DuckD)} AS nrm FROM e0)
        SELECT * FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
            ${cosineWithNorms("a.v", "b.v", "a.nrm", "b.nrm", DuckD)} AS cosine
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE cosine >= 0.4 ORDER BY vec_a, vec_b"""
}
