package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Exact set-similarity self-join via prefix filtering (AllPairs /
  * PPJoin lineage) — the LOSSLESS candidate generator: unlike MinHash /
  * SimHash banding (probabilistic, tunable false-negative rate), prefix
  * filtering guarantees every pair with Jaccard ≥ t is a candidate.
  * Order each document's distinct tokens by GLOBAL rarity (document
  * frequency ascending); two token sets with |A∩B|/|A∪B| ≥ t MUST share
  * at least one token among each side's first |x| − ⌈t·|x|⌉ + 1 rarest
  * tokens, so an equi-join on prefix tokens finds all qualifying pairs
  * while common tokens (the quadratic blowup) never enter the join.
  *
  * Everything is integer arithmetic: the prefix length uses
  * ⌈4s/5⌉ = (4s+4) DIV 5 exactly, and the verify threshold
  * inter/union ≥ 4/5 is the cross-multiplication 5·inter ≥ 4·union —
  * no float appears anywhere except the reported jaccard readout.
  *
  * Scale shape: token df is one map-side-combined agg; the global
  * order ships to each doc's tokens via an equi-join on the token key
  * (the df relation is vocabulary-sized); candidates come from the
  * prefix-token equi-join (bounded by rare-token occupancy — the
  * frequency ordering exists precisely to keep that join sparse); and
  * verification joins only candidate pairs back to their token lists.
  * This is the standard exact-dedup shape at corpus scale when a
  * false-negative budget of zero is the requirement LSH can't meet.
  */
object PrefixJoin {

  // Jaccard threshold 4/5 = 0.8, kept as a ratio for integer math
  private val tNum = 4
  private val tDen = 5

  def prefixFilterPairs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(expr(arrDistinct(words("lower(text)", SparkD), SparkD)))
          .as("tok"))
    val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val ranked = toks.join(dfT, Seq("tok"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, tok)"))
      .join(sizes, Seq("doc_id"))
    val prefix = ranked.filter(
      expr(s"rk <= sz - (($tNum * sz + $tNum) DIV $tDen) + 1"))
    val cand = prefix.selectExpr("doc_id AS doc_a", "tok", "sz AS sz_a")
      .join(prefix.selectExpr("doc_id AS doc_b", "tok", "sz AS sz_b"),
        Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      // size filter: |B| ≥ t·|A| is necessary for Jaccard ≥ t
      .filter(expr(s"$tDen * sz_b >= $tNum * sz_a AND $tDen * sz_a >= $tNum * sz_b"))
      .select("doc_a", "doc_b", "sz_a", "sz_b").distinct()
    val inter = cand
      .join(toks.selectExpr("doc_id AS doc_a", "tok"), Seq("doc_a"))
      .join(toks.selectExpr("doc_id AS doc_b", "tok AS tok_b"), Seq("doc_b"))
      .filter(col("tok") === col("tok_b"))
      .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .selectExpr("doc_a", "doc_b", "inter",
        "sz_a + sz_b - inter AS uni")
      .filter(s"$tDen * inter >= $tNum * uni")
      .selectExpr("doc_a", "doc_b", "inter", "uni",
        "CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val prefixFilterPairsOracle: String = {
    val d = DuckD
    s"""WITH toks AS (
          SELECT doc_id, unnest(${arrDistinct(words("lower(text)", d), d)}) AS tok
          FROM documents),
        df_t AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
        sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        ranked AS (
          SELECT t.doc_id, t.tok, s.sz,
            row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) AS rk
          FROM toks t JOIN df_t f ON t.tok = f.tok
          JOIN sizes s ON t.doc_id = s.doc_id),
        prefix AS (
          SELECT doc_id, tok, sz FROM ranked
          WHERE rk <= sz - (($tNum * sz + $tNum) // $tDen) + 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.sz AS sz_a, b.sz AS sz_b
          FROM prefix a JOIN prefix b ON a.tok = b.tok
            AND a.doc_id < b.doc_id
          WHERE $tDen * b.sz >= $tNum * a.sz
            AND $tDen * a.sz >= $tNum * b.sz),
        inter_t AS (
          SELECT c.doc_a, c.doc_b, c.sz_a, c.sz_b, count(*) AS inter
          FROM cand c
          JOIN toks ta ON ta.doc_id = c.doc_a
          JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
          GROUP BY c.doc_a, c.doc_b, c.sz_a, c.sz_b)
        SELECT doc_a, doc_b, inter, sz_a + sz_b - inter AS uni,
          CAST(inter AS DOUBLE) / CAST(sz_a + sz_b - inter AS DOUBLE) AS jaccard
        FROM inter_t
        WHERE $tDen * inter >= $tNum * (sz_a + sz_b - inter)
        ORDER BY doc_a, doc_b"""
  }
}
