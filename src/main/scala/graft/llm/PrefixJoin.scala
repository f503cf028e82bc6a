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
    // the distinct-token ARRAY rides alongside the exploded rows: the
    // verify step intersects arrays per candidate pair (one codegen'd
    // hash-intersect per row) instead of re-joining each pair against
    // its token LISTS — on a boilerplate-heavy corpus the qualifying
    // pairs are near-quadratic, and the list-join formulation pushed
    // |pairs|·|tokens| rows through two shuffles (measured 73 s at
    // sf0.1; the array form verifies map-side against the broadcast
    // doc→array relation and runs in a few seconds)
    // both checkpoints bound RECOMPUTATION, not size: docsArr is
    // corpus-row-sized and prefix is ~sz/5 rows per doc, but each is
    // referenced twice by the self-join (and docsArr twice more by the
    // verify), so without them the tokenize+df+window lineage runs 4×
    graft.functions.Native.register(spark)
    // arrays are SORTED once here so verification can merge-walk
    // (graft_sorted_inter) instead of hash-building per pair
    val docsArr = Tables.documents(spark, dir)
      .selectExpr("doc_id",
        s"sort_array(${arrDistinct(words("lower(text)", SparkD), SparkD)}) AS toks")
      .selectExpr("doc_id", "toks", "size(toks) AS sz")
      .localCheckpoint()
    val toks = docsArr.select(col("doc_id"), col("sz"),
      explode(col("toks")).as("tok"))
    val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(dfT, Seq("tok"))
      .withColumn("rk", expr(
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, tok)"))
    val prefix = ranked.filter(
      expr(s"rk <= sz - (($tNum * sz + $tNum) DIV $tDen) + 1"))
      .select("doc_id", "tok", "sz")
      .localCheckpoint()
    // the pre-distinct pair stream repeats a pair once per shared
    // prefix token — project it down to the two ids BEFORE the
    // distinct so the dedup shuffle moves 16 bytes/row, not the
    // token/size payload (the size filter runs pre-projection)
    val cand = prefix.selectExpr("doc_id AS doc_a", "tok", "sz AS sz_a")
      .join(prefix.selectExpr("doc_id AS doc_b", "tok", "sz AS sz_b"),
        Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      // size filter: |B| ≥ t·|A| is necessary for Jaccard ≥ t
      .filter(expr(s"$tDen * sz_b >= $tNum * sz_a AND $tDen * sz_a >= $tNum * sz_b"))
      .select("doc_a", "doc_b").distinct()
    // doc→array is corpus-row-sized (tiny next to the pair set) —
    // broadcast both sides so verification never shuffles the pairs;
    // past broadcast limits this degrades to a doc_id shuffle join,
    // same semantics
    cand
      .join(broadcast(docsArr.selectExpr(
        "doc_id AS doc_a", "toks AS toks_a", "sz AS sz_a")), Seq("doc_a"))
      .join(broadcast(docsArr.selectExpr(
        "doc_id AS doc_b", "toks AS toks_b", "sz AS sz_b")), Seq("doc_b"))
      .selectExpr("doc_a", "doc_b",
        "graft_sorted_inter(toks_a, toks_b) AS inter", "sz_a", "sz_b")
      .selectExpr("doc_a", "doc_b", "CAST(inter AS BIGINT) AS inter",
        "CAST(sz_a + sz_b - inter AS BIGINT) AS uni")
      .filter(s"$tDen * inter >= $tNum * uni")
      .selectExpr("doc_a", "doc_b", "inter", "uni",
        "CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard")
      .orderBy("doc_a", "doc_b")
  }

  val prefixFilterPairsOracle: String = {
    val d = DuckD
    s"""WITH docs_arr AS (
          SELECT doc_id, ${arrDistinct(words("lower(text)", d), d)} AS toks
          FROM documents),
        sized AS (SELECT doc_id, toks, ${arrLen("toks", d)} AS sz FROM docs_arr),
        toks AS (SELECT doc_id, sz, unnest(toks) AS tok FROM sized),
        df_t AS (SELECT tok, count(*) AS df FROM toks GROUP BY tok),
        ranked AS (
          SELECT t.doc_id, t.tok, t.sz,
            row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok) AS rk
          FROM toks t JOIN df_t f ON t.tok = f.tok),
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
          SELECT c.doc_a, c.doc_b,
            CAST(${interSize("sa.toks", "sb.toks", d)} AS BIGINT) AS inter,
            CAST(c.sz_a + c.sz_b - ${interSize("sa.toks", "sb.toks", d)} AS BIGINT) AS uni
          FROM cand c
          JOIN sized sa ON sa.doc_id = c.doc_a
          JOIN sized sb ON sb.doc_id = c.doc_b)
        SELECT doc_a, doc_b, inter, uni,
          CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
        FROM inter_t
        WHERE $tDen * inter >= $tNum * uni
        ORDER BY doc_a, doc_b"""
  }
}
