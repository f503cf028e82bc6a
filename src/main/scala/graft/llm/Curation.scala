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
}
