package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap

/** Guarded temp-view registration.
  *
  * Verify runs the query corpus CONCURRENTLY over one SparkSession, and
  * a handful of view names are shared between queries (sales_tx, the
  * six curated_* views). That is safe only while every query registers
  * a given name with the IDENTICAL definition — a future query quietly
  * reusing `sales_tx` for a different relation would let
  * create-or-replace swap plans under another query's analysis,
  * nondeterministically. This registry turns that latent hazard into a
  * loud failure: each (session, fixture dir, view name) remembers the
  * canonicalized analyzed plan it was first registered with, and any
  * later registration with a DIFFERENT plan throws instead of
  * replacing.
  *
  * The key includes the fixture dir because the same name legitimately
  * maps to per-dir plans across sequential multi-SF test runs; within
  * one Verify/Bench run the dir is constant, so the single-definition
  * invariant is fully enforced there. Cost per registration is one
  * plan analysis + MD5 — no job runs.
  *
  * Sessions are keyed by IDENTITY through a WeakHashMap, not by
  * `System.identityHashCode` (hash values are not unique and can be
  * re-issued after GC, which could alias two sessions into one
  * namespace — a spurious mismatch throw or a missed divergence).
  * The weak keying also lets a stopped session's entries be collected
  * instead of accreting across the many short-lived test sessions a
  * long-lived JVM creates (same pattern as PlanCache.sessionIds).
  */
object Views {
  private val defs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, String]]())

  private def sessionDefs(s: SparkSession): ConcurrentHashMap[String, String] =
    defs.computeIfAbsent(s, _ => new ConcurrentHashMap[String, String]())

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def register(dir: String, name: String, df: DataFrame): Unit = {
    val sig = md5(df.queryExecution.analyzed.canonicalized.toString)
    val prev = sessionDefs(df.sparkSession).putIfAbsent(s"$dir|$name", sig)
    if (prev != null && prev != sig)
      throw new IllegalStateException(
        s"temp view '$name' (dir=$dir) re-registered with a DIFFERENT " +
          "definition in the same session — shared view names must map " +
          "to a single definition or concurrent queries cross-contaminate. " +
          "Pick a new view name for the new relation.")
    df.createOrReplaceTempView(name)
  }
}
