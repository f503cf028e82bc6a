package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.llm.Gen
import graft.llm.Gen.{Dialect, DuckD, SparkD}

/** Multi-dimensional data-layout planning — the Z-order clustering
  * capability every lakehouse engine ships (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders): interleave the bits of two clustering keys
  * into a Morton code, range-bucket rows by that code, and AUDIT the
  * result — per-bucket bounding boxes and a concrete two-dimensional
  * probe showing how many buckets (and rows) each layout lets a
  * min/max-pruning scan skip.
  *
  * Everything is exact integer arithmetic: keys normalize to a
  * 16-bit budget by key·2^16 DIV (max+1) against a broadcast one-row
  * max, the Morton interleave is a sum of masked-bit times
  * power-of-four terms (shared Spark/DuckDB text via
  * [[Gen.shiftRight]]), buckets are the code's top 6 bits, and bbox
  * areas are BIGINT products — no floats anywhere, so the oracle
  * hash is bit-trivial.
  *
  * Scale shape: one scan; the per-bucket aggregate is map-side
  * combined onto 64 groups per layout; the only broadcast is one row
  * of maxes. At 100 TB the same plan writes the layout instead of
  * auditing it: repartitionByRange(z) + sortWithinPartitions(z) is
  * the write recipe, and the bucket stats here are exactly the
  * per-file min/max metadata a reader would prune on. Raw keys are
  * quantized directly (they are dense and uniform in the fixture); a
  * skewed production key would first pass through the range-binned
  * rank the [[graft.ops.Scale]] utilities provide, which keeps the
  * interleave meaningful without changing this plan.
  */
object Layout {

  /** Morton code of the low 16 bits of `p` and `s`: p's bit i lands at
    * position 2i, s's at 2i+1. Identical operation shape in both
    * dialects → identical BIGINTs. */
  private def zValue(p: String, s: String, d: Dialect): String = {
    val terms =
      (0 until 16).map { i =>
        s"(${Gen.shiftRight(p, i, d)} & 1) * ${4L pow i}"
      } ++ (0 until 16).map { i =>
        s"(${Gen.shiftRight(s, i, d)} & 1) * ${2L * (4L pow i)}"
      }
    terms.mkString("(", " + ", ")")
  }

  private implicit class PowOps(private val b: Long) extends AnyVal {
    def pow(e: Int): Long = { var r = 1L; var i = 0; while (i < e) { r *= b; i += 1 }; r }
  }

  /** Shared relation: each lineitem row with its two clustering keys
    * NORMALIZED to a common 16-bit budget, the Morton code over the
    * normalized values, and both layouts' bucket ids.
    *
    * The normalization is the step naive Z-ordering forgets: these
    * two keys have unequal ranges (~15 vs ~10 significant bits), and
    * interleaving them raw parks only the WIDE key's bits in the
    * bucket-deciding high positions — this audit, run on the raw
    * interleave, measured Z-order scanning 2.4× MORE rows than a
    * plain partkey sort at sf0.1. Scaling each key to [0, 65535]
    * first (key·2^16 DIV (max+1), exact integers against the
    * broadcast one-row maxes) makes the top interleaved bits
    * alternate dimensions, so the 64 buckets tile (p, s) space as an
    * 8×8 grid — which is what makes two-dimensional pruning work. */
  private def bucketed(spark: SparkSession, dir: String): DataFrame = {
    val rel = Tables.table(spark, dir, "lineitem")
      .selectExpr("l_partkey AS p", "l_suppkey AS s")
    rel
      .join(broadcast(rel.agg(max("p").as("max_p"), max("s").as("max_s"))))
      .selectExpr("p", "s", "max_p", "max_s",
        "CAST(p * 65536 AS BIGINT) DIV (max_p + 1) AS p16",
        "CAST(s * 65536 AS BIGINT) DIV (max_s + 1) AS s16")
      .selectExpr("p", "s", "max_p", "max_s",
        // z < 2^32 by construction, so the bucket is just the top 6
        // bits: 3 of p16 interleaved with 3 of s16 — an 8x8 tile grid.
        s"${zValue("p16", "s16", SparkD)} DIV 67108864 AS zb",
        "p16 DIV 1024 AS lb")
  }

  /** Per-bucket bounding boxes for the Z-order layout vs a linear
    * (partkey-sorted) layout — the file-level min/max metadata a
    * pruning reader would consult, made inspectable. Z-order buckets
    * come out roughly square in (p, s); linear buckets are full-height
    * stripes: tight p, uncontrolled s. */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    bucketed(spark, dir)
      .selectExpr("stack(2, 'linear', lb, 'zorder', zb) AS (layout, bucket)",
        "p", "s")
      .groupBy("layout", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("p").as("min_p"), max("p").as("max_p"),
        min("s").as("min_s"), max("s").as("max_s"))
      .selectExpr("layout", "bucket", "n_rows", "min_p", "max_p",
        "min_s", "max_s",
        "(max_p - min_p + 1) * (max_s - min_s + 1) AS bbox_area")
      .orderBy("layout", "bucket")

  private def oracleBucketCtes: String =
    s"""keys AS (SELECT l_partkey AS p, l_suppkey AS s FROM lineitem),
      mx AS (SELECT max(p) AS max_p, max(s) AS max_s FROM keys),
      sc AS (SELECT p, s, max_p, max_s,
          (p * 65536) // (max_p + 1) AS p16,
          (s * 65536) // (max_s + 1) AS s16
        FROM keys, mx),
      bk AS (SELECT p, s, max_p, max_s,
          ${zValue("p16", "s16", DuckD)} // 67108864 AS zb,
          p16 // 1024 AS lb
        FROM sc),
      both_l AS (
        SELECT 'linear' AS layout, lb AS bucket, p, s, max_p, max_s FROM bk
        UNION ALL
        SELECT 'zorder' AS layout, zb AS bucket, p, s, max_p, max_s FROM bk)"""

  val zorderLayoutOracle: String =
    s"""WITH $oracleBucketCtes
        SELECT layout, bucket, count(*) AS n_rows,
          min(p) AS min_p, max(p) AS max_p,
          min(s) AS min_s, max(s) AS max_s,
          (max(p) - min(p) + 1) * (max(s) - min(s) + 1) AS bbox_area
        FROM both_l GROUP BY layout, bucket ORDER BY layout, bucket"""

  // A mid-corpus two-dimensional probe box, RELATIVE to the observed
  // key maxes (eighth-to-quarter of each range, exact integer
  // division) so every scale factor asks the same proportional
  // question — a fixed literal box empties on the small fixtures.
  private val probeBounds = Seq(
    "(max_p + 1) DIV 8 AS pb_lo", "(max_p + 1) DIV 4 AS pb_hi",
    "(max_s + 1) DIV 8 AS sb_lo", "(max_s + 1) DIV 4 AS sb_hi")
  private val probe = "p >= pb_lo AND p <= pb_hi AND s >= sb_lo AND s <= sb_hi"

  /** The payoff number: for the probe box, how many buckets does each
    * layout's min/max pruning have to touch, and how many rows ride
    * along (the I/O proxy)? A bucket is touched when its bbox
    * intersects the probe — exactly the file-skipping rule. Linear
    * layouts prune p tightly but every touched stripe spans all of s;
    * Z-order touches more, smaller boxes with fewer total rows as the
    * corpus grows. */
  def zorderPruning(spark: SparkSession, dir: String): DataFrame =
    bucketed(spark, dir)
      .selectExpr(Seq("stack(2, 'linear', lb, 'zorder', zb) AS (layout, bucket)",
        "p", "s") ++ probeBounds: _*)
      .groupBy("layout", "bucket", "pb_lo", "pb_hi", "sb_lo", "sb_hi")
      .agg(count(lit(1)).as("n_rows"),
        min("p").as("bmin_p"), max("p").as("bmax_p"),
        min("s").as("bmin_s"), max("s").as("bmax_s"),
        sum(expr(s"CASE WHEN $probe THEN 1 ELSE 0 END")).as("n_match"))
      .filter("bmax_p >= pb_lo AND bmin_p <= pb_hi AND " +
        "bmax_s >= sb_lo AND bmin_s <= sb_hi")
      .groupBy("layout")
      .agg(count(lit(1)).as("buckets_touched"),
        sum("n_rows").as("rows_scanned"),
        sum("n_match").as("rows_matched"))
      .selectExpr("layout", "buckets_touched", "rows_scanned",
        "rows_matched",
        "CAST(rows_matched AS DOUBLE) / rows_scanned AS scan_precision")
      .orderBy("layout")

  val zorderPruningOracle: String =
    s"""WITH $oracleBucketCtes,
        pb AS (SELECT layout, bucket, p, s,
            (max_p + 1) // 8 AS pb_lo, (max_p + 1) // 4 AS pb_hi,
            (max_s + 1) // 8 AS sb_lo, (max_s + 1) // 4 AS sb_hi
          FROM both_l),
        bstats AS (
          SELECT layout, bucket, pb_lo, pb_hi, sb_lo, sb_hi,
            count(*) AS n_rows,
            min(p) AS bmin_p, max(p) AS bmax_p,
            min(s) AS bmin_s, max(s) AS bmax_s,
            CAST(sum(CASE WHEN $probe THEN 1 ELSE 0 END) AS BIGINT)
              AS n_match
          FROM pb GROUP BY 1, 2, 3, 4, 5, 6)
        SELECT layout, count(*) AS buckets_touched,
          CAST(sum(n_rows) AS BIGINT) AS rows_scanned,
          CAST(sum(n_match) AS BIGINT) AS rows_matched,
          CAST(sum(n_match) AS DOUBLE) / sum(n_rows) AS scan_precision
        FROM bstats
        WHERE bmax_p >= pb_lo AND bmin_p <= pb_hi
          AND bmax_s >= sb_lo AND bmin_s <= sb_hi
        GROUP BY layout ORDER BY layout"""
}
