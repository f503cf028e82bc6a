package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Oracle-checked end-to-end exercises of the IO layer (S1/S3/S4
  * hardening): previously these behaviors were spec-only; surfacing
  * them as `SparkEntry.queries` entries gives them DuckDB-checked
  * rows/schema/hash verification at every scale factor the driver runs.
  *
  * Both queries round-trip fixture data through real files under
  * java.io.tmpdir (re-written per invocation — `mode=overwrite`
  * keeps them idempotent), then reduce to small deterministic
  * summaries a DuckDB query over the ORIGINAL parquet fixture can
  * reproduce — so what's verified is that the file round-trip is
  * lossless, not just that counting works.
  */
object IoChecks {

  /** Stable scratch dir per (query, fixture dir) — bench and verify
    * may interleave SFs in one JVM. */
  private def scratch(tag: String, sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** S1 quarantine split as a query: render `orders` to CSV with a
    * deterministic corruption rule (o_orderkey % 97 == 0 → a
    * non-numeric token in a column declared INT), read it back through
    * [[Readers.csvQuarantined]], and summarize both sides with key
    * checksums. The quarantined side's checksum is recomputed FROM THE
    * RAW QUARANTINED LINES (first CSV field), proving malformed input
    * is preserved verbatim rather than dropped — the property the
    * reference's inferSchema read silently lacks. */
  def csvQuarantineSplit(s: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("quarantine", sfDir)
    Tables.orders(s, sfDir).select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        when(col("o_orderkey") % 97 === 0, lit("corrupt"))
          .otherwise((col("o_orderkey") % 1000).cast("string")).as("qty"))
      .write.mode("overwrite").option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("order_id", LongType), StructField("customer_id", LongType),
      StructField("qty", IntegerType)))
    val (clean, quarantined) = Readers.csvQuarantined(s, schema, dir)
    val cleanSide = clean.agg(
        count(lit(1)).as("n_rows"), sum(col("order_id")).as("key_sum"))
      .withColumn("split", lit("clean"))
    val badSide = quarantined
      .select(split(col("raw_line"), ",").getItem(0).cast("long").as("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("key_sum"))
      .withColumn("split", lit("quarantined"))
    cleanSide.unionByName(badSide)
      .select("split", "n_rows", "key_sum").orderBy("split")
  }

  val csvQuarantineSplitOracle: String =
    """SELECT * FROM (
         SELECT 'clean' AS split, count(*) AS n_rows,
                CAST(sum(o_orderkey) AS BIGINT) AS key_sum
         FROM orders WHERE o_orderkey % 97 <> 0
         UNION ALL
         SELECT 'quarantined', count(*),
                CAST(sum(o_orderkey) AS BIGINT)
         FROM orders WHERE o_orderkey % 97 = 0)
       ORDER BY split"""

  /** S3/S4 compaction as a query: fragment `events` into 64 small
    * files (the event-driven-ingest pathology), compact via
    * [[Writers.compacted]] (sized from actual on-disk bytes), and
    * summarize the compacted zone — count, key checksum, and distinct
    * users must survive both rewrites bit-for-bit. */
  def compactionRoundtrip(s: SparkSession, sfDir: String): DataFrame = {
    val smallDir = scratch("compact_small", sfDir)
    val outDir = scratch("compact_out", sfDir)
    Tables.events(s, sfDir).repartition(64)
      .write.mode("overwrite").parquet(smallDir)
    Writers.compacted(s.read.parquet(smallDir), outDir,
      targetFileBytes = 32L * 1024 * 1024)
    s.read.parquet(outDir).agg(
      count(lit(1)).as("n_rows"),
      sum(col("event_id")).as("event_id_sum"),
      countDistinct(col("user_id")).as("n_users"))
  }

  /** Source/sink format breadth: the same relation written to and read
    * back from JSON-lines and ORC (both ship with Spark; Avro's
    * connector module does not ship in this image), each leg reduced
    * to count + key + text-length checksums that the DuckDB oracle
    * reproduces from the original parquet — so what's verified is that
    * each format round-trips values (including multi-line/unicode
    * text through JSON string escaping) losslessly. JSON is read with
    * the declared schema: inference would force a second full scan,
    * the same rule as the CSV reader (Readers scaladoc). */
  def formatRoundtrips(s: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.documents(s, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    Seq("json", "orc").map { fmt =>
      val dir = scratch(s"fmt_$fmt", sfDir)
      src.write.mode("overwrite").format(fmt).save(dir)
      s.read.format(fmt).schema(src.schema).load(dir)
        .agg(count(lit(1)).as("n_rows"), sum(col("doc_id")).as("key_sum"),
          sum(length(col("text"))).as("text_len_sum"))
        .withColumn("format", lit(fmt))
    }.reduce(_.unionByName(_))
      .select("format", "n_rows", "key_sum", "text_len_sum")
      .orderBy("format")
  }

  val formatRoundtripsOracle: String = {
    val agg = """count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS key_sum,
                 CAST(sum(length(text)) AS BIGINT) AS text_len_sum"""
    s"""SELECT * FROM (
          SELECT 'json' AS format, $agg FROM documents
          UNION ALL
          SELECT 'orc', $agg FROM documents)
        ORDER BY format"""
  }

  val compactionRoundtripOracle: String =
    """SELECT count(*) AS n_rows,
              CAST(sum(event_id) AS BIGINT) AS event_id_sum,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events"""

  /** End-to-end migration validation — [[graft.ops.Profile.tableChecksum]]
    * APPLIED as its own gate: copy the three small dimension tables to
    * a scratch "target system" with the physical layout deliberately
    * changed (descending sort, single file), read the copies back, and
    * compare per-table content signatures. Because row order and file
    * layout differ by construction, a pass certifies the signatures
    * are CONTENT-only — the order-independence the checksum promises —
    * and the emitted content_match booleans are exactly the check a
    * 100 TB copy job runs instead of re-reading both sides. The oracle
    * recomputes source-side row counts and asserts the matches, so a
    * false mismatch (or a checksum that ignores content) fails the
    * gate. */
  def migrationValidation(s: SparkSession, sfDir: String): DataFrame = {
    val dir = scratch("migration", sfDir)
    val tables = Seq("region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey")
    tables.foreach { case (t, k) =>
      Tables.table(s, sfDir, t).orderBy(col(k).desc).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val names = tables.map(_._1).toSet
    val src = graft.ops.Profile.tableChecksumOf(s, sfDir, names)
    val dst = graft.ops.Profile.tableChecksumOf(s, dir, names)
      .selectExpr("table_name", "n_rows AS d_rows", "xor_sig AS d_xor",
        "sum_sig AS d_sum")
    src.join(dst, Seq("table_name"))
      .selectExpr("table_name", "n_rows",
        "n_rows = d_rows AND xor_sig = d_xor AND sum_sig = d_sum AS content_match")
      .orderBy("table_name")
  }

  val migrationValidationOracle: String =
    """SELECT * FROM (
         SELECT 'customer' AS table_name, count(*) AS n_rows,
           CAST(1 AS BOOLEAN) AS content_match FROM customer
         UNION ALL
         SELECT 'nation', count(*), CAST(1 AS BOOLEAN) FROM nation
         UNION ALL
         SELECT 'region', count(*), CAST(1 AS BOOLEAN) FROM region)
       ORDER BY table_name"""
}
