package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, sum}
import graft.io.Tables
import graft.llm.Gen._

/** One-pass table profiling: per-column null counts, exact distinct
  * counts, and min/max over an order proxy (the raw value for numeric
  * columns, epoch seconds for timestamps, string length for varchar —
  * chosen so every emitted stat is a DOUBLE with engine-exact
  * formatting, never a dialect-dependent value-to-string cast).
  *
  * The data-quality summary every ingestion run computes before
  * promoting a batch: all 44 statistics (11 columns × 4) come from ONE
  * scan — a single hash-less global aggregate — then a `stack` unpivot
  * reshapes the 1×45 row into the (column, stats) long form. The
  * unpivot touches one row, so the operator's cost IS the scan.
  *
  * Scale note: multiple exact `count(DISTINCT)`s in one aggregate make
  * Catalyst plan an Expand (one duplicated stream per distinct column
  * — 11× the scan rows into the partial aggregate). That is the
  * standard price of exact one-pass profiling; at 100 TB swap
  * `count(DISTINCT c)` for `approx_count_distinct(c)` (HLL, no
  * Expand), the same trade [[graft.curated.Aggregations]] documents
  * for its `_approx` variant. Everything else is a plain partial agg.
  */
object Profile {

  /** (column, kind) — kind picks the order proxy: num → value,
    * ts → epoch seconds, str → length. */
  private val cols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
    "l_linenumber" -> "num", "l_quantity" -> "num",
    "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
    "l_returnflag" -> "str", "l_linestatus" -> "str",
    "l_shipdate" -> "ts")

  private def basis(kind: String): String = kind match {
    case "num" => "value"
    case "ts"  => "epoch"
    case _     => "length"
  }

  private def ordExpr(c: String, kind: String, d: Dialect): String =
    (kind, d) match {
      case ("num", _)     => s"CAST($c AS DOUBLE)"
      case ("ts", SparkD) => s"CAST(unix_timestamp($c) AS DOUBLE)"
      case ("ts", DuckD)  => s"date_part('epoch', $c)"
      case (_, _)         => s"CAST(length($c) AS DOUBLE)"
    }

  private def aggExprs(d: Dialect): Seq[String] =
    Seq("CAST(count(*) AS BIGINT) AS n_rows") ++
      cols.zipWithIndex.flatMap { case ((c, kind), i) =>
        val ord = ordExpr(c, kind, d)
        Seq(
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$i",
          s"CAST(count(DISTINCT $c) AS BIGINT) AS nd_$i",
          s"min($ord) AS mn_$i", s"max($ord) AS mx_$i")
      }

  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val stackArgs = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"'$c', '${basis(kind)}', nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    // Multi-column count(DISTINCT) in ONE aggregate plans as an
    // Expand: every input row is replicated once per distinct column
    // (11 columns = 12x rows, all 11 source columns wide) before the
    // shuffle — measured 48 MB shuffled and the query's whole cost at
    // sf0.1, and at 100 TB it is an 11x row multiplication of the
    // scan stream. Decomposed instead into (a) one full-width pass
    // for every non-distinct stat (count/nulls/min/max partial-agg
    // map-side to a single row) and (b) one single-distinct branch
    // per column, each of which plans Expand-free as a two-level hash
    // agg over a scan COLUMN-PRUNED to that one column (the partial
    // agg dedups map-side, so the shuffle carries distinct values,
    // not rows). The 11 one-row results broadcast back onto the base
    // row; values are identical by construction, and the branches are
    // independent jobs the scheduler overlaps.
    val li = Tables.lineitem(spark, dir)
    // the distinct branches read the RAW scan (no spread): their
    // partial agg groups by the column value right on the scan task,
    // so the only exchange they pay carries DISTINCT VALUES — the
    // spread's round-robin exchange would re-shuffle all rows per
    // branch (measured: it kept the full 48 MB shuffle the Expand
    // removal was supposed to drop)
    val liRaw = Tables.table(spark, dir, "lineitem")
    val baseAggs = Seq("CAST(count(*) AS BIGINT) AS n_rows") ++
      cols.zipWithIndex.flatMap { case ((c, kind), i) =>
        val ord = ordExpr(c, kind, SparkD)
        Seq(
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$i",
          s"min($ord) AS mn_$i", s"max($ord) AS mx_$i")
      }
    val withNd = cols.zipWithIndex.foldLeft(li.selectExpr(baseAggs: _*)) {
      case (acc, ((c, _), i)) =>
        acc.crossJoin(org.apache.spark.sql.functions.broadcast(
          liRaw.selectExpr(s"CAST(count(DISTINCT $c) AS BIGINT) AS nd_$i")))
    }
    withNd
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, basis, n_null, n_distinct, min_ord, max_ord)")
      .select("column_name", "basis", "n_rows", "n_null", "n_distinct",
        "min_ord", "max_ord")
      .orderBy("column_name")
  }

  /** Join-key skew summary for the lineitem order key — the diagnostic
    * read before choosing salting ([[Scale.saltedJoin]]) or AQE skew
    * thresholds: rows, distinct keys, the heaviest key's row count,
    * the uniform-expected mean, and their ratio. Two hash aggs (key
    * count then single-row summary), both map-side combined; the
    * max/mean ratio is the number that says whether the shuffle's
    * largest partition is a straggler. */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("per_key"))
      .selectExpr(
        "CAST(sum(per_key) AS BIGINT) AS n_rows",
        "CAST(count(*) AS BIGINT) AS n_keys",
        "CAST(max(per_key) AS BIGINT) AS max_per_key")
      .selectExpr("n_rows", "n_keys", "max_per_key",
        "n_rows / CAST(n_keys AS DOUBLE) AS mean_per_key",
        "max_per_key / (n_rows / CAST(n_keys AS DOUBLE)) AS skew_ratio")

  val keySkewOracle: String =
    """WITH g AS (SELECT l_orderkey, count(*) AS per_key
          FROM lineitem GROUP BY l_orderkey),
        s AS (SELECT CAST(sum(per_key) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(max(per_key) AS BIGINT) AS max_per_key FROM g)
        SELECT n_rows, n_keys, max_per_key,
          n_rows / CAST(n_keys AS DOUBLE) AS mean_per_key,
          max_per_key / (n_rows / CAST(n_keys AS DOUBLE)) AS skew_ratio
        FROM s"""

  /** The three fixed-decimal columns the correlation pass quantizes
    * (column → scale): quantity has 2 decimals, discount/tax 4. */
  private val corrCols: Seq[(String, Int)] =
    Seq("l_quantity" -> 100, "l_discount" -> 10000, "l_tax" -> 10000)

  /** Pairwise Pearson correlations from exact integer moments — the
    * decomposable-statistics pattern for covariance/correlation at
    * scale: quantize each fixed-decimal column to integers, sum the
    * first and second moments in ONE map-side-combined pass (sums of
    * BIGINTs are order-independent, so re-partitioning can never
    * change a bit), then assemble each correlation with the textbook
    * n·Sxy − Sx·Sy formula as a fixed arithmetic tree over DOUBLE
    * casts of those exact sums — the same IEEE ops in both engines.
    * Quantization scales cancel in Pearson r, so no unscaling step.
    * Contrast with naive corr()/covar_samp(): float accumulation
    * order there depends on partitioning, which is exactly what a
    * 1000-executor run cannot keep stable. */
  def momentCorr(spark: SparkSession, dir: String): DataFrame = {
    val moments = momentExprs
    Tables.lineitem(spark, dir)
      .selectExpr(corrCols.map { case (c, s) =>
        s"CAST(round($c * $s) AS BIGINT) AS q_$c" }: _*)
      .selectExpr(moments: _*)
      .selectExpr(corrExprs: _*)
  }

  private def momentExprs: Seq[String] =
    Seq("CAST(count(*) AS BIGINT) AS n") ++
      corrCols.flatMap { case (c, _) =>
        Seq(s"CAST(sum(q_$c) AS BIGINT) AS s_$c",
          s"CAST(sum(q_$c * q_$c) AS BIGINT) AS ss_$c")
      } ++
      corrCols.combinations(2).map { case Seq((a, _), (b, _)) =>
        s"CAST(sum(q_$a * q_$b) AS BIGINT) AS sp_${a}_$b"
      }.toSeq

  private def corrExprs: Seq[String] =
    Seq("n") ++ corrCols.combinations(2).map { case Seq((a, _), (b, _)) =>
      val (n, sa, sb, ssa, ssb, sp) =
        ("CAST(n AS DOUBLE)", s"CAST(s_$a AS DOUBLE)", s"CAST(s_$b AS DOUBLE)",
          s"CAST(ss_$a AS DOUBLE)", s"CAST(ss_$b AS DOUBLE)",
          s"CAST(sp_${a}_$b AS DOUBLE)")
      s"($n * $sp - $sa * $sb) / (sqrt($n * $ssa - $sa * $sa) " +
        s"* sqrt($n * $ssb - $sb * $sb)) AS corr_${a.drop(2)}_${b.drop(2)}"
    }.toSeq

  val momentCorrOracle: String =
    s"""WITH q AS (SELECT ${corrCols.map { case (c, s) =>
          s"CAST(round($c * $s) AS BIGINT) AS q_$c" }.mkString(", ")}
          FROM lineitem),
        m AS (SELECT ${momentExprs.mkString(", ")} FROM q)
        SELECT ${corrExprs.mkString(", ")} FROM m"""

  /** Canonical column renderings for the content checksum: every value
    * is reduced to a dialect-identical string (ints verbatim, money and
    * fixed-4-decimal columns quantized to integers, timestamps as UTC
    * calendar dates) before hashing, so the signature depends on CONTENT
    * only, never on an engine's float or timestamp formatting. */
  private val checksumTables: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "str"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "str",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "int", "c_name" -> "str",
      "c_nationkey" -> "int", "c_acctbal" -> "cents",
      "c_mktsegment" -> "str"),
    "orders" -> Seq("o_orderkey" -> "int", "o_custkey" -> "int",
      "o_orderstatus" -> "str", "o_totalprice" -> "cents",
      "o_orderdate" -> "date", "o_orderpriority" -> "str"),
    "lineitem" -> Seq("l_orderkey" -> "int", "l_partkey" -> "int",
      "l_suppkey" -> "int", "l_linenumber" -> "int",
      "l_quantity" -> "cents", "l_extendedprice" -> "cents",
      "l_discount" -> "tenk", "l_tax" -> "tenk",
      "l_returnflag" -> "str", "l_linestatus" -> "str",
      "l_shipdate" -> "date"))

  /** Spearman rank correlation — the robust companion to
    * [[momentCorr]]'s Pearson: correlate the RANKS, so monotone but
    * non-linear association registers and outliers stop dominating.
    * Exactness: values quantize to integers first, so rank ties are
    * exact; ties take the textbook average rank, kept integral as
    * 2·avgRank = 2·rank + tieCount − 1; ranks center by subtracting
    * the known mean (n+1), making every product an exact BIGINT and
    * the three sums order-independent; each rho is then ONE fixed
    * double expression. Honest cost: ranking needs a global sort per
    * variable — three total-order windows — which is the price of
    * exact Spearman anywhere; at 100 TB swap the exact rank for a
    * bucketed ECDF (rank ≈ cumulative histogram position), which
    * turns each sort into one map-side-combined histogram. Product
    * sums: |dx·dy| ≤ 4n² per row ⇒ Σ grows as O(n³), past BIGINT
    * near n ≈ 2·10⁶ — so the moments accumulate in DECIMAL(38,0)
    * (the Q1 charge pattern; DECIMAL(19,0)·DECIMAL(19,0) lands on
    * 38,0 in BOTH engines), which holds to n ≈ 10¹² rows. Spark
    * non-ANSI would otherwise WRAP silently where DuckDB promotes
    * to HUGEINT — a cross-engine divergence, not just an overflow. */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .selectExpr(
        "CAST(round(l_quantity * 100) AS BIGINT) AS qx",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS qy",
        "CAST(round(l_discount * 10000) AS BIGINT) AS qz")
      .selectExpr(
        "2 * rank() OVER (ORDER BY qx) + count(*) OVER (PARTITION BY qx) - 1 AS rx2",
        "2 * rank() OVER (ORDER BY qy) + count(*) OVER (PARTITION BY qy) - 1 AS ry2",
        "2 * rank() OVER (ORDER BY qz) + count(*) OVER (PARTITION BY qz) - 1 AS rz2",
        "count(*) OVER () AS n")
      .selectExpr("n", "rx2 - (n + 1) AS dx", "ry2 - (n + 1) AS dy",
        "rz2 - (n + 1) AS dz")
      .selectExpr("n",
        "CAST(dx AS DECIMAL(19,0)) AS dx", "CAST(dy AS DECIMAL(19,0)) AS dy",
        "CAST(dz AS DECIMAL(19,0)) AS dz")
      .selectExpr(
        "CAST(max(n) AS BIGINT) AS n",
        "CAST(sum(dx * dx) AS DECIMAL(38,0)) AS sxx",
        "CAST(sum(dy * dy) AS DECIMAL(38,0)) AS syy",
        "CAST(sum(dz * dz) AS DECIMAL(38,0)) AS szz",
        "CAST(sum(dx * dy) AS DECIMAL(38,0)) AS sxy",
        "CAST(sum(dx * dz) AS DECIMAL(38,0)) AS sxz")
      .selectExpr("n",
        "CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))) AS rho_qty_price",
        "CAST(sxz AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(szz AS DOUBLE))) AS rho_qty_disc")

  val spearmanCorrOracle: String =
    """WITH q AS (SELECT
          CAST(round(l_quantity * 100) AS BIGINT) AS qx,
          CAST(round(l_extendedprice * 100) AS BIGINT) AS qy,
          CAST(round(l_discount * 10000) AS BIGINT) AS qz
          FROM lineitem),
        r AS (SELECT
            2 * rank() OVER (ORDER BY qx) + count(*) OVER (PARTITION BY qx) - 1 AS rx2,
            2 * rank() OVER (ORDER BY qy) + count(*) OVER (PARTITION BY qy) - 1 AS ry2,
            2 * rank() OVER (ORDER BY qz) + count(*) OVER (PARTITION BY qz) - 1 AS rz2,
            count(*) OVER () AS n
          FROM q),
        d AS (SELECT n,
            CAST(rx2 - (n + 1) AS DECIMAL(19,0)) AS dx,
            CAST(ry2 - (n + 1) AS DECIMAL(19,0)) AS dy,
            CAST(rz2 - (n + 1) AS DECIMAL(19,0)) AS dz FROM r),
        m AS (SELECT CAST(max(n) AS BIGINT) AS n,
            CAST(sum(dx * dx) AS DECIMAL(38,0)) AS sxx,
            CAST(sum(dy * dy) AS DECIMAL(38,0)) AS syy,
            CAST(sum(dz * dz) AS DECIMAL(38,0)) AS szz,
            CAST(sum(dx * dy) AS DECIMAL(38,0)) AS sxy,
            CAST(sum(dx * dz) AS DECIMAL(38,0)) AS sxz
          FROM d)
        SELECT n,
          CAST(sxy AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))) AS rho_qty_price,
          CAST(sxz AS DOUBLE) / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(szz AS DOUBLE))) AS rho_qty_disc
        FROM m"""

  /** Injective canonical rendering. Two hazards beyond type formatting:
    * `concat_ws` SKIPS null fields (so (a,NULL,b) and (a,b,NULL) would
    * collide), and a literal '|' inside a string value shifts field
    * boundaries (("a|b","c") vs ("a","b|c")). Strings therefore get
    * backslash-escaped ('\'→'\\', '|'→'\|') and every field is
    * null-coalesced to the sentinel '\N' AFTER escaping — a real "\N"
    * value escapes to "\\N", so the sentinel is unforgeable. The escape
    * text is built from chr(92) so the SAME SQL works in both engines:
    * Spark processes backslash escapes inside string literals, DuckDB
    * does not, and chr() sidesteps that divergence entirely. */
  private def canon(c: String, kind: String, d: Dialect): String = {
    val str = if (d == SparkD) "STRING" else "VARCHAR"
    val e = kind match {
      case "int"   => s"CAST(CAST($c AS BIGINT) AS $str)"
      case "cents" => s"CAST(CAST(round($c * 100) AS BIGINT) AS $str)"
      case "tenk"  => s"CAST(CAST(round($c * 10000) AS BIGINT) AS $str)"
      case "date"  => s"CAST(CAST($c AS DATE) AS $str)"
      case _       =>
        s"replace(replace($c, chr(92), chr(92) || chr(92)), '|', chr(92) || '|')"
    }
    s"coalesce($e, chr(92) || 'N')"
  }

  /** 15 hex chars (60 bits) of an md5 hex string → BIGINT: stays clear
    * of the signed-64 boundary in both engines. */
  private def hex2long(h: String, from1: Int, d: Dialect): String = d match {
    case SparkD => s"CAST(conv(substr($h, $from1, 15), 16, 10) AS BIGINT)"
    case DuckD  => s"CAST('0x' || substr($h, $from1, 15) AS BIGINT)"
  }

  /** Cross-engine table content fingerprint — the migration-validation
    * primitive: after copying 100 TB between systems, compare ONE row
    * per table instead of re-reading both copies. Each row's canonical
    * string is md5-hashed; the signature is (row count, XOR of the
    * hash's top 60 bits, SUM of the next 60 bits mod 2^20). XOR and
    * integer SUM are commutative — the signature is independent of
    * partitioning and row order, so a 1000-executor run and a DuckDB
    * single-thread run agree bit-for-bit. The mod-2^20 bound gives the
    * sum ~2^43 rows of overflow headroom. Each table is one
    * map-side-combined global aggregate over a projection — the cost
    * is the scan, nothing shuffles but one partial-agg row per task. */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame =
    tableChecksumOf(spark, dir, checksumTables.map(_._1).toSet)

  /** [[tableChecksum]] over a subset of the tables — the form a
    * migration run uses to validate just the tables it copied. */
  def tableChecksumOf(spark: SparkSession, dir: String,
      only: Set[String]): DataFrame =
    checksumTables.filter { case (t, _) => only.contains(t) }
      .map { case (t, cs) =>
        val key = cs.map { case (c, k) => canon(c, k, SparkD) }.mkString(", ")
        Tables.table(spark, dir, t)
          .selectExpr(s"md5(concat_ws('|', $key)) AS h")
          .selectExpr(s"${hex2long("h", 1, SparkD)} AS h1",
            s"${hex2long("h", 17, SparkD)} % 1048576 AS h2")
          .selectExpr(s"'$t' AS table_name",
            "CAST(count(*) AS BIGINT) AS n_rows",
            "CAST(bit_xor(h1) AS BIGINT) AS xor_sig",
            "CAST(sum(h2) AS BIGINT) AS sum_sig")
      }.reduce(_ unionByName _).orderBy("table_name")

  val tableChecksumOracle: String =
    checksumTables.map { case (t, cs) =>
      val key = cs.map { case (c, k) => canon(c, k, DuckD) }.mkString(", ")
      s"""SELECT '$t' AS table_name,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(bit_xor(${hex2long(s"md5(concat_ws('|', $key))", 1, DuckD)}) AS BIGINT) AS xor_sig,
            CAST(sum(${hex2long(s"md5(concat_ws('|', $key))", 17, DuckD)} % 1048576) AS BIGINT) AS sum_sig
          FROM $t"""
    }.mkString(" UNION ALL ") + " ORDER BY table_name"

  /** The star schema's foreign-key edges (child key → parent key). */
  private val fkRels: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** Referential-integrity audit over every FK edge: child rows, null
    * keys (non-references, not violations), and orphan rows/keys whose
    * parent is missing — the promotion gate an ingestion run checks
    * before publishing a batch. Scale shape per edge: the child is
    * first collapsed to (key, row count) by a map-side-combined hash
    * agg, so the anti-join probes DISTINCT keys (orders-of-magnitude
    * smaller than the fact table); the parent side is a key-only
    * projection (broadcast when dimension-sized). The final 1×1 cross
    * of the two single-row aggregates is driver-trivial. */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame =
    fkRels.map { case (ct, ck, pt, pk) =>
      val perKey = Tables.table(spark, dir, ct).selectExpr(s"$ck AS k")
        .groupBy("k").agg(count(lit(1)).as("k_rows"))
      val parent = Tables.table(spark, dir, pt)
        .selectExpr(s"$pk AS k").distinct()
      val orphans = perKey.filter("k IS NOT NULL")
        .join(parent, Seq("k"), "left_anti")
        .selectExpr("CAST(coalesce(sum(k_rows), 0) AS BIGINT) AS n_orphans",
          "CAST(count(*) AS BIGINT) AS n_orphan_keys")
      // coalesce: sum over an EMPTY child table is NULL, but the audit
      // must stay total — an empty batch has 0 rows, not unknown rows
      // (the orphan branch already coalesces for the same reason).
      perKey.selectExpr(s"'$ct.$ck -> $pt.$pk' AS relationship",
          "CAST(coalesce(sum(k_rows), 0) AS BIGINT) AS n_child",
          "CAST(coalesce(sum(CASE WHEN k IS NULL THEN k_rows ELSE 0 END), 0) AS BIGINT) AS n_null_keys")
        .crossJoin(orphans)
    }.reduce(_ unionByName _).orderBy("relationship")

  val fkIntegrityOracle: String =
    fkRels.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct.$ck -> $pt.$pk' AS relationship,
            CAST((SELECT count(*) FROM $ct) AS BIGINT) AS n_child,
            CAST((SELECT count(*) FROM $ct WHERE $ck IS NULL) AS BIGINT) AS n_null_keys,
            CAST((SELECT coalesce(count(*), 0) FROM $ct c
              WHERE c.$ck IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck)) AS BIGINT) AS n_orphans,
            CAST((SELECT count(DISTINCT c.$ck) FROM $ct c
              WHERE c.$ck IS NOT NULL AND NOT EXISTS
                (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck)) AS BIGINT) AS n_orphan_keys"""
    }.mkString(" UNION ALL ") + " ORDER BY relationship"

  /** Histogram layout for [[priceHistogram]]: fixed equi-width buckets
    * over l_extendedprice (fixture range ≈ 900..105000). Fixed bounds,
    * not data-driven min/max, so the binning expression is a pure
    * per-row projection — no extra pass over the data to find the
    * range, which at 100 TB would double the scan cost. */
  private val histWidth = 5000
  private val histBuckets = 22

  /** Equi-width histogram with a zero-filled bucket spine: per-row
    * clamped integer binning (one map-side-combined hash agg onto ≤22
    * groups — the whole table dies in the partial aggregate), then a
    * left join from the literal bucket spine so EMPTY buckets appear
    * with count 0 (a histogram with silent holes misleads exactly when
    * the distribution is the question). Share-of-total is an exact
    * integer ratio in one fixed double division. */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.lineitem(spark, dir)
      .selectExpr("least(greatest(CAST(floor(l_extendedprice / " +
        s"$histWidth) AS BIGINT), 0), ${histBuckets - 1}) AS bucket")
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val spine = binned.sparkSession.range(0, histBuckets)
      .selectExpr("CAST(id AS BIGINT) AS bucket")
    spine.join(binned, Seq("bucket"), "left")
      .selectExpr("bucket",
        s"bucket * $histWidth AS lo", s"(bucket + 1) * $histWidth AS hi",
        "CAST(coalesce(n, 0) AS BIGINT) AS n_rows")
      .withColumn("share", col("n_rows") /
        sum(col("n_rows")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()).cast("double"))
      .orderBy("bucket")
  }

  val priceHistogramOracle: String =
    s"""WITH b AS (SELECT least(greatest(CAST(floor(l_extendedprice /
            $histWidth) AS BIGINT), 0), ${histBuckets - 1}) AS bucket,
            count(*) AS n
          FROM lineitem GROUP BY 1),
        spine AS (SELECT unnest(range(0, $histBuckets)) AS bucket),
        g AS (SELECT spine.bucket, spine.bucket * $histWidth AS lo,
                (spine.bucket + 1) * $histWidth AS hi,
                CAST(coalesce(b.n, 0) AS BIGINT) AS n_rows
              FROM spine LEFT JOIN b ON spine.bucket = b.bucket)
        SELECT bucket, lo, hi, n_rows,
          n_rows / CAST(sum(n_rows) OVER () AS DOUBLE) AS share
        FROM g ORDER BY bucket"""

  /** The 100 TB profile: identical shape to [[tableProfile]] but every
    * exact `count(DISTINCT)` is an `approx_count_distinct` HLL sketch —
    * ONE partial-aggregable pass with NO Expand (the exact form
    * duplicates the scan stream once per distinct column; 11 columns =
    * 11× rows into the partial agg). `ProfilePlanSpec` pins the
    * no-Expand plan contract. Not oracle-checked directly (a sketch
    * value can never hash-match DuckDB); the audit variant below is the
    * correctness gate. */
  def tableProfileApprox(spark: SparkSession, dir: String): DataFrame = {
    val aggs = Seq("CAST(count(*) AS BIGINT) AS n_rows") ++
      cols.zipWithIndex.flatMap { case ((c, kind), i) =>
        val ord = ordExpr(c, kind, SparkD)
        Seq(
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$i",
          s"CAST(approx_count_distinct($c) AS BIGINT) AS nd_$i",
          s"min($ord) AS mn_$i", s"max($ord) AS mx_$i")
      }
    val stackArgs = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"'$c', '${basis(kind)}', nn_$i, nd_$i, mn_$i, mx_$i"
    }.mkString(", ")
    Tables.lineitem(spark, dir)
      .selectExpr(aggs: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column_name, basis, n_null, n_distinct, min_ord, max_ord)")
      .select("column_name", "basis", "n_rows", "n_null", "n_distinct",
        "min_ord", "max_ord")
      .orderBy("column_name")
  }

  /** Bounds audit for [[tableProfileApprox]] — the oracle-checkable
    * face of the sketched profile (the [[graft.curated.Aggregations]]
    * HLL-audit pattern): emit the EXACT profile columns plus flags
    * asserting (a) the HLL distinct estimate sits inside a 4-sigma band
    * (default rsd 0.05 ⇒ 20%) with absolute slack 3 for tiny columns,
    * and (b) every non-sketched stat of the approx run is bit-identical
    * to the exact run's. The DuckDB oracle computes the same exact
    * columns and literal-1 flags, so a sketch drifting past its bound
    * flips a flag and fails the hash compare. Deterministic: HLL++ is
    * an order-independent function of the value set. */
  def tableProfileApproxAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = tableProfile(spark, dir)
    val approx = tableProfileApprox(spark, dir).selectExpr(
      "column_name", "n_rows AS a_rows", "n_null AS a_null",
      "n_distinct AS a_distinct", "min_ord AS a_min", "max_ord AS a_max")
    exact.join(approx, Seq("column_name"))
      .selectExpr("column_name", "basis", "n_rows", "n_null", "n_distinct",
        "min_ord", "max_ord",
        "CAST(abs(a_distinct - n_distinct) <= greatest(CAST(3 AS BIGINT), " +
          "CAST(ceil(0.2 * n_distinct) AS BIGINT)) AS INT) AS distinct_within_bound",
        "CAST(a_rows = n_rows AND a_null = n_null AND a_min = min_ord " +
          "AND a_max = max_ord AS INT) AS exact_columns_match")
      .orderBy("column_name")
  }

  val tableProfileApproxAuditOracle: String = {
    val rows = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"""SELECT '$c' AS column_name, '${basis(kind)}' AS basis, n_rows,
            nn_$i AS n_null, nd_$i AS n_distinct,
            mn_$i AS min_ord, mx_$i AS max_ord FROM p"""
    }.mkString(" UNION ALL ")
    s"""WITH p AS (SELECT ${aggExprs(DuckD).mkString(", ")} FROM lineitem),
        e AS ($rows)
        SELECT column_name, basis, n_rows, n_null, n_distinct, min_ord,
          max_ord, 1 AS distinct_within_bound, 1 AS exact_columns_match
        FROM e ORDER BY column_name"""
  }

  val tableProfileOracle: String = {
    val rows = cols.zipWithIndex.map { case ((c, kind), i) =>
      s"""SELECT '$c' AS column_name, '${basis(kind)}' AS basis, n_rows,
            nn_$i AS n_null, nd_$i AS n_distinct,
            mn_$i AS min_ord, mx_$i AS max_ord FROM p"""
    }.mkString(" UNION ALL ")
    s"""WITH p AS (SELECT ${aggExprs(DuckD).mkString(", ")} FROM lineitem)
        $rows ORDER BY column_name"""
  }

  // ---- declarative data-contract expectations ----

  /** (check name, table, violation predicate) — the dbt-test /
    * Great-Expectations surface: each check is a named predicate whose
    * VIOLATION count must be zero. Domains are the fixture's actual
    * contracts (TPC-H quantity 1..50, discount 0..0.10, status and
    * return-flag code sets). */
  private val expectations: Seq[(String, String, String)] = Seq(
    ("lineitem.quantity_in_1_50", "lineitem",
      "l_quantity < 1 OR l_quantity > 50"),
    ("lineitem.discount_in_0_10pct", "lineitem",
      "l_discount < 0 OR l_discount > 0.10"),
    ("lineitem.extendedprice_positive", "lineitem",
      "l_extendedprice <= 0"),
    ("lineitem.shipdate_not_null", "lineitem",
      "l_shipdate IS NULL"),
    ("lineitem.returnflag_domain", "lineitem",
      "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("orders.totalprice_positive", "orders",
      "o_totalprice <= 0"),
    ("orders.status_domain", "orders",
      "o_orderstatus NOT IN ('F', 'O', 'P')"))

  /** Data-contract readout: every expectation as one row
    * (check, n_checked, n_violations, passed). All checks against a
    * table ride ONE scan (conditional sums in a single
    * map-side-combined agg — adding a check costs one expression, not
    * one job), which is the only way a 50-check contract suite stays
    * affordable on a 100 TB table. The unpivot to rows is driver-free
    * (stack); `passed` is an exact integer comparison. */
  def tableExpectations(spark: SparkSession, dir: String): DataFrame = {
    val byTable = expectations.groupBy(_._2).toSeq.sortBy(_._1)
    byTable.map { case (table, checks) =>
      val agg = Tables.table(spark, dir, table).agg(
        expr("CAST(count(1) AS BIGINT)").as("n_checked"),
        checks.zipWithIndex.map { case ((_, _, pred), i) =>
          expr(s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT)").as(s"v_$i")
        }: _*)
      val stackArgs = checks.zipWithIndex
        .map { case ((name, _, _), i) => s"'$name', v_$i" }.mkString(", ")
      agg.selectExpr("n_checked",
          s"stack(${checks.size}, $stackArgs) AS (check_name, n_violations)")
        .selectExpr("check_name", "n_checked", "n_violations",
          "CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed")
    }.reduce(_ unionByName _).orderBy("check_name")
  }

  val tableExpectationsOracle: String = {
    val rows = expectations.map { case (name, table, pred) =>
      s"""SELECT '$name' AS check_name,
            CAST((SELECT count(*) FROM $table) AS BIGINT) AS n_checked,
            CAST((SELECT count(*) FROM $table WHERE $pred) AS BIGINT) AS n_violations,
            CASE WHEN (SELECT count(*) FROM $table WHERE $pred) = 0
              THEN 1 ELSE 0 END AS passed"""
    }.mkString(" UNION ALL ")
    s"$rows ORDER BY check_name"
  }

  // ---- write-layout planner ----

  /** (table, fixed bytes per row, string columns, float-array columns)
    * — the width model both engines price identically: 8 B for
    * BIGINT/DOUBLE/TIMESTAMP, 4 B for INTEGER, character count for
    * strings, 4·len for float arrays. */
  private val writeSpecs: Seq[(String, Int, Seq[String], Seq[String])] = Seq(
    ("region", 4, Seq("r_name"), Nil),
    ("nation", 8, Seq("n_name"), Nil),
    ("customer", 20, Seq("c_name", "c_mktsegment"), Nil),
    ("supplier", 20, Seq("s_name"), Nil),
    ("part", 20, Seq("p_name", "p_brand", "p_type"), Nil),
    ("orders", 32, Seq("o_orderstatus", "o_orderpriority"), Nil),
    ("lineitem", 68, Seq("l_returnflag", "l_linestatus"), Nil),
    ("events", 32, Seq("event_type", "props"), Nil),
    ("documents", 16, Seq("text", "lang", "source"), Nil),
    ("embeddings", 12, Nil, Seq("embedding")))

  private val targetFileBytes = 128L * 1024 * 1024

  /** `table_write_plan`: the file-count planner a write job runs
    * BEFORE `repartition(n)` — per table, the exact row count, the
    * modeled uncompressed byte mass (fixed type widths + measured
    * string/array mass), and the partition count that lands files at
    * the 128 MiB target with its rows-per-file consequence. Too many
    * small files poisons the downstream scan (file-open overhead,
    * row-group fragmentation); too few starves parallelism — this
    * table is where that trade is decided from data, not guessed.
    * One map-side-combined agg per table; the variable mass is
    * measured, not sampled, because it rides the same scan that
    * counts rows. */
  def writePlan(spark: SparkSession, dir: String): DataFrame =
    writeSpecs.map { case (name, fixed, strCols, arrCols) =>
      val varTerms = strCols.map(c => s"CAST(length($c) AS BIGINT)") ++
        arrCols.map(c => s"CAST(4 * size($c) AS BIGINT)")
      val varExpr = if (varTerms.isEmpty) "CAST(0 AS BIGINT)"
        else varTerms.mkString(" + ")
      Tables.table(spark, dir, name)
        .selectExpr(s"$varExpr AS var_bytes")
        .agg(count(lit(1)).as("n_rows"), sum("var_bytes").as("var_bytes"))
        .selectExpr(s"'$name' AS table_name",
          "CAST(n_rows AS BIGINT) AS n_rows",
          s"CAST(n_rows * $fixed + var_bytes AS BIGINT) AS est_bytes")
        .selectExpr("table_name", "n_rows", "est_bytes",
          s"(est_bytes + ${targetFileBytes - 1}) DIV $targetFileBytes AS target_files")
        .selectExpr("*", "(n_rows + target_files - 1) DIV target_files AS rows_per_file")
    }.reduce(_ unionByName _).orderBy("table_name")

  val writePlanOracle: String = {
    val rows = writeSpecs.map { case (name, fixed, strCols, arrCols) =>
      val varTerms = strCols.map(c => s"CAST(length($c) AS BIGINT)") ++
        arrCols.map(c => s"CAST(4 * len($c) AS BIGINT)")
      val varExpr = if (varTerms.isEmpty) "CAST(0 AS BIGINT)"
        else varTerms.mkString(" + ")
      s"""SELECT '$name' AS table_name,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) * $fixed + sum($varExpr) AS BIGINT) AS est_bytes
          FROM $name"""
    }.mkString(" UNION ALL ")
    s"""WITH base AS ($rows),
        f AS (SELECT *, (est_bytes + ${targetFileBytes - 1}) // $targetFileBytes AS target_files
              FROM base)
        SELECT table_name, n_rows, est_bytes, target_files,
          (n_rows + target_files - 1) // target_files AS rows_per_file
        FROM f ORDER BY table_name"""
  }

  // ---- k-anonymity audit ----

  /** K-anonymity audit over the customer quasi-identifiers — the
    * re-identification QC a privacy review runs before a table is
    * cleared for sharing (Sweeney 2002): every row whose
    * quasi-identifier combination is shared by fewer than k=5 people
    * is at linkage risk. Audited at TWO generalization levels of the
    * lattice — (nation, segment) and the coarser (region, segment) —
    * because generalization is k-anonymity's remedy: groups that are
    * risky at nation grain usually dissolve into safe region-grain
    * groups, and the paired readout shows exactly which do.
    *
    * Shape: two hash aggs onto dim-bounded grids (|nations|x|segments|
    * and |regions|x|segments|), nation/region dims broadcast; the
    * at-risk flag is an integer comparison. One scan per level at any
    * corpus size. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.table(spark, dir, "customer")
    val nations = Tables.table(spark, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val regions = Tables.table(spark, dir, "region")
      .select("r_regionkey", "r_name")
    val geo = org.apache.spark.sql.functions.broadcast(
      nations.join(regions, col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name", "r_name"))
    val byNation = cust
      .join(geo, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_mktsegment")
      .agg(count(lit(1)).as("group_size"))
      .selectExpr("'nation_segment' AS level", "n_name AS qi_geo",
        "c_mktsegment AS qi_segment", "group_size")
    val byRegion = cust
      .join(geo, col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name", "c_mktsegment")
      .agg(count(lit(1)).as("group_size"))
      .selectExpr("'region_segment' AS level", "r_name AS qi_geo",
        "c_mktsegment AS qi_segment", "group_size")
    byNation.unionByName(byRegion)
      .selectExpr("level", "qi_geo", "qi_segment", "group_size",
        "CASE WHEN group_size < 5 THEN 1 ELSE 0 END AS at_risk")
      .orderBy("level", "qi_geo", "qi_segment")
  }

  /** L-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    * companion check: a group can be large (k-safe) yet still leak if
    * everyone in it shares the same SENSITIVE value, so each
    * (nation, segment) equivalence class is audited for the diversity
    * of its sensitive attribute — here the account-balance band
    * (negative / low / mid / high at fixed thresholds), the classic
    * financial sensitive proxy. Reports distinct-value count,
    * l≥2 / l≥3 flags, and the dominant band's share (the quantity the
    * homogeneity attack exploits). Shape: one hash agg to the
    * (class × band) grid, one to the class grid — both dim-bounded;
    * the dominant share is a struct-max over the ≤4 band rows per
    * class, never a window over customers. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.table(spark, dir, "customer")
    val nations = Tables.table(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    val band =
      """CASE WHEN c_acctbal < 0 THEN 'negative'
              WHEN c_acctbal < 3000 THEN 'low'
              WHEN c_acctbal < 7000 THEN 'mid'
              ELSE 'high' END"""
    val byBand = cust
      .join(org.apache.spark.sql.functions.broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
      .selectExpr("n_name AS qi_geo", "c_mktsegment AS qi_segment",
        s"$band AS sens_band")
      .groupBy("qi_geo", "qi_segment", "sens_band")
      .agg(count(lit(1)).as("band_n"))
    byBand.groupBy("qi_geo", "qi_segment")
      .agg(sum("band_n").as("group_size"),
        count(lit(1)).as("n_bands"),
        max("band_n").as("dominant_n"))
      .selectExpr("qi_geo", "qi_segment",
        "CAST(group_size AS BIGINT) AS group_size",
        "CAST(n_bands AS BIGINT) AS n_bands",
        "CAST(dominant_n AS BIGINT) AS dominant_n",
        "CASE WHEN n_bands >= 2 THEN 1 ELSE 0 END AS l2_ok",
        "CASE WHEN n_bands >= 3 THEN 1 ELSE 0 END AS l3_ok",
        "CAST(dominant_n AS DOUBLE) / group_size AS dominant_share")
      .orderBy("qi_geo", "qi_segment")
  }

  val lDiversityOracle: String =
    """WITH jb AS (SELECT n.n_name AS qi_geo, c.c_mktsegment AS qi_segment,
          CASE WHEN c.c_acctbal < 0 THEN 'negative'
               WHEN c.c_acctbal < 3000 THEN 'low'
               WHEN c.c_acctbal < 7000 THEN 'mid'
               ELSE 'high' END AS sens_band
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        bb AS (SELECT qi_geo, qi_segment, sens_band, count(*) AS band_n
               FROM jb GROUP BY qi_geo, qi_segment, sens_band),
        g AS (SELECT qi_geo, qi_segment,
                CAST(sum(band_n) AS BIGINT) AS group_size,
                count(*) AS n_bands,
                CAST(max(band_n) AS BIGINT) AS dominant_n
              FROM bb GROUP BY qi_geo, qi_segment)
        SELECT qi_geo, qi_segment, group_size,
          CAST(n_bands AS BIGINT) AS n_bands, dominant_n,
          CASE WHEN n_bands >= 2 THEN 1 ELSE 0 END AS l2_ok,
          CASE WHEN n_bands >= 3 THEN 1 ELSE 0 END AS l3_ok,
          CAST(dominant_n AS DOUBLE) / group_size AS dominant_share
        FROM g ORDER BY qi_geo, qi_segment"""

  /** T-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy-audit ladder after [[kAnonymity]] and
    * [[lDiversity]]: a class can be large AND diverse yet still leak
    * if its sensitive-value DISTRIBUTION differs sharply from the
    * corpus-wide one (skewness attack). For the ordered acctbal bands
    * (negative < low < mid < high) the prescribed distance is the
    * Earth Mover's Distance with unit ground steps, which for an
    * ordered domain collapses to the mean absolute difference of the
    * cumulative distributions: EMD = Σᵢ|cumPᵢ−cumQᵢ|/(m−1) over the
    * first m−1 bands.
    *
    * Exactness: both CDFs stay integer — the per-class comparison is
    * |cum_class·N − cum_global·n_class| (BIGINT), summed per class,
    * and the t ≤ 0.2 flag is the cross-multiplied integer inequality
    * 5·emd_num ≤ 3·n_class·N, so the audit verdict never touches a
    * double; the reported emd is one exact-integer division readout.
    * Shape: two hash aggs onto dim-bounded grids (class×band, band),
    * a 4-row band spine densifies classes that miss a band (EMD needs
    * the zero terms), the global band CDF and the corpus total ride
    * one-row/4-row broadcasts, and the per-class cumulative window
    * partitions on the class key over ≤4 rows — nothing data-sized is
    * ever sorted or broadcast. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.table(spark, dir, "customer")
    val nations = Tables.table(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    val bandOrd =
      """CASE WHEN c_acctbal < 0 THEN 0
              WHEN c_acctbal < 3000 THEN 1
              WHEN c_acctbal < 7000 THEN 2
              ELSE 3 END"""
    val jb = cust
      .join(org.apache.spark.sql.functions.broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
      .selectExpr("n_name AS qi_geo", "c_mktsegment AS qi_segment",
        s"$bandOrd AS b")
    val cb = jb.groupBy("qi_geo", "qi_segment", "b")
      .agg(count(lit(1)).as("cnt"))
    val cls = jb.groupBy("qi_geo", "qi_segment")
      .agg(count(lit(1)).as("n_class"))
    val glob = jb.groupBy("b").agg(count(lit(1)).as("gcnt"))
    val wg = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    val globCum = glob
      .withColumn("cum_g", sum("gcnt").over(wg))
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        jb.agg(count(lit(1)).as("n_total"))))
      .select("b", "cum_g", "n_total")
    val spine = spark.range(4).selectExpr("CAST(id AS INT) AS b")
    val grid = cls.crossJoin(org.apache.spark.sql.functions.broadcast(spine))
      .join(cb, Seq("qi_geo", "qi_segment", "b"), "left")
      .na.fill(0L, Seq("cnt"))
      .join(org.apache.spark.sql.functions.broadcast(globCum), Seq("b"))
    val wc = Window.partitionBy("qi_geo", "qi_segment").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.withColumn("cum_c", sum("cnt").over(wc))
      .filter(col("b") < 3)
      .groupBy("qi_geo", "qi_segment")
      .agg(max("n_class").as("n_class"), max("n_total").as("n_total"),
        sum(expr("abs(cum_c * n_total - cum_g * n_class)")).as("emd_num"))
      .selectExpr("qi_geo", "qi_segment",
        "CAST(n_class AS BIGINT) AS group_size",
        "CAST(emd_num AS BIGINT) AS emd_num",
        """CAST(emd_num AS DOUBLE)
           / (CAST(n_class AS DOUBLE) * n_total * 3) AS emd""",
        "CASE WHEN 5 * emd_num <= 3 * n_class * n_total THEN 1 ELSE 0 END AS t02_ok")
      .orderBy("qi_geo", "qi_segment")
  }

  val tClosenessOracle: String =
    """WITH jb AS (SELECT n.n_name AS qi_geo, c.c_mktsegment AS qi_segment,
          CASE WHEN c.c_acctbal < 0 THEN 0
               WHEN c.c_acctbal < 3000 THEN 1
               WHEN c.c_acctbal < 7000 THEN 2
               ELSE 3 END AS b
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
        cb AS (SELECT qi_geo, qi_segment, b, count(*) AS cnt
               FROM jb GROUP BY qi_geo, qi_segment, b),
        cls AS (SELECT qi_geo, qi_segment, count(*) AS n_class
                FROM jb GROUP BY qi_geo, qi_segment),
        gb AS (SELECT b, count(*) AS gcnt FROM jb GROUP BY b),
        tot AS (SELECT count(*) AS n_total FROM jb),
        globcum AS (SELECT b,
            sum(gcnt) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
            n_total
          FROM gb, tot),
        spine AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(b)),
        grid AS (SELECT cls.qi_geo, cls.qi_segment, spine.b, cls.n_class,
            coalesce(cb.cnt, 0) AS cnt, g.cum_g, g.n_total
          FROM cls CROSS JOIN spine
          LEFT JOIN cb ON cb.qi_geo = cls.qi_geo
            AND cb.qi_segment = cls.qi_segment AND cb.b = spine.b
          JOIN globcum g ON g.b = spine.b),
        cum_t AS (SELECT *,
            sum(cnt) OVER (PARTITION BY qi_geo, qi_segment ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
          FROM grid),
        agg AS (SELECT qi_geo, qi_segment,
            max(n_class) AS n_class, max(n_total) AS n_total,
            sum(abs(cum_c * n_total - cum_g * n_class)) AS emd_num
          FROM cum_t WHERE b < 3 GROUP BY qi_geo, qi_segment)
        SELECT qi_geo, qi_segment,
          CAST(n_class AS BIGINT) AS group_size,
          CAST(emd_num AS BIGINT) AS emd_num,
          CAST(emd_num AS DOUBLE)
           / (CAST(n_class AS DOUBLE) * n_total * 3) AS emd,
          CASE WHEN 5 * emd_num <= 3 * n_class * n_total THEN 1 ELSE 0 END AS t02_ok
        FROM agg ORDER BY qi_geo, qi_segment"""

  /** Two-sided-geometric inverse-CDF thresholds for the DP release:
    * T_j = ⌊CDF(j)·2³²⌋ for j ∈ [−16, 15], α = e^−ε with ε = 0.5.
    * Computed ONCE here and baked into both engines' SQL as integer
    * literals (the [[graft.sql.Analytics]] Poisson-bootstrap
    * discipline): the queries never call exp/ln, so libm never gets a
    * vote. P(|noise| > 16) ≈ 2·α¹⁷/(1+α) ≈ 2.4e-4 — those draws clamp
    * to +16 (documented truncation). */
  private val geomEps = 0.5
  private val geomRange = 16
  private val geomThresholds: Seq[(Int, Long)] = {
    val a = math.exp(-geomEps)
    val p0 = (1 - a) / (1 + a)
    def pmf(j: Int): Double = p0 * math.pow(a, math.abs(j))
    var cum = 0.0
    (-geomRange to geomRange - 1).map { j =>
      cum += pmf(j)
      j -> math.floor(cum * 4294967296.0).toLong
    }
  }

  private def geomNoiseExpr(h: String): String = {
    val cases = geomThresholds
      .map { case (j, t) => s"WHEN $h < $t THEN ($j)" }.mkString(" ")
    s"(CASE $cases ELSE $geomRange END)"
  }

  /** `customers_dp_release`: per-nation customer counts released
    * under the DISCRETE (two-sided geometric) mechanism — the integer
    * Laplace used for production DP count releases (Ghosh,
    * Roughgarden & Sundararajan 2009: the geometric mechanism is the
    * universally optimal ε-DP release for counts): noise_j has
    * P ∝ α^|j| with α = e^−ε, added to each true count, clamped at 0.
    *
    * The "draw" is the 32-bit md5 prefix of the nation name against
    * the baked inverse-CDF thresholds above — deterministic, so both
    * engines release identical values and re-runs can't double-spend
    * the privacy budget by re-rolling. (A production release would
    * draw the noise from real entropy ONCE and persist it; the
    * deterministic coin here is that persisted draw, expressed as a
    * pure function so the oracle can replay it.) Shape: one hash agg
    * onto the nation grid + a broadcast dim join; noise is a per-row
    * CASE over integer literals. Everything BIGINT; the audit columns
    * pin |noise| ≤ 16 and noisy ≥ 0 as literal 1s the oracle
    * re-asserts. */
  def dpRelease(spark: SparkSession, dir: String): DataFrame = {
    import graft.llm.Gen.hexPrefix32
    val cust = Tables.table(spark, dir, "customer")
    val nations = Tables.table(spark, dir, "nation")
      .select("n_nationkey", "n_name")
    val counts = cust.groupBy("c_nationkey")
      .agg(count(lit(1)).as("true_count"))
      .join(org.apache.spark.sql.functions.broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
    counts
      .selectExpr("n_name", "CAST(true_count AS BIGINT) AS true_count",
        s"${hexPrefix32("md5(concat('dp:', n_name))")} AS h")
      .selectExpr("n_name", "true_count",
        s"CAST(${geomNoiseExpr("h")} AS BIGINT) AS noise")
      .selectExpr("n_name", "true_count", "noise",
        "greatest(true_count + noise, CAST(0 AS BIGINT)) AS noisy_count",
        s"CASE WHEN abs(noise) <= $geomRange THEN 1 ELSE 0 END AS noise_bounded",
        "CASE WHEN greatest(true_count + noise, CAST(0 AS BIGINT)) >= 0 " +
          "THEN 1 ELSE 0 END AS nonneg_ok")
      .orderBy("n_name")
  }

  val dpReleaseOracle: String = {
    import graft.llm.Gen.hexPrefix32
    s"""WITH counts AS (SELECT n.n_name, count(*) AS true_count
          FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_name),
        h_t AS (SELECT n_name, CAST(true_count AS BIGINT) AS true_count,
            ${hexPrefix32("md5(concat('dp:', n_name))")} AS h
          FROM counts),
        z AS (SELECT n_name, true_count,
            CAST(${geomNoiseExpr("h")} AS BIGINT) AS noise
          FROM h_t)
        SELECT n_name, true_count, noise,
          greatest(true_count + noise, CAST(0 AS BIGINT)) AS noisy_count,
          CASE WHEN abs(noise) <= $geomRange THEN 1 ELSE 0 END AS noise_bounded,
          CASE WHEN greatest(true_count + noise, CAST(0 AS BIGINT)) >= 0
            THEN 1 ELSE 0 END AS nonneg_ok
        FROM z ORDER BY n_name"""
  }

  val kAnonymityOracle: String =
    """WITH geo AS (SELECT n.n_nationkey, n.n_name, r.r_name
          FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
        lv AS (
          SELECT 'nation_segment' AS level, g.n_name AS qi_geo,
            c.c_mktsegment AS qi_segment, count(*) AS group_size
          FROM customer c JOIN geo g ON c.c_nationkey = g.n_nationkey
          GROUP BY 1, 2, 3
          UNION ALL
          SELECT 'region_segment' AS level, g.r_name AS qi_geo,
            c.c_mktsegment AS qi_segment, count(*) AS group_size
          FROM customer c JOIN geo g ON c.c_nationkey = g.n_nationkey
          GROUP BY 1, 2, 3)
        SELECT level, qi_geo, qi_segment, group_size,
          CASE WHEN group_size < 5 THEN 1 ELSE 0 END AS at_risk
        FROM lv ORDER BY level, qi_geo, qi_segment"""
}
