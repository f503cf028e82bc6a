package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import Gen._

/** Embedding compression for vector stores: per-dimension symmetric
  * INT8 scalar quantization and Johnson–Lindenstrauss random
  * projection — the two standard ways a 100 TB vector corpus shrinks
  * its working set before ANN indexing (scalar quantization is what
  * FAISS `SQ8` / every production vector DB does for 4× memory;
  * JL projection bounds pairwise-distance distortion while cutting
  * dimensionality, Achlioptas 2003 for the ±1 matrix variant).
  *
  * Scale shape: the "training" pass for SQ8 is ONE map-side-combined
  * aggregation producing a 64-value row (per-dim max |x|), broadcast
  * back; quantization itself rides the scan — zero shuffles beyond
  * the 1-row agg. The JL projection is purely per-row (the ±1 matrix
  * is hash-derived, never materialized), so it is embarrassingly
  * parallel at any corpus size.
  *
  * Determinism discipline: quantized codes are exact integers decided
  * by `floor(x·127/m + 0.5)` — floor, not round, so the tie direction
  * is pinned on both engines; reconstruction error readouts are
  * nano-quantized BIGINTs (the [[Similarity]] idiom) so no float
  * crosses the oracle boundary unquantized.
  */
object Quantize {

  private val dims = embeddingDims // 64
  private val projDims = 16
  private val pairAudit = 40

  /** floor(x + 0.5): round-half-up with an engine-agnostic tie
    * direction (Spark round() is HALF_UP, DuckDB rounds half away
    * from zero — identical for positives, divergent for negatives,
    * so neither is used on a signed value anywhere here). */
  private def rhu(x: String): String = s"floor($x + 0.5)"

  private def vecsD(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Native.register(spark)
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "label", s"${toDoubleArr("embedding", SparkD)} AS v")
  }

  private def vecsDCte(d: Dialect): String =
    s"ve AS (SELECT vec_id, label, ${toDoubleArr("embedding", d)} AS v FROM embeddings)"

  // ---- embedding centroid drift between hash splits ----

  private val driftComparisons = Seq(("train", "val"), ("train", "test"))

  /** `embedding_split_drift`: squared L2 distance between the
    * embedding CENTROIDS of the train split and each held-out split —
    * the vector-space twin of the PSI quality-histogram audit (a hash
    * split should land statistically identical embedding mass; a
    * centroid that moved says the eval set sees a different region of
    * representation space). Splits use the engine's standard
    * 80/10/10 doc-hash assignment; per-(split, dim) means use the
    * exact quantize-sum-unscale construction (order-independent), and
    * each dimension's squared-difference contribution is
    * pico-quantized before the 64-term sum so the readout never
    * depends on float association. Plan: one posexplode scan → a
    * (3 × 64)-cell map-side-combined agg → constant-size arithmetic. */
  def splitDrift(spark: SparkSession, dir: String): DataFrame = {
    val cents = vecsD(spark, dir)
      .selectExpr("vec_id", "v", "md5(CAST(vec_id AS STRING)) AS h")
      .selectExpr("v",
        s"(${graft.llm.Gen.hexPrefix32("h")}) / CAST(4294967296 AS DOUBLE) AS u")
      .selectExpr("v",
        """CASE WHEN u < 0.8 THEN 'train'
                WHEN u < 0.9 THEN 'val'
                ELSE 'test' END AS split""")
      .select(col("split"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("split", "dim")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(x * 10000000) AS BIGINT)")).as("qs"))
      .selectExpr("split", "dim",
        "CAST(n AS BIGINT) AS n",
        "qs / CAST(10000000 AS DOUBLE) / n AS m")
    driftComparisons.map { case (a, b) =>
      val ca = cents.filter(col("split") === a)
        .selectExpr("dim", "n AS n_a", "m AS m_a")
      val cb = cents.filter(col("split") === b)
        .selectExpr("dim", "n AS n_b", "m AS m_b")
      ca.join(cb, Seq("dim"))
        .selectExpr("n_a", "n_b",
          "CAST(round((m_a - m_b) * (m_a - m_b) * 1e12) AS BIGINT) AS c_pico")
        .groupBy("n_a", "n_b")
        .agg(count(lit(1)).as("n_dims"), sum("c_pico").as("d2_pico"))
        .selectExpr(s"'${a}_vs_$b' AS comparison", "n_a", "n_b",
          "CAST(n_dims AS BIGINT) AS n_dims", "d2_pico",
          "CAST(d2_pico AS DOUBLE) / 1e12 AS dist2")
    }.reduce(_ unionByName _).orderBy("comparison")
  }

  val splitDriftOracle: String = {
    val rows = driftComparisons.map { case (a, b) =>
      s"""SELECT '${a}_vs_$b' AS comparison, q.n_a, q.n_b,
            CAST(count(*) AS BIGINT) AS n_dims,
            CAST(sum(q.c_pico) AS BIGINT) AS d2_pico,
            CAST(sum(q.c_pico) AS DOUBLE) / 1e12 AS dist2
          FROM (SELECT ca.n AS n_a, cb.n AS n_b,
                  CAST(round((ca.m - cb.m) * (ca.m - cb.m) * 1e12) AS BIGINT) AS c_pico
                FROM cents ca JOIN cents cb ON ca.dim = cb.dim
                WHERE ca.split = '$a' AND cb.split = '$b') q
          GROUP BY q.n_a, q.n_b"""
    }.mkString(" UNION ALL ")
    s"""WITH ${vecsDCte(DuckD)},
        sp AS (SELECT v,
            CASE WHEN u < 0.8 THEN 'train'
                 WHEN u < 0.9 THEN 'val'
                 ELSE 'test' END AS split
          FROM (SELECT v,
              (${graft.llm.Gen.hexPrefix32("md5(CAST(vec_id AS VARCHAR))")}) / CAST(4294967296 AS DOUBLE) AS u
            FROM ve) u0),
        xl AS (SELECT split, d.dim, sp.v[d.dim + 1] AS x
               FROM sp CROSS JOIN range(0, $dims) d(dim)),
        cents AS MATERIALIZED (SELECT split, dim, CAST(count(*) AS BIGINT) AS n,
            sum(CAST(round(x * 10000000) AS BIGINT)) / CAST(10000000 AS DOUBLE)
              / count(*) AS m
          FROM xl GROUP BY split, dim)
        SELECT * FROM ($rows) u ORDER BY comparison"""
  }

  // ---- per-dimension symmetric INT8 scalar quantization ----

  /** One row, 64 columns m_0..m_63 = max |x_d| over the corpus — the
    * SQ8 codebook. A single hash-agg with partial aggregation; the
    * result is broadcast to the quantization scan. */
  private def maxAbsAgg(spark: SparkSession, dir: String): DataFrame =
    vecsD(spark, dir).agg(
      expr(s"max(abs(${idx("v", 0, SparkD)})) AS m_0"),
      (1 until dims).map(i =>
        expr(s"max(abs(${idx("v", i, SparkD)})) AS m_$i")): _*)

  private def maxAbsCte(d: Dialect): String = {
    val cols = (0 until dims)
      .map(i => s"max(abs(${idx("v", i, d)})) AS m_$i").mkString(", ")
    s"mab AS (SELECT $cols FROM ve)"
  }

  /** Quantized code for dim i: q_i ∈ [−127, 127]. The guard keeps a
    * degenerate all-zero dimension total (code 0) instead of NaN. */
  private def codeExpr(i: Int, d: Dialect): String = {
    val x = idx("v", i, d)
    s"CASE WHEN m_$i > 0.0 THEN CAST(${rhu(s"$x * 127.0 / m_$i")} AS BIGINT) ELSE 0 END"
  }

  /** Per-vector SQ8 readout: a position-weighted code checksum (any
    * misplaced or mis-valued code shifts it), the exact code L1 mass,
    * and the nano-quantized squared reconstruction error. Codes are
    * signed bytes; (q_i + 127)·(i+1) keeps every term non-negative so
    * the checksum is also collision-evidence across engines. */
  def int8Quant(spark: SparkSession, dir: String): DataFrame = {
    val checksum = (0 until dims).map(i => s"(q_$i + 127) * ${i + 1}L").mkString(" + ")
    val l1 = (0 until dims).map(i => s"abs(q_$i)").mkString(" + ")
    val sse = (0 until dims).map { i =>
      val x = idx("v", i, SparkD)
      val r = s"(CASE WHEN m_$i > 0.0 THEN CAST(q_$i AS DOUBLE) * m_$i / 127.0 ELSE 0.0 END)"
      s"($x - $r) * ($x - $r)"
    }.mkString(" + ")
    vecsD(spark, dir)
      .crossJoin(broadcast(maxAbsAgg(spark, dir)))
      .selectExpr(Seq("vec_id", "label", "v") ++
        (0 until dims).map(i => s"m_$i") ++
        (0 until dims).map(i => s"${codeExpr(i, SparkD)} AS q_$i"): _*)
      .selectExpr("vec_id", "label",
        s"CAST($checksum AS BIGINT) AS code_checksum",
        s"CAST($l1 AS BIGINT) AS code_l1",
        s"CAST(round(($sse) * 1000000000) AS BIGINT) AS sse_nano")
      .orderBy("vec_id")
  }

  val int8QuantOracle: String = {
    val d = DuckD
    val checksum = (0 until dims).map(i => s"(q_$i + 127) * ${i + 1}").mkString(" + ")
    val l1 = (0 until dims).map(i => s"abs(q_$i)").mkString(" + ")
    val sse = (0 until dims).map { i =>
      val x = idx("v", i, d)
      val r = s"(CASE WHEN m_$i > 0.0 THEN CAST(q_$i AS DOUBLE) * m_$i / 127.0 ELSE 0.0 END)"
      s"($x - $r) * ($x - $r)"
    }.mkString(" + ")
    val codes = (0 until dims).map(i => s"${codeExpr(i, d)} AS q_$i").mkString(", ")
    s"""WITH ${vecsDCte(d)}, ${maxAbsCte(d)},
        coded AS (SELECT vec_id, label, v, $codes FROM ve CROSS JOIN mab),
        outp AS (SELECT c.vec_id, c.label,
            CAST($checksum AS BIGINT) AS code_checksum,
            CAST($l1 AS BIGINT) AS code_l1,
            CAST(round(($sse) * 1000000000) AS BIGINT) AS sse_nano
          FROM coded c CROSS JOIN mab)
        SELECT * FROM outp ORDER BY vec_id"""
  }

  // ---- Johnson–Lindenstrauss ±1 random projection ----

  /** ±1 entry of the (never materialized) projection matrix, row j of
    * [[projDims]], input dim i — [[Gen.planeSign]] seeded into a
    * disjoint plane range so the projection is independent of the LSH
    * planes already drawn from the same hash family. */
  private def projSign(j: Int, i: Int): String = planeSign(j + 100, i)

  /** Projected component j = Σ_i sign(j,i)·x_i / √k — one unrolled
    * left-associated sum, identical tree both engines. */
  private def projExpr(a: String, j: Int, d: Dialect): String = {
    val s = (0 until dims).map(i => s"${idx(a, i, d)} * ${projSign(j, i)}").mkString(" + ")
    s"($s) / sqrt(${projDims}.0)"
  }

  /** JL projection readout: per vector, the nano-quantized projected
    * components' checksum and squared norm, plus the original squared
    * norm — the norm pair IS the distortion witness (E‖Px‖² = ‖x‖²). */
  def randomProjection(spark: SparkSession, dir: String): DataFrame = {
    val comps = (0 until projDims).map(j => s"${projExpr("v", j, SparkD)} AS p_$j")
    val pn = (0 until projDims).map(j => s"p_$j * p_$j").mkString(" + ")
    val checksum = (0 until projDims)
      .map(j => s"CAST(round(p_$j * 1000000000) AS BIGINT) * ${j + 1}L").mkString(" + ")
    vecsD(spark, dir)
      .selectExpr(Seq("vec_id", "label", "v") ++ comps: _*)
      .selectExpr("vec_id", "label",
        s"CAST($checksum AS BIGINT) AS proj_checksum",
        s"CAST(round(($pn) * 1000000000) AS BIGINT) AS proj_norm_sq_nano",
        s"CAST(round((${dot64("v", "v", SparkD)}) * 1000000000) AS BIGINT) AS orig_norm_sq_nano")
      .orderBy("vec_id")
  }

  val randomProjectionOracle: String = {
    val d = DuckD
    val comps = (0 until projDims).map(j => s"${projExpr("v", j, d)} AS p_$j").mkString(", ")
    val pn = (0 until projDims).map(j => s"p_$j * p_$j").mkString(" + ")
    val checksum = (0 until projDims)
      .map(j => s"CAST(round(p_$j * 1000000000) AS BIGINT) * ${j + 1}").mkString(" + ")
    s"""WITH ${vecsDCte(d)},
        proj AS (SELECT vec_id, label, v, $comps FROM ve)
        SELECT vec_id, label,
          CAST($checksum AS BIGINT) AS proj_checksum,
          CAST(round(($pn) * 1000000000) AS BIGINT) AS proj_norm_sq_nano,
          CAST(round((${dot64("v", "v", d)}) * 1000000000) AS BIGINT) AS orig_norm_sq_nano
        FROM proj ORDER BY vec_id"""
  }

  /** Distance-preservation audit over consecutive-id probe pairs: the
    * JL guarantee made falsifiable. Per pair, original vs projected
    * squared distance (nano) and an in-bounds flag at ε = 0.75 —
    * loose because k = 16 is a real compression, not a safety margin;
    * a broken sign hash or a dropped term sends ratios far outside.
    * The pair set is id-arithmetic (vec_id ↔ vec_id+1), so candidate
    * generation is an equi-join, not a cross product. */
  def projectionAudit(spark: SparkSession, dir: String): DataFrame = {
    val v = vecsD(spark, dir)
    val a = v.filter(col("vec_id") < pairAudit * 2)
      .filter(col("vec_id") % 2 === 0)
      .selectExpr("vec_id AS id_a", "v AS va")
    val b = v.selectExpr("vec_id AS id_b", "v AS vb")
    val od = l2sqRange("va", "vb", 0, dims, SparkD)
    val pdist = (0 until projDims).map { j =>
      val (x, y) = (projExpr("va", j, SparkD), projExpr("vb", j, SparkD))
      s"(($x) - ($y)) * (($x) - ($y))"
    }.mkString(" + ")
    a.join(b, expr("id_b = id_a + 1"))
      .selectExpr("id_a", "id_b",
        s"CAST(round(($od) * 1000000000) AS BIGINT) AS orig_d2_nano",
        s"CAST(round(($pdist) * 1000000000) AS BIGINT) AS proj_d2_nano")
      .selectExpr("id_a", "id_b", "orig_d2_nano", "proj_d2_nano",
        // ε-band check as an exact integer cross-multiply on the
        // already-quantized BIGINTs: no float decides the flag.
        "CASE WHEN proj_d2_nano * 4 >= orig_d2_nano AND proj_d2_nano * 4 <= orig_d2_nano * 7 " +
          "THEN 1 ELSE 0 END AS within_eps")
      .orderBy("id_a")
  }

  val projectionAuditOracle: String = {
    val d = DuckD
    val od = l2sqRange("va", "vb", 0, dims, d)
    val pdist = (0 until projDims).map { j =>
      val (x, y) = (projExpr("va", j, d), projExpr("vb", j, d))
      s"(($x) - ($y)) * (($x) - ($y))"
    }.mkString(" + ")
    s"""WITH ${vecsDCte(d)},
        a AS (SELECT vec_id AS id_a, v AS va FROM ve
              WHERE vec_id < ${pairAudit * 2} AND vec_id % 2 = 0),
        b AS (SELECT vec_id AS id_b, v AS vb FROM ve),
        pr AS (SELECT id_a, id_b,
            CAST(round(($od) * 1000000000) AS BIGINT) AS orig_d2_nano,
            CAST(round(($pdist) * 1000000000) AS BIGINT) AS proj_d2_nano
          FROM a JOIN b ON id_b = id_a + 1)
        SELECT id_a, id_b, orig_d2_nano, proj_d2_nano,
          CASE WHEN proj_d2_nano * 4 >= orig_d2_nano AND proj_d2_nano * 4 <= orig_d2_nano * 7
            THEN 1 ELSE 0 END AS within_eps
        FROM pr ORDER BY id_a"""
  }

  // ---- binary (sign) embeddings + Hamming search ----

  private val binTopK = 10
  private val binQueries = 5

  /** Sign-bit pack of a 64-dim vector into ONE signed BIGINT. Bit 63's
    * weight is Long.MinValue, which neither engine can parse as a
    * plain negative literal (−2⁶³ lexes as −(2⁶³) and the positive
    * half overflows), so it is spelled (−(2⁶³−1))−1; disjoint bits
    * make the two's-complement sum the exact bit pattern (the
    * [[Multimodal]] aHash trick). */
  private def signPack(a: String, d: Dialect): String =
    (0 until dims).map { i =>
      val w =
        if (i == 63) "(CAST(-9223372036854775807 AS BIGINT) - 1)"
        else s"CAST(${1L << i} AS BIGINT)"
      s"CASE WHEN ${idx(a, i, d)} > 0.0 THEN $w ELSE CAST(0 AS BIGINT) END"
    }.mkString("(", " + ", ")")

  /** Binary-quantized ANN: 64-dim float vectors collapse to 64 BITS
    * (32× smaller than SQ8), candidate ranking is one XOR + popcount
    * per pair — the re-rank-from-binary shape every 2024-era vector
    * DB ships. Per-query top-[[binTopK]] by Hamming distance; ties
    * break on vec_id so the readout is total. The corpus side stays
    * partitioned; only the 5-query bit relation broadcasts. */
  def binaryTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bits = vecsD(spark, dir)
      .selectExpr("vec_id", s"${signPack("v", SparkD)} AS b")
    val q = bits.filter(col("vec_id") < binQueries)
      .selectExpr("vec_id AS query_id", "b AS qb")
    val scored = bits.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id",
        s"bit_count(${bitXor("qb", "b", SparkD)}) AS hamming")
    val w = Window.partitionBy("query_id").orderBy(asc("hamming"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= binTopK)
      .selectExpr("query_id", "vec_id", "rank", "CAST(hamming AS INT) AS hamming")
      .orderBy("query_id", "rank")
  }

  val binaryTopKOracle: String = {
    val d = DuckD
    s"""WITH ${vecsDCte(d)},
        bits AS (SELECT vec_id, ${signPack("v", d)} AS b FROM ve),
        q AS (SELECT vec_id AS query_id, b AS qb FROM bits
              WHERE vec_id < $binQueries),
        scored AS (SELECT q.query_id, bits.vec_id,
            bit_count(${bitXor("q.qb", "bits.b", d)}) AS hamming
          FROM bits JOIN q ON bits.vec_id <> q.query_id),
        ranked AS (SELECT *, CAST(row_number() OVER
            (PARTITION BY query_id ORDER BY hamming, vec_id) AS BIGINT) AS rank
          FROM scored)
        SELECT query_id, vec_id, rank, CAST(hamming AS INTEGER) AS hamming
        FROM ranked WHERE rank <= $binTopK ORDER BY query_id, rank"""
  }

  // ---- IVF cell balance ----

  /** Cell-occupancy balance of the IVF index — the diagnostic that
    * decides whether the coarse quantizer needs retraining: probe
    * latency tracks the LARGEST cell (a query probes whole cells), so
    * max/mean occupancy is the straggler ratio, the ANN twin of
    * [[graft.ops.Profile.keySkew]]. One count per cell + a one-row
    * summary — index-metadata-sized at any corpus scale. */
  def cellBalance(spark: SparkSession, dir: String): DataFrame = {
    val per = Similarity.ivfCells(spark, dir)
      .groupBy("cell").agg(count(lit(1)).as("per_cell"))
    per.agg(
        sum("per_cell").as("n_vectors"),
        count(lit(1)).as("n_cells"),
        max("per_cell").as("max_cell"),
        min("per_cell").as("min_cell"))
      .selectExpr("n_vectors", "n_cells", "max_cell", "min_cell",
        "CAST(n_vectors AS DOUBLE) / n_cells AS mean_cell",
        "max_cell / (CAST(n_vectors AS DOUBLE) / n_cells) AS balance_ratio")
  }

  val cellBalanceOracle: String =
    s"""WITH cells AS (SELECT cell FROM (${Similarity.ivfCellsOracle}) c0),
        per AS (SELECT cell, count(*) AS per_cell FROM cells GROUP BY cell)
        SELECT CAST(sum(per_cell) AS BIGINT) AS n_vectors,
          CAST(count(*) AS BIGINT) AS n_cells,
          CAST(max(per_cell) AS BIGINT) AS max_cell,
          CAST(min(per_cell) AS BIGINT) AS min_cell,
          CAST(sum(per_cell) AS DOUBLE) / count(*) AS mean_cell,
          max(per_cell) / (CAST(sum(per_cell) AS DOUBLE) / count(*)) AS balance_ratio
        FROM per"""

  // ---- embedding-vs-text correlation ----

  /** Cross-modal sanity correlation: does embedding norm track
    * document length? (It shouldn't, much, for normalized encoders —
    * a strong correlation is the classic symptom of un-normalized
    * embeddings leaking length, which silently biases cosine ANN.)
    * Pearson from exact integer moments on (n_chars, nano-quantized
    * norm²) — the [[graft.ops.Profile.momentCorr]] discipline; the
    * doc↔vector link is the id equi-join. */
  def embeddingTextCorr(spark: SparkSession, dir: String): DataFrame = {
    val v = vecsD(spark, dir).selectExpr("vec_id AS doc_id",
      s"CAST(round((${dot64("v", "v", SparkD)}) * 1000000000) AS BIGINT) AS nq")
    val q = graft.io.Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("xc"))
      .join(v, Seq("doc_id"))
    val dec = "DECIMAL(38,0)"
    q.agg(
        expr("CAST(count(1) AS BIGINT)").as("n"),
        expr("CAST(sum(xc) AS BIGINT)").as("sx"),
        expr("CAST(sum(nq) AS BIGINT)").as("sy"),
        expr(s"sum(CAST(xc AS $dec) * xc)").as("sxx"),
        expr(s"sum(CAST(nq AS $dec) * nq)").as("syy"),
        expr(s"sum(CAST(xc AS $dec) * nq)").as("sxy"))
      .selectExpr("n",
        """CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
           (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
            sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) * 1e9) AS BIGINT) AS corr_nano""")
  }

  val embeddingTextCorrOracle: String = {
    val d = DuckD
    s"""WITH ${vecsDCte(d)},
        vq AS (SELECT vec_id AS doc_id,
            CAST(round((${dot64("v", "v", d)}) * 1000000000) AS BIGINT) AS nq
          FROM ve),
        q AS (SELECT d2.n_chars AS xc, vq.nq
              FROM documents d2 JOIN vq ON d2.doc_id = vq.doc_id),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(nq) AS BIGINT) AS sy,
            sum(CAST(xc AS HUGEINT) * xc) AS sxx,
            sum(CAST(nq AS HUGEINT) * nq) AS syy,
            sum(CAST(xc AS HUGEINT) * nq) AS sxy
          FROM q)
        SELECT n,
          CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) /
            (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) *
             sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) * 1e9) AS BIGINT) AS corr_nano
        FROM m"""
  }

  // ---- distributed PCA: top principal component ----

  private val pcaDims = 16
  private val pcaIters = 3

  /** Top principal component of the first [[pcaDims]] embedding
    * dimensions by power iteration — the variance-axis readout that
    * drives whitening, drift monitoring, and index rotation. The
    * DISTRIBUTED part is one pass: all 16 first moments and 136
    * second moments as exact sums (micro-quantized inputs, the
    * Spearman DECIMAL(38,0)/HUGEINT discipline — float moment sums
    * would be partitioning-dependent). The covariance numerators
    * n·Σqᵢqⱼ − Σqᵢ·Σqⱼ and the unrolled [[pcaIters]]-round power
    * iteration (with an ∞-norm renormalization per round) then run on
    * a ONE-ROW relation as a fixed IEEE tree — bit-identical in both
    * engines, so the eigenvector needs no sign convention: both
    * engines walk the identical trajectory from the identical start.
    * Rayleigh quotient reported in raw covariance-numerator units. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val d = SparkD
    val quant = (0 until pcaDims).map(i =>
      s"CAST(round(${idx("v", i, d)} * 1000000) AS BIGINT) AS q_$i")
    val moments =
      Seq("CAST(count(1) AS DECIMAL(38,0)) AS n") ++
      (0 until pcaDims).map(i =>
        s"CAST(sum(CAST(q_$i AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_$i") ++
      (for (i <- 0 until pcaDims; j <- i until pcaDims) yield
        s"CAST(sum(CAST(q_$i AS DECIMAL(38,0)) * q_$j) AS DECIMAL(38,0)) AS p_${i}_$j")
    def cov(i: Int, j: Int): String = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      s"(CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE) - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE))"
    }
    val base = vecsD(spark, dir)
      .selectExpr(quant: _*)
      .selectExpr(moments: _*)
    var cur = base.selectExpr(Seq("*") ++
      (0 until pcaDims).map(i => s"CAST(1.0 AS DOUBLE) AS v_$i"): _*)
    for (_ <- 1 to pcaIters) {
      val mult = (0 until pcaDims).map { i =>
        (0 until pcaDims).map(j => s"${cov(i, j)} * v_$j").mkString(" + ")
      }
      cur = cur.selectExpr(Seq("*") ++
          mult.zipWithIndex.map { case (e, i) => s"($e) AS u_$i" }: _*)
        .selectExpr("*",
          (0 until pcaDims).map(i => s"abs(u_$i)").mkString("greatest(", ", ", ")") + " AS mx")
      cur = cur.selectExpr(
        Seq("n") ++ (0 until pcaDims).map(i => s"s_$i") ++
        (for (i <- 0 until pcaDims; j <- i until pcaDims) yield s"p_${i}_$j") ++
        (0 until pcaDims).map(i => s"u_$i / mx AS v_$i"): _*)
    }
    val vnorm = (0 until pcaDims).map(i => s"v_$i * v_$i").mkString(" + ")
    val cvDot = (0 until pcaDims).map { i =>
      "(" + (0 until pcaDims).map(j => s"${cov(i, j)} * v_$j").mkString(" + ") + s") * v_$i"
    }.mkString(" + ")
    cur.selectExpr(
      (0 until pcaDims).map(i =>
        s"CAST(round(v_$i * 1000000000) AS BIGINT) AS pc_$i") ++
      Seq(s"($cvDot) / ($vnorm) AS rayleigh"): _*)
  }

  val pcaPowerOracle: String = {
    val d = DuckD
    val quant = (0 until pcaDims).map(i =>
      s"CAST(round(${idx("v", i, d)} * 1000000) AS BIGINT) AS q_$i").mkString(", ")
    val moments =
      (Seq("CAST(count(*) AS HUGEINT) AS n") ++
        (0 until pcaDims).map(i => s"sum(CAST(q_$i AS HUGEINT)) AS s_$i") ++
        (for (i <- 0 until pcaDims; j <- i until pcaDims) yield
          s"sum(CAST(q_$i AS HUGEINT) * q_$j) AS p_${i}_$j")).mkString(", ")
    def cov(i: Int, j: Int): String = {
      val (a, b) = (math.min(i, j), math.max(i, j))
      s"(CAST(n AS DOUBLE) * CAST(p_${a}_$b AS DOUBLE) - CAST(s_$i AS DOUBLE) * CAST(s_$j AS DOUBLE))"
    }
    val iterCtes = (1 to pcaIters).map { r =>
      val prev = if (r == 1) "it0" else s"it${r - 1}"
      val mult = (0 until pcaDims).map { i =>
        (0 until pcaDims).map(j => s"${cov(i, j)} * v_$j").mkString(" + ")
      }
      val mx = (0 until pcaDims).map(i => s"abs(u_$i)").mkString("greatest(", ", ", ")")
      s"""u$r AS (SELECT *, ${mult.zipWithIndex.map { case (e, i) => s"($e) AS u_$i" }.mkString(", ")}
            FROM $prev),
          m$r AS (SELECT *, $mx AS mx FROM u$r),
          it$r AS (SELECT n, ${(0 until pcaDims).map(i => s"s_$i").mkString(", ")},
              ${(for (i <- 0 until pcaDims; j <- i until pcaDims) yield s"p_${i}_$j").mkString(", ")},
              ${(0 until pcaDims).map(i => s"u_$i / mx AS v_$i").mkString(", ")}
            FROM m$r)"""
    }.mkString(",\n        ")
    val vnorm = (0 until pcaDims).map(i => s"v_$i * v_$i").mkString(" + ")
    val cvDot = (0 until pcaDims).map { i =>
      "(" + (0 until pcaDims).map(j => s"${cov(i, j)} * v_$j").mkString(" + ") + s") * v_$i"
    }.mkString(" + ")
    s"""WITH ${vecsDCte(d)},
        qt AS (SELECT $quant FROM ve),
        mo AS (SELECT $moments FROM qt),
        it0 AS (SELECT *, ${(0 until pcaDims).map(i => s"CAST(1.0 AS DOUBLE) AS v_$i").mkString(", ")}
                FROM mo),
        $iterCtes
        SELECT ${(0 until pcaDims).map(i =>
          s"CAST(round(v_$i * 1000000000) AS BIGINT) AS pc_$i").mkString(", ")},
          ($cvDot) / ($vnorm) AS rayleigh
        FROM it$pcaIters"""
  }

  // ---- embedding anisotropy ----

  /** Anisotropy of the 16-dim prefix subspace: the dominant
    * eigenvalue's share of total variance, λ̂₁/(trace/d) — the
    * Ethayarajh-style "embeddings collapse into a cone" diagnostic
    * (isotropic ≈ 1; a few dominant directions ⇒ ≫ 1, and cosine
    * similarity loses contrast). Reuses the PCA power-iteration
    * machinery verbatim: λ̂₁ is the converged Rayleigh quotient,
    * trace is Σᵢ(n·Σqᵢ² − (Σqᵢ)²) off the same one-pass exact
    * moments. Readout milli-quantized. */
  def anisotropy(spark: SparkSession, dir: String): DataFrame = {
    val pca = pcaPower(spark, dir)
    val d = SparkD
    val quant = (0 until pcaDims).map(i =>
      s"CAST(round(${idx("v", i, d)} * 1000000) AS BIGINT) AS q_$i")
    val moments =
      Seq("CAST(count(1) AS DECIMAL(38,0)) AS n") ++
      (0 until pcaDims).map(i =>
        s"CAST(sum(CAST(q_$i AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s_$i") ++
      (0 until pcaDims).map(i =>
        s"CAST(sum(CAST(q_$i AS DECIMAL(38,0)) * q_$i) AS DECIMAL(38,0)) AS p_$i")
    val trace = (0 until pcaDims).map(i =>
      s"(CAST(n AS DOUBLE) * CAST(p_$i AS DOUBLE) - CAST(s_$i AS DOUBLE) * CAST(s_$i AS DOUBLE))")
      .mkString(" + ")
    val tr = vecsD(spark, dir).selectExpr(quant: _*)
      .selectExpr(moments: _*)
      .selectExpr(s"($trace) AS trace")
    pca.select("rayleigh").crossJoin(broadcast(tr))
      .selectExpr(
        s"CAST(round(rayleigh / trace * 1000) AS BIGINT) AS top_share_milli",
        s"CAST(round(rayleigh / (trace / $pcaDims) * 1000) AS BIGINT) AS anisotropy_milli")
  }

  val anisotropyOracle: String = {
    val d = DuckD
    val quant = (0 until pcaDims).map(i =>
      s"CAST(round(${idx("v", i, d)} * 1000000) AS BIGINT) AS q_$i").mkString(", ")
    val moments =
      (Seq("CAST(count(*) AS HUGEINT) AS n") ++
        (0 until pcaDims).map(i => s"sum(CAST(q_$i AS HUGEINT)) AS s_$i") ++
        (0 until pcaDims).map(i =>
          s"sum(CAST(q_$i AS HUGEINT) * q_$i) AS p_$i")).mkString(", ")
    val trace = (0 until pcaDims).map(i =>
      s"(CAST(n AS DOUBLE) * CAST(p_$i AS DOUBLE) - CAST(s_$i AS DOUBLE) * CAST(s_$i AS DOUBLE))")
      .mkString(" + ")
    s"""WITH pc AS (SELECT rayleigh FROM ($pcaPowerOracle) p0),
        ${vecsDCte(d).replace("ve AS", "ve2 AS")},
        qt2 AS (SELECT $quant FROM ve2),
        mo2 AS (SELECT $moments FROM qt2),
        tr AS (SELECT ($trace) AS trace FROM mo2)
        SELECT CAST(round(rayleigh / trace * 1000) AS BIGINT) AS top_share_milli,
          CAST(round(rayleigh / (trace / $pcaDims) * 1000) AS BIGINT) AS anisotropy_milli
        FROM pc CROSS JOIN tr"""
  }

  // ---- Matryoshka prefix-dimension recall ----

  private val mrlDims = 16

  /** Matryoshka-style truncation audit (Kusupati et al. 2022): rank by
    * the FIRST [[mrlDims]] dimensions only and measure recall@10
    * against full-dimension cosine truth — the "how much cheaper can
    * the first pass be" readout that decides a two-stage (truncate →
    * re-rank) retrieval deployment. The fixture's embeddings are not
    * MRL-trained, so recall here is the honest baseline a trained
    * matryoshka head would beat; the operator (prefix dot, prefix
    * norms, top-k, intersection count) is what production runs. */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dotP(a: String, b: String, d: Dialect): String =
      (0 until mrlDims).map(i => s"${idx(a, i, d)} * ${idx(b, i, d)}").mkString(" + ")
    val vp = vecsD(spark, dir)
      .selectExpr("vec_id", "v", s"sqrt(${dotP("v", "v", SparkD)}) AS pnrm")
    val q = vp.filter(col("vec_id") < binQueries)
      .selectExpr("vec_id AS query_id", "v AS qv", "pnrm AS qpnrm")
    val scored = vp.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id",
        s"(${dotP("qv", "v", SparkD)}) / (qpnrm * pnrm) AS pcos")
    val w = Window.partitionBy("query_id").orderBy(desc("pcos"), asc("vec_id"))
    val prefixTop = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= binTopK).select("query_id", "vec_id")
    val fullTop = Similarity.cosineTopK(spark, dir).select("query_id", "vec_id")
    fullTop.join(prefixTop, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      .selectExpr("query_id", "n_hits",
        s"CAST(n_hits AS DOUBLE) / $binTopK AS recall")
      .orderBy("query_id")
  }

  val matryoshkaRecallOracle: String = {
    val d = DuckD
    def dotP(a: String, b: String): String =
      (0 until mrlDims).map(i => s"${idx(a, i, d)} * ${idx(b, i, d)}").mkString(" + ")
    s"""WITH ${vecsDCte(d)},
        vp AS (SELECT vec_id, v, sqrt(${dotP("v", "v")}) AS pnrm FROM ve),
        q AS (SELECT vec_id AS query_id, v AS qv, pnrm AS qpnrm FROM vp
              WHERE vec_id < $binQueries),
        scored AS (SELECT q.query_id, vp.vec_id,
            (${dotP("q.qv", "vp.v")}) / (q.qpnrm * vp.pnrm) AS pcos
          FROM vp JOIN q ON vp.vec_id <> q.query_id),
        ptop AS (SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER
              (PARTITION BY query_id ORDER BY pcos DESC, vec_id) AS rank
            FROM scored) WHERE rank <= $binTopK),
        fe AS (SELECT vec_id, v, ${norm64("v", d)} AS nrm FROM ve),
        fq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM fe
               WHERE vec_id < $binQueries),
        fscored AS (SELECT fq.query_id, fe.vec_id,
            ${cosineWithNorms("fq.qv", "fe.v", "fq.qnrm", "fe.nrm", d)} AS cosine
          FROM fe JOIN fq ON fe.vec_id <> fq.query_id),
        ftop AS (SELECT query_id, vec_id FROM (
            SELECT *, row_number() OVER
              (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
            FROM fscored) WHERE rank <= $binTopK)
        SELECT f.query_id, count(*) AS n_hits,
          CAST(count(*) AS DOUBLE) / $binTopK AS recall
        FROM ftop f JOIN ptop p
          ON f.query_id = p.query_id AND f.vec_id = p.vec_id
        GROUP BY f.query_id ORDER BY f.query_id"""
  }
}
