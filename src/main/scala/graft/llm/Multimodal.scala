package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Multimodal-column plumbing: media payloads are opaque `binary`
  * columns with typed metadata; decode / feature-extraction runs as a
  * typed `mapPartitions` stage (the Spark pattern for batched
  * per-partition codec work — at scale each partition amortizes codec
  * init, and the binary column never round-trips through the driver).
  *
  * Three codec tiers:
  *  - [[MediaCodec]] header tier is REAL: dependency-free container
  *    sniffing and PNG-IHDR / WAV-fmt header parsing over genuine
  *    container bytes (the metadata tier that drives routing/filtering
  *    at scale — oracle-checked end-to-end via [[headerMeta]]);
  *  - the PNG PIXEL, WAV SAMPLE, and Y4M VIDEO tiers are REAL too:
  *    [[MediaCodec.decodePngPixels]] inflates IDAT with the JDK's zlib
  *    and reverses all five scanline filters,
  *    [[MediaCodec.decodeWavSamples]] reads the PCM16 data chunk, and
  *    [[MediaCodec.decodeY4m]] walks a multi-frame YUV4MPEG2 stream
  *    (tokenized header + 4:2:0 frame payloads with truncation
  *    checks) — oracle-checked via [[pixelStats]] / [[wavStats]] /
  *    [[videoStats]];
  *  - [[FakeCodec]] remains only as the generic feature-extraction
  *    stand-in for [[extractFeatures]] (the typed mapPartitions
  *    plumbing demo) — compressed-codec decode (JPEG/H.264/MP3)
  *    genuinely needs external libraries; every container this
  *    environment can honestly decode is decoded for real above.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
                           feature_dim: Int, features: Array[Float])

  /** STUB codec: stands in for image decode / audio resample / video
    * frame-sample. Deterministic: features derive from payload bytes
    * only, so tests are stable. Replace per modality in production. */
  object FakeCodec {
    val featureDim = 16
    def decode(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Media table synthesized from documents: payload = UTF-8 bytes of
    * the text (a deterministic stand-in for real image/audio blobs). */
  def media(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).selectExpr(
      "doc_id",
      "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type",
      "CAST(text AS BINARY) AS payload")

  /** Typed per-partition feature extraction (the mapPartitions batch
    * shape a real codec needs). */
  def extractFeatures(mediaDs: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import mediaDs.sparkSession.implicits._
    mediaDs.mapPartitions { it =>
      // per-partition codec init would go here
      it.map { m =>
        val f = FakeCodec.decode(m.payload)
        MediaFeatures(m.doc_id, m.media_type, m.payload.length, f.length, f)
      }
    }
  }

  /** Oracle-checkable projection of the plumbing: payload byte length
    * and checksum (the mapPartitions feature path is covered by the
    * typed unit spec; features themselves have no SQL equivalent). */
  def mediaSummary(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).selectExpr(
      "doc_id", "media_type",
      "CAST(length(payload) AS INTEGER) AS n_bytes",
      "md5(payload) AS checksum")
      .orderBy("doc_id")

  /** DuckDB md5 takes VARCHAR (hashing its UTF-8 bytes — the same
    * bytes Spark's md5(CAST(text AS BINARY)) hashes). */
  val mediaSummaryOracle: String =
    """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
         md5(text) AS checksum
       FROM documents ORDER BY doc_id"""

  // ---- real header codec path (MediaCodec) ----

  case class MediaHeader(doc_id: Long, container: String,
                         width: Option[Int], height: Option[Int],
                         channels: Option[Int], sample_rate_hz: Option[Int],
                         bits_per_sample: Option[Int])

  /** Synthetic binary corpus with REAL container bytes, built in the
    * executors (never on the driver): PNG with dims derived from
    * doc_id, PCM WAV with rate/channels derived from doc_id, and raw
    * text bytes as the unknown-container case. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val payload = (id % 3) match {
          case 0 => MediaCodec.makePng(
            width = (id % 640 + 1).toInt, height = (id % 480 + 1).toInt)
          case 1 => MediaCodec.makeWav(
            channels = (id % 2 + 1).toInt,
            sampleRateHz = (8000 + (id % 5) * 8000).toInt)
          case _ => text.getBytes("UTF-8")
        }
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, mt, payload)
      }
  }

  /** Per-partition header extraction: sniff the container from magic
    * bytes (NOT from the metadata column — the codec proves the bytes)
    * and parse the dimension fields. */
  def extractHeaders(mediaDs: Dataset[MediaRecord]): Dataset[MediaHeader] = {
    import mediaDs.sparkSession.implicits._
    mediaDs.mapPartitions { it =>
      it.map { m =>
        MediaCodec.sniff(m.payload) match {
          case "png" =>
            val h = MediaCodec.parsePng(m.payload)
            MediaHeader(m.doc_id, "png", h.map(_.width), h.map(_.height),
              None, None, None)
          case "wav" =>
            val f = MediaCodec.parseWav(m.payload)
            MediaHeader(m.doc_id, "wav", None, None, f.map(_.channels),
              f.map(_.sampleRateHz), f.map(_.bitsPerSample))
          case _ =>
            MediaHeader(m.doc_id, "unknown", None, None, None, None, None)
        }
      }
    }
  }

  /** Oracle-checked round-trip: payloads are BUILT as real PNG/WAV
    * bytes and PARSED back by the codec in the executors; the oracle
    * recomputes the expected header fields arithmetically, so a
    * hash-match proves the binary build+parse is exact. */
  def headerMeta(spark: SparkSession, dir: String): DataFrame =
    extractHeaders(syntheticMedia(spark, dir))
      .toDF()
      .orderBy("doc_id")

  val headerMetaOracle: String =
    """SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'unknown' END AS container,
         CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 640 + 1 AS INTEGER) END AS width,
         CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 480 + 1 AS INTEGER) END AS height,
         CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 2 + 1 AS INTEGER) END AS channels,
         CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + (doc_id % 5) * 8000 AS INTEGER) END AS sample_rate_hz,
         CASE WHEN doc_id % 3 = 1 THEN CAST(16 AS INTEGER) END AS bits_per_sample
       FROM documents ORDER BY doc_id"""

  // ---- real pixel-decode tier (MediaCodec.decodePngPixels) ----

  case class PixelStats(doc_id: Long, channel: Int, n_pixels: Long,
                        b_sum: Long, b_min: Int, b_max: Int)

  /** Deterministic RGBA raster for image doc `docId`: byte at scanline
    * `y`, offset `i` is ((docId % 251) + y·31 + i·7) % 256 — chosen so
    * a SQL oracle can reproduce every channel statistic from doc_id
    * alone, with no byte ever leaving the executors. */
  private[graft] def pixelRaster(docId: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 4)
    val base = (docId % 251).toInt
    var y = 0
    while (y < h) {
      var i = 0
      while (i < w * 4) {
        out(y * w * 4 + i) = ((base + y * 31 + i * 7) % 256).toByte
        i += 1
      }
      y += 1
    }
    out
  }

  private[graft] def pixelDims(docId: Long): (Int, Int) =
    ((docId % 31 + 1).toInt, (docId % 17 + 1).toInt)

  /** Per-channel pixel statistics computed from REAL decoded PNG bytes:
    * each image doc's raster is encoded to a spec-valid RGBA PNG in the
    * executors (scanline filters cycling through all five types, zlib
    * IDAT) and decoded back by [[MediaCodec.decodePngPixels]] — JDK
    * Inflater + filter reversal, no stub — before the stats loop. The
    * oracle recomputes the same statistics arithmetically from doc_id,
    * so a hash-match proves deflate→inflate→unfilter returns the raster
    * bit-for-bit. A decode failure throws rather than skips: these are
    * our own builder's bytes, and a silent drop would hide a decoder
    * bug behind a smaller result set. Per-partition work, no shuffle
    * until the final (tiny) sort. */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h) = pixelDims(id)
          val png = MediaCodec.makePngWithPixels(
            w, h, pixelRaster(id, w, h), y => ((id + y) % 5).toInt)
          val img = MediaCodec.decodePngPixels(png).getOrElse(
            sys.error(s"pixel decode failed for doc $id"))
          (0 until 4).map { c =>
            val b = img.bytes
            var s = 0L; var mn = 255; var mx = 0; var j = c
            while (j < b.length) {
              val v = b(j) & 0xff
              s += v; if (v < mn) mn = v; if (v > mx) mx = v
              j += 4
            }
            PixelStats(id, c, img.width.toLong * img.height, s, mn, mx)
          }
        }
      }
    stats.toDF()
      .withColumn("mean_val", col("b_sum") / col("n_pixels").cast("double"))
      .orderBy("doc_id", "channel")
  }

  case class PixelHistBin(doc_id: Long, channel: Int, bin: Int, n_px: Long)

  /** Per-channel 16-bin intensity histograms from REAL decoded PNG
    * bytes — the classic image feature vector (color histograms drive
    * near-dup blocking, quality heuristics like over/under-exposure,
    * and cheap perceptual clustering). Values bin by v DIV 16; only
    * occupied bins emit (the join-friendly sparse form — 100 TB of
    * images stays ≤ 64 rows per image regardless of resolution).
    * Decode happens once per image in the executors; the oracle
    * recomputes every bin count from the generative raster formula,
    * so a hash-match proves the full encode→inflate→unfilter→bin
    * path — the same technique as [[pixelStatsOracle]]. */
  def pixelHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bins = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h) = pixelDims(id)
          val png = MediaCodec.makePngWithPixels(
            w, h, pixelRaster(id, w, h), y => ((id + y) % 5).toInt)
          val img = MediaCodec.decodePngPixels(png).getOrElse(
            sys.error(s"pixel decode failed for doc $id"))
          val b = img.bytes
          val counts = Array.ofDim[Long](4, 16)
          var j = 0
          while (j < b.length) {
            counts(j % 4)((b(j) & 0xff) >> 4) += 1
            j += 1
          }
          for (c <- 0 until 4; bin <- 0 until 16 if counts(c)(bin) > 0L)
            yield PixelHistBin(id, c, bin, counts(c)(bin))
        }
      }
    bins.toDF().orderBy("doc_id", "channel", "bin")
  }

  val pixelHistogramOracle: String =
    """WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 31 + 1 AS INTEGER) AS w,
           CAST(doc_id % 17 + 1 AS INTEGER) AS h
         FROM documents WHERE doc_id % 3 = 0),
       px AS (SELECT i.doc_id,
           CAST(b.i % 4 AS INTEGER) AS channel,
           CAST((((i.doc_id % 251) + y.y * 31 + b.i * 7) % 256) // 16 AS INTEGER) AS bin
         FROM imgs i, range(0, 17) y(y), range(0, 124) b(i)
         WHERE y.y < i.h AND b.i < i.w * 4)
       SELECT doc_id, channel, bin, count(*) AS n_px
       FROM px GROUP BY doc_id, channel, bin
       ORDER BY doc_id, channel, bin"""

  private val histProbes = 5
  private val histTopK = 5

  /** Histogram-intersection similarity: for [[histProbes]] probe
    * images, rank every other image by Σ min(hₐ, h_b) over the 64
    * (channel, bin) cells, normalized by the probe's pixel mass — the
    * classic color-similarity measure (Swain & Ballard 1991), and the
    * cheap first pass of image near-dup once [[pixelHistogram]] is
    * materialized. The probe side is a ≤ 64·[[histProbes]]-row
    * broadcast; the corpus side is the (sparse) histogram relation
    * joined on its (channel, bin) key — per-image work is O(64)
    * regardless of resolution, and nothing ever touches pixels again.
    * Similarity is an exact integer (min-sum of counts); the
    * normalized readout divides by the probe mass in one shared tree. */
  def histSimilarity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = pixelHistogram(spark, dir)
    val probes = hist.filter(col("doc_id") < histProbes * 3)
      .selectExpr("doc_id AS probe_id", "channel", "bin", "n_px AS p_px")
    val inter = hist.join(broadcast(probes),
        Seq("channel", "bin"))
      .filter(col("doc_id") =!= col("probe_id"))
      .groupBy("probe_id", "doc_id")
      .agg(sum(least(col("n_px"), col("p_px"))).as("inter_px"))
    val probeMass = probes.groupBy("probe_id")
      .agg(sum("p_px").as("probe_px"))
    val w = Window.partitionBy("probe_id")
      .orderBy(desc("inter_px"), asc("doc_id"))
    inter.join(broadcast(probeMass), Seq("probe_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= histTopK)
      .selectExpr("probe_id", "doc_id", "rank",
        "CAST(inter_px AS BIGINT) AS inter_px",
        "CAST(inter_px AS DOUBLE) / probe_px AS similarity")
      .orderBy("probe_id", "rank")
  }

  val histSimilarityOracle: String =
    s"""WITH hist AS ($pixelHistogramOracle),
        probes AS (SELECT doc_id AS probe_id, channel, bin, n_px AS p_px
                   FROM hist WHERE doc_id < ${histProbes * 3}),
        pm AS (SELECT probe_id, sum(p_px) AS probe_px FROM probes GROUP BY probe_id),
        inter AS (SELECT p.probe_id, h.doc_id,
            sum(least(h.n_px, p.p_px)) AS inter_px
          FROM hist h JOIN probes p
            ON h.channel = p.channel AND h.bin = p.bin
          WHERE h.doc_id <> p.probe_id
          GROUP BY p.probe_id, h.doc_id),
        ranked AS (SELECT i.*, pm.probe_px, CAST(row_number() OVER
            (PARTITION BY i.probe_id ORDER BY i.inter_px DESC, i.doc_id) AS BIGINT) AS rank
          FROM inter i JOIN pm ON i.probe_id = pm.probe_id)
        SELECT probe_id, doc_id, rank,
          CAST(inter_px AS BIGINT) AS inter_px,
          CAST(inter_px AS DOUBLE) / probe_px AS similarity
        FROM ranked WHERE rank <= $histTopK
        ORDER BY probe_id, rank"""

  case class MotionRow(doc_id: Long, n_frames: Int, frame_size: Long,
                       n_deltas: Long, motion_energy: Long)

  /** Frame-delta motion energy from REAL decoded Y4M frames: per
    * video, Σ over consecutive frame pairs of Σ_j |s_f(j) − s_{f−1}(j)|
    * — the temporal feature behind scene-cut detection and static-clip
    * filtering, and the first consumer that needs raw FRAMES rather
    * than plane aggregates ([[MediaCodec.decodeY4mFrames]]). Single-
    * frame videos emit 0 deltas (totality). The oracle recomputes
    * every |Δ| from the generative sample formula — the wrap cases
    * (s jumps 239 instead of 17 when the mod boundary crosses) are
    * exactly what proves real bytes were compared, not the formula's
    * shortcut. */
  def motionEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 2").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, frames) = videoDims(id)
          val y4m = MediaCodec.makeY4m(w, h, frames, (id % 251).toInt)
          val (video, fr) = MediaCodec.decodeY4mFrames(y4m).getOrElse(
            sys.error(s"y4m frame decode failed for doc $id"))
          val fs = fr.head.length
          var e = 0L
          var f = 1
          while (f < fr.length) {
            var j = 0
            while (j < fs) {
              e += math.abs((fr(f)(j) & 0xff) - (fr(f - 1)(j) & 0xff))
              j += 1
            }
            f += 1
          }
          MotionRow(id, video.frames, fs.toLong,
            (fr.length - 1).toLong * fs, e)
        }
      }
    rows.toDF()
      .selectExpr("doc_id", "n_frames", "frame_size", "n_deltas",
        "motion_energy",
        """CASE WHEN n_deltas > 0
             THEN CAST(motion_energy AS DOUBLE) / n_deltas
             ELSE CAST(0 AS DOUBLE) END AS mean_motion""")
      .orderBy("doc_id")
  }

  val motionEnergyOracle: String =
    """WITH vids AS (SELECT doc_id,
           CAST(2 * (doc_id % 8 + 1) AS INTEGER) AS w,
           CAST(2 * (doc_id % 6 + 1) AS INTEGER) AS h,
           CAST(doc_id % 4 + 1 AS INTEGER) AS n_frames
         FROM documents WHERE doc_id % 3 = 2),
       dims AS (SELECT *, w * h * 3 // 2 AS fs FROM vids),
       dl AS (SELECT d.doc_id, d.n_frames, d.fs,
           abs((((d.doc_id % 251) + f.f * 17 + j.j * 5) % 256)
             - (((d.doc_id % 251) + (f.f - 1) * 17 + j.j * 5) % 256)) AS ad
         FROM dims d, range(1, 4) f(f), range(0, 288) j(j)
         WHERE f.f < d.n_frames AND j.j < d.fs)
       SELECT v.doc_id, v.n_frames,
         CAST(v.fs AS BIGINT) AS frame_size,
         CAST((v.n_frames - 1) * v.fs AS BIGINT) AS n_deltas,
         CAST(coalesce(sum(dl.ad), 0) AS BIGINT) AS motion_energy,
         CASE WHEN v.n_frames > 1
           THEN CAST(coalesce(sum(dl.ad), 0) AS DOUBLE) / ((v.n_frames - 1) * v.fs)
           ELSE CAST(0 AS DOUBLE) END AS mean_motion
       FROM dims v LEFT JOIN dl ON v.doc_id = dl.doc_id
       GROUP BY v.doc_id, v.n_frames, v.fs
       ORDER BY v.doc_id"""

  /** 9-band layout over the 64-bit aHash: eight 7-bit bands + one
    * 8-bit band. Pigeonhole: Hamming ≤ 8 ⇒ at least one band
    * bit-identical, so the (band, value) equi-join is a LOSSLESS
    * candidate generator for the ≤ 8 near-dup filter — the image twin
    * of the text tier's SimHash banding. Arithmetic right-shift of
    * the signed hash is identical in both engines and the mask strips
    * the sign extension, so band values agree bit-for-bit. */
  private val ahashBands: Seq[(Int, Int)] =
    Seq((0, 7), (7, 7), (14, 7), (21, 7), (28, 7), (35, 7), (42, 7), (49, 7), (56, 8))

  private val ahashPairK = 50

  /** Image near-dup candidate pairs from aHash banding: the top
    * [[ahashPairK]] closest image pairs among band-collision
    * candidates, with their exact Hamming distance and the ≤ 8 dup
    * verdict. Candidates come from a (band, value) equi-join — never
    * an all-pairs product. On this fixture's pseudo-random rasters
    * true dups don't exist, so the readout is the nearest-pair tail
    * (all is_dup = 0) — the banding, collision, and verify machinery
    * is what the oracle locks.
    *
    * Scale shape (r13, after the lane flagged the naive form at 31×
    * wall and a 2.7 GB per-task hash-agg peak at 10× images): random
    * hashes make the candidate SET quadratic-ish (that's the
    * semantics — the oracle counts the same set), but only a
    * vanishing fraction can reach a top-50 readout, so nothing
    * quadratic may ever be deduplicated, shuffled, or held in an
    * aggregate. Three-step exact evaluation, all at (distinct aHash
    * VALUE) grain off one cut decode pass:
    *
    *   1. A streaming Hamming HISTOGRAM over cross-value band
    *      collisions — map-side combined to ≤ 65 counters, no
    *      distinct, nothing retained — plus the exact identical-value
    *      pair mass Σ C(cnt,2).
    *   2. A cutoff h* = min h with within + cum(h)/9 ≥ K. Band
    *      multiplicity inflates each value pair ≤ 9×, and a value
    *      pair expands to ≥ 1 member pair, so true cum count at h* is
    *      ≥ K — the top K provably lies at hamming ≤ h*.
    *   3. Re-join with `hamming <= h*` composed INTO the join, so
    *      only the tail survivors (hundreds, not millions) reach the
    *      DISTINCT, the member expansion, and the TakeOrderedAndProject.
    *
    * Member expansion is bounded by construction: any top-K pair can
    * only involve a group's K+1 SMALLEST doc_ids (for every pair
    * touching a later member, the K+1 pairs substituting each smaller
    * member are strictly (hamming, doc_a, doc_b)-smaller), so groups
    * keep `slice(sort_array(ids), 1, K+1)` and a viral cluster of
    * identical images expands to ≤ C(K+1, 2) rows, never C(cnt, 2).
    * Worst case (pair mass concentrated at one Hamming value) degrades
    * to the naive candidate volume — never worse than the r12 shape. */
  def ahashPairs(spark: SparkSession, dir: String): DataFrame =
    ahashPairsOf(pixelAhash(spark, dir).select("doc_id", "ahash"))

  /** [[ahashPairs]] parameterized by the (doc_id, ahash) relation —
    * the seam the viral/threshold spec drives with synthetic hash
    * corpora. */
  private[graft] def ahashPairsOf(ah: DataFrame): DataFrame = {
    val bandArr = ahashBands.map { case (o, w) =>
      s"(shiftright(ahash, $o) & ${(1 << w) - 1})" }.mkString(", ")
    val groups = graft.ops.Checkpoints.cut(
      ah.groupBy("ahash").agg(
          count(lit(1)).as("cnt"),
          expr(s"slice(sort_array(collect_list(doc_id)), 1, ${ahashPairK + 1})")
            .as("ms")))
    val banded = groups.selectExpr("ahash",
      s"posexplode(array($bandArr)) AS (band, bval)")
    def crossValues = banded.selectExpr("ahash AS va", "band", "bval")
      .join(banded.selectExpr("ahash AS vb", "band", "bval"),
        Seq("band", "bval"))
      .filter(col("va") < col("vb"))
      .selectExpr("va", "vb", "CAST(bit_count(va ^ vb) AS INT) AS hamming")
    val hist = crossValues.groupBy("hamming").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val withinTotal = groups
      .selectExpr("coalesce(sum(cnt * (cnt - 1) DIV 2), 0L) AS w")
      .head.getLong(0)
    val hStar = (0 to 64).find(h =>
      withinTotal + (0 to h).map(hist.getOrElse(_, 0L)).sum / 9.0
        >= ahashPairK).getOrElse(64)
    val cross = crossValues.filter(col("hamming") <= hStar).distinct()
      .join(groups.selectExpr("ahash AS va", "ms AS ms_a"), Seq("va"))
      .join(groups.selectExpr("ahash AS vb", "ms AS ms_b"), Seq("vb"))
      .select(col("hamming"), explode(col("ms_a")).as("a"), col("ms_b"))
      .select(col("hamming"), col("a"), explode(col("ms_b")).as("b"))
      .selectExpr("least(a, b) AS doc_a", "greatest(a, b) AS doc_b",
        "hamming")
    val within = groups.filter(col("cnt") >= 2)
      .select(explode(expr("flatten(transform(ms, (x, i) -> " +
        "transform(slice(ms, i + 2, size(ms)), y -> " +
        "struct(x AS a, y AS b))))")).as("p"))
      .selectExpr("p.a AS doc_a", "p.b AS doc_b", "CAST(0 AS INT) AS hamming")
    within.unionByName(cross)
      .selectExpr("doc_a", "doc_b", "hamming",
        "CASE WHEN hamming <= 8 THEN 1 ELSE 0 END AS is_dup")
      .orderBy(asc("hamming"), asc("doc_a"), asc("doc_b"))
      .limit(ahashPairK)
  }

  // lazy: textually precedes pixelAhashOracle in this object; a strict
  // val would read it as null during object init
  lazy val ahashPairsOracle: String = {
    val bandSelects = ahashBands.zipWithIndex.map { case ((o, w), i) =>
      s"SELECT doc_id, ahash, $i AS band, ((ahash >> $o) & ${(1 << w) - 1}) AS bval FROM ah"
    }.mkString(" UNION ALL ")
    s"""WITH ah AS (SELECT doc_id, ahash FROM ($pixelAhashOracle) pa),
        banded AS ($bandSelects),
        cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
            a.ahash AS ha, b.ahash AS hb
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
          CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
          CASE WHEN bit_count(xor(ha, hb)) <= 8 THEN 1 ELSE 0 END AS is_dup
        FROM cands
        ORDER BY hamming, doc_a, doc_b LIMIT $ahashPairK"""
  }

  case class PixelAhash(doc_id: Long, w: Int, h: Int, ahash: Long)

  /** Perceptual average-hash over the REAL decode path — the image
    * near-dup primitive (aHash): nearest-neighbor-sample the decoded
    * raster to an 8×8 grid of integer grayscales ((r+g+b) DIV 3),
    * threshold each cell against the integer mean (sum DIV 64), pack
    * the 64 bits. Two images within a few Hamming bits are
    * re-encodes/crops of each other; the downstream join is the
    * SimHash pigeonhole-banding machinery the text tier already has —
    * per-image work is O(1) after decode, and the hash is 8 bytes per
    * image regardless of resolution, which is what makes corpus-scale
    * image dedup storable. All arithmetic integer, so the oracle (the
    * generative raster formula, never decoded) matches bit-for-bit —
    * a hash-match proves encode→decode→sample→threshold end-to-end. */
  def pixelAhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = pixelDims(id)
          val png = MediaCodec.makePngWithPixels(
            w, h, pixelRaster(id, w, h), y => ((id + y) % 5).toInt)
          val img = MediaCodec.decodePngPixels(png).getOrElse(
            sys.error(s"pixel decode failed for doc $id"))
          val b = img.bytes
          val g = new Array[Long](64)
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              val x = i * img.width / 8
              val y = j * img.height / 8
              val off = (y * img.width + x) * 4
              g(j * 8 + i) =
                ((b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)) / 3
              i += 1
            }
            j += 1
          }
          val mean = g.sum / 64
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (g(k) > mean) hash |= (1L << k)
            k += 1
          }
          PixelAhash(id, img.width, img.height, hash)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Same generative-formula technique as [[pixelStatsOracle]]: cell
    * grayscales from the raster arithmetic (byte (x·4+c) of row y is
    * (base + y·31 + (x·4+c)·7) mod 256), integer mean, strict
    * threshold, bit k = cell (j·8+i). Bit weights are exact signed
    * BIGINT literals — bit 63 is Long.MinValue, so the two's-complement
    * SUM of disjoint weights equals the packed bit pattern (power(2,63)
    * would overflow). */
  val pixelAhashOracle: String = {
    val gExpr = (0 until 3).map { c =>
      s"(((i.doc_id % 251) + ((cj.j * i.h) // 8) * 31 " +
        s"+ (((ci.i * i.w) // 8) * 4 + $c) * 7) % 256)"
    }.mkString("(", " + ", ") // 3")
    val weights = (0 until 64).map { k =>
      s"($k, CAST(${1L << k} AS BIGINT))" }.mkString(", ")
    s"""WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 31 + 1 AS INTEGER) AS w,
           CAST(doc_id % 17 + 1 AS INTEGER) AS h
         FROM documents WHERE doc_id % 3 = 0),
       w64(k, wt) AS (SELECT * FROM (VALUES $weights) t(k, wt)),
       cells AS (SELECT i.doc_id, i.w, i.h, ci.i AS ci, cj.j AS cj,
           $gExpr AS g
         FROM imgs i, range(0, 8) ci(i), range(0, 8) cj(j)),
       means AS (SELECT doc_id, sum(g) // 64 AS m FROM cells GROUP BY doc_id),
       bits AS (SELECT c.doc_id, c.w, c.h,
           CASE WHEN c.g > m.m THEN w64.wt ELSE CAST(0 AS BIGINT) END AS bit
         FROM cells c JOIN means m ON c.doc_id = m.doc_id
         JOIN w64 ON w64.k = c.cj * 8 + c.ci)
       SELECT doc_id, w, h, CAST(sum(bit) AS BIGINT) AS ahash
       FROM bits GROUP BY doc_id, w, h ORDER BY doc_id"""
  }

  /** sum(b) in DuckDB is HUGEINT — cast back to BIGINT (sums are far
    * below 2^53, so the double mean conversion is exact too). DuckDB's
    * `range` table function cannot take lateral (per-row) bounds, so
    * the pixel grid is the MAX dims (31×17, the [[pixelDims]] moduli)
    * cross-joined then filtered to each image's actual w×h (same
    * technique in [[wavStatsOracle]]). */
  val pixelStatsOracle: String =
    """WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 31 + 1 AS INTEGER) AS w,
           CAST(doc_id % 17 + 1 AS INTEGER) AS h
         FROM documents WHERE doc_id % 3 = 0),
       px AS (SELECT i.doc_id, CAST(c.c AS INTEGER) AS channel,
           ((i.doc_id % 251) + y.y * 31 + (x.x * 4 + c.c) * 7) % 256 AS b
         FROM imgs i, range(0, 31) x(x), range(0, 17) y(y), range(0, 4) c(c)
         WHERE x.x < i.w AND y.y < i.h)
       SELECT doc_id, channel,
         count(*) AS n_pixels,
         CAST(sum(b) AS BIGINT) AS b_sum,
         CAST(min(b) AS INTEGER) AS b_min,
         CAST(max(b) AS INTEGER) AS b_max,
         sum(b) / CAST(count(*) AS DOUBLE) AS mean_val
       FROM px GROUP BY doc_id, channel ORDER BY doc_id, channel"""

  // ---- real sample-decode tier (MediaCodec.decodeWavSamples) ----

  case class WavChannelStats(doc_id: Long, channel: Int, n_samples: Long,
                             s_sum: Long, s_min: Int, s_max: Int)

  private[graft] def wavFrames(docId: Long): Int = (docId % 37 + 1).toInt
  private[graft] def wavChannels(docId: Long): Int = (docId % 2 + 1).toInt

  /** Deterministic interleaved PCM16 signal for audio doc `docId`:
    * sample i is ((docId % 251) + i·7919) % 65536 − 32768 — full int16
    * range incl. negatives, SQL-reproducible from doc_id alone. */
  private[graft] def wavSignal(docId: Long, frames: Int, channels: Int): Array[Short] = {
    val n = frames * channels
    val out = new Array[Short](n)
    val base = (docId % 251).toInt
    var i = 0
    while (i < n) {
      out(i) = (((base + i * 7919) % 65536) - 32768).toShort
      i += 1
    }
    out
  }

  /** Per-channel PCM statistics from REAL decoded WAV bytes — the
    * audio twin of [[pixelStats]]: each audio doc's signal is written
    * into a spec-valid PCM16 WAV in the executors and read back by
    * [[MediaCodec.decodeWavSamples]] (chunk walk + little-endian int16
    * decode) before the per-channel de-interleave. The oracle
    * recomputes every statistic arithmetically, so a hash-match proves
    * the data-chunk round-trip is sample-exact — including sign
    * handling at both int16 extremes. Decode failure throws (our own
    * builder's bytes). */
  def wavStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 1").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val frames = wavFrames(id); val ch = wavChannels(id)
          val wav = MediaCodec.makeWavWithSamples(
            ch, (8000 + (id % 5) * 8000).toInt, wavSignal(id, frames, ch))
          val pcm = MediaCodec.decodeWavSamples(wav).getOrElse(
            sys.error(s"wav decode failed for doc $id"))
          (0 until pcm.channels).map { c =>
            var s = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var j = c
            while (j < pcm.samples.length) {
              val v: Int = pcm.samples(j)
              s += v; if (v < mn) mn = v; if (v > mx) mx = v
              j += pcm.channels
            }
            WavChannelStats(id, c, pcm.samples.length.toLong / pcm.channels,
              s, mn, mx)
          }
        }
      }
    stats.toDF()
      .withColumn("mean_s", col("s_sum") / col("n_samples").cast("double"))
      .orderBy("doc_id", "channel")
  }

  val wavStatsOracle: String =
    """WITH auds AS (SELECT doc_id,
           CAST(doc_id % 37 + 1 AS INTEGER) AS frames,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 1),
       sm AS (SELECT a.doc_id, CAST(c.c AS INTEGER) AS channel,
           ((a.doc_id % 251) + (f.f * a.channels + c.c) * 7919) % 65536 - 32768 AS s
         FROM auds a, range(0, 37) f(f), range(0, 2) c(c)
         WHERE f.f < a.frames AND c.c < a.channels)
       SELECT doc_id, channel,
         count(*) AS n_samples,
         CAST(sum(s) AS BIGINT) AS s_sum,
         CAST(min(s) AS INTEGER) AS s_min,
         CAST(max(s) AS INTEGER) AS s_max,
         sum(s) / CAST(count(*) AS DOUBLE) AS mean_s
       FROM sm GROUP BY doc_id, channel ORDER BY doc_id, channel"""

  case class WavClipRow(doc_id: Long, n_samples: Long, n_clipped: Long,
                        peak: Int)

  /** Clipping detection on REAL decoded PCM — the audio QC gate
    * (clipped takes are unusable for training): per audio doc, how
    * many samples sit at the int16 rails (±32767/−32768) and the
    * absolute peak. Rides the same executor-side decode as
    * [[wavStats]]; the oracle recomputes every sample from the
    * generative formula, so the rail hits prove sign-exact decode at
    * both extremes (the formula sweeps the full int16 range). */
  def wavClipping(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 1").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val frames = wavFrames(id); val ch = wavChannels(id)
          val wav = MediaCodec.makeWavWithSamples(
            ch, (8000 + (id % 5) * 8000).toInt, wavSignal(id, frames, ch))
          val pcm = MediaCodec.decodeWavSamples(wav).getOrElse(
            sys.error(s"wav decode failed for doc $id"))
          var clipped = 0L; var peak = 0
          pcm.samples.foreach { s =>
            val v: Int = s
            if (v >= 32767 || v <= -32768) clipped += 1
            val a = math.abs(v); if (a > peak) peak = a
          }
          WavClipRow(id, pcm.samples.length.toLong, clipped, peak)
        }
      }
    rows.toDF()
      .selectExpr("doc_id", "n_samples", "n_clipped",
        "CAST(peak AS INT) AS peak",
        "CAST(n_clipped AS DOUBLE) / n_samples AS clip_rate")
      .orderBy("doc_id")
  }

  val wavClippingOracle: String =
    """WITH auds AS (SELECT doc_id,
           CAST(doc_id % 37 + 1 AS INTEGER) AS frames,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 1),
       sm AS (SELECT a.doc_id,
           ((a.doc_id % 251) + i.i * 7919) % 65536 - 32768 AS s
         FROM auds a, range(0, 74) i(i)
         WHERE i.i < a.frames * a.channels)
       SELECT doc_id, count(*) AS n_samples,
         CAST(sum(CASE WHEN s >= 32767 OR s <= -32768 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
         CAST(max(abs(s)) AS INTEGER) AS peak,
         CAST(sum(CASE WHEN s >= 32767 OR s <= -32768 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS clip_rate
       FROM sm GROUP BY doc_id ORDER BY doc_id"""

  // ---- real video-decode tier (MediaCodec.decodeY4m) ----

  case class VideoPlaneStats(doc_id: Long, width: Int, height: Int,
                             n_frames: Int, plane: Int, n_samples: Long,
                             s_sum: Long, s_min: Int, s_max: Int)

  /** Even 4:2:0-legal dims and a small frame count, all from doc_id. */
  private[graft] def videoDims(docId: Long): (Int, Int, Int) =
    ((2 * (docId % 8 + 1)).toInt, (2 * (docId % 6 + 1)).toInt,
      (docId % 4 + 1).toInt)

  /** Per-plane sample statistics from REAL decoded YUV4MPEG2 bytes —
    * the video twin of [[pixelStats]]/[[wavStats]], completing the
    * image/audio/video triple with honest container work on every
    * branch: each video doc becomes a spec-valid multi-frame y4m
    * stream in the executors (tokenized header, FRAME-delimited 4:2:0
    * payloads) and is decoded back by [[MediaCodec.decodeY4m]] (header
    * parse + full frame walk with truncation checks) before the stats
    * are taken. Width/height/frame-count in the output come from the
    * PARSED header, not the generator, so a hash-match proves the
    * container round-trip, the frame accounting, and the per-plane
    * sample partitioning all at once. Decode failure throws (our own
    * builder's bytes). Per-partition work, no shuffle until the final
    * tiny sort. */
  def videoStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 2").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h, frames) = videoDims(id)
          val y4m = MediaCodec.makeY4m(w, h, frames, (id % 251).toInt)
          val (video, planes) = MediaCodec.decodeY4m(y4m).getOrElse(
            sys.error(s"y4m decode failed for doc $id"))
          planes.map(p => VideoPlaneStats(id, video.width, video.height,
            video.frames, p.plane, p.nSamples, p.sum, p.min, p.max))
        }
      }
    stats.toDF()
      .withColumn("mean_s", col("s_sum") / col("n_samples").cast("double"))
      .orderBy("doc_id", "plane")
  }

  /** Same max-dims-grid-plus-filter technique as [[pixelStatsOracle]]:
    * frame-buffer index j runs over the flattened Y+U+V planes
    * (max 16·12·3/2 = 288 per frame, ≤ 4 frames). */
  val videoStatsOracle: String =
    """WITH vids AS (SELECT doc_id,
           CAST(2 * (doc_id % 8 + 1) AS INTEGER) AS w,
           CAST(2 * (doc_id % 6 + 1) AS INTEGER) AS h,
           CAST(doc_id % 4 + 1 AS INTEGER) AS n_frames
         FROM documents WHERE doc_id % 3 = 2),
       sm AS (SELECT v.doc_id, v.w, v.h, v.n_frames,
           CASE WHEN j.j < v.w * v.h THEN 0
                WHEN j.j < v.w * v.h + (v.w // 2) * (v.h // 2) THEN 1
                ELSE 2 END AS plane,
           ((v.doc_id % 251) + f.f * 17 + j.j * 5) % 256 AS s
         FROM vids v, range(0, 4) f(f), range(0, 288) j(j)
         WHERE f.f < v.n_frames AND j.j < v.w * v.h * 3 // 2)
       SELECT doc_id, w AS width, h AS height, n_frames,
         CAST(plane AS INTEGER) AS plane,
         count(*) AS n_samples,
         CAST(sum(s) AS BIGINT) AS s_sum,
         CAST(min(s) AS INTEGER) AS s_min,
         CAST(max(s) AS INTEGER) AS s_max,
         sum(s) / CAST(count(*) AS DOUBLE) AS mean_s
       FROM sm GROUP BY doc_id, w, h, n_frames, plane
       ORDER BY doc_id, plane"""

  // ---- JPEG tier: first perceptually-coded format ----

  private[graft] def jpegDims(docId: Long): (Int, Int) =
    ((docId % 21 + 10).toInt, (docId % 13 + 9).toInt)

  private[graft] def jpegBlockValue(docId: Long)(bx: Int, by: Int): Int =
    ((docId * 31 + bx * 17 + by * 29) % 256).toInt

  case class JpegStats(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, px_sum: Long, px_min: Long, px_max: Long)

  /** Grayscale pixel statistics from REAL baseline-JPEG decode: each
    * image doc is encoded to a spec-valid JFIF file in the executors
    * ([[JpegCodec.encodeGrayConstantBlocks]] — standard Annex K
    * Huffman tables, DC quantizer 4, real DC prediction and byte
    * stuffing) and decoded back by the general baseline decoder
    * ([[JpegCodec.decode]] — marker walk, DHT table build, entropy
    * decode with 0xFF00 unstuffing, dequantization, floating IDCT,
    * MCU-padding crop). The fixture's constant-per-block rasters make
    * the lossy pipeline bit-exact (object doc on [[JpegCodec]]), so
    * the oracle recomputes every statistic arithmetically and a hash
    * match proves the whole markers→Huffman→dequant→IDCT path. Odd
    * dimensions (10..30 × 9..21) keep partial edge blocks in every
    * image, so the crop path is always exercised. A decode failure
    * throws: these are our own builder's bytes. */
  def jpegStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 1").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = jpegDims(id)
          val jpg = JpegCodec.encodeGrayConstantBlocks(w, h, jpegBlockValue(id))
          val img = JpegCodec.decode(jpg).getOrElse(
            sys.error(s"jpeg decode failed for doc $id"))
          if (img.width != w || img.height != h || img.components != 1)
            sys.error(s"jpeg dims mismatch for doc $id: " +
              s"${img.width}x${img.height}x${img.components}")
          var s = 0L; var mn = 255L; var mx = 0L
          var j = 0
          while (j < img.bytes.length) {
            val v = img.bytes(j) & 0xff
            s += v; if (v < mn) mn = v; if (v > mx) mx = v
            j += 1
          }
          JpegStats(id, w.toLong, h.toLong, img.bytes.length.toLong, s, mn, mx)
        }
      }
    stats.toDF()
      .withColumn("mean_val", col("px_sum") / col("n_pixels").cast("double"))
      .orderBy("doc_id")
  }

  /** Block-grid oracle: every pixel's value is its 8x8 block's
    * constant, so per-image stats aggregate over blocks weighted by
    * the cropped block footprint least(8, w−8bx)·least(8, h−8by) —
    * the same max-grid-plus-filter technique as [[pixelStatsOracle]]
    * (w ≤ 30, h ≤ 21 ⇒ at most 4×3 blocks). */
  val jpegStatsOracle: String =
    """WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 21 + 10 AS BIGINT) AS w,
           CAST(doc_id % 13 + 9 AS BIGINT) AS h
         FROM documents WHERE doc_id % 3 = 1),
       blk AS (SELECT i.doc_id, i.w, i.h,
           least(8, i.w - 8 * t1.bx) AS bw,
           least(8, i.h - 8 * t2.byy) AS bh,
           (i.doc_id * 31 + t1.bx * 17 + t2.byy * 29) % 256 AS c
         FROM imgs i, range(0, 4) t1(bx), range(0, 4) t2(byy)
         WHERE 8 * t1.bx < i.w AND 8 * t2.byy < i.h)
       SELECT doc_id, w AS width, h AS height,
         CAST(sum(bw * bh) AS BIGINT) AS n_pixels,
         CAST(sum(bw * bh * c) AS BIGINT) AS px_sum,
         CAST(min(c) AS BIGINT) AS px_min,
         CAST(max(c) AS BIGINT) AS px_max,
         sum(bw * bh * c) / CAST(sum(bw * bh) AS DOUBLE) AS mean_val
       FROM blk GROUP BY doc_id, w, h ORDER BY doc_id"""

  // ---- image resize (box-filter thumbnail) ----

  case class ThumbCell(doc_id: Long, tx: Int, ty: Int, n_px: Long,
      px_sum: Long)

  private val thumbDim = 4

  /** Fixed-grid box-filter downsample on REAL decoded PNG pixels — the
    * resize step of an image-curation pipeline (thumbnails feed
    * perceptual hashing, manual QA grids, and cheap vision-model
    * pre-filters). Every source pixel lands in exactly one target cell
    * by the integer box partition tx = x·4 div w (exact and total for
    * any source size, no float resampling kernel to disagree about);
    * cell means are exact integer sums over the decoded channel-0
    * bytes. Images smaller than 4×4 legitimately produce fewer cells
    * (only non-empty cells emit — the sparse form). Decode rides the
    * same executor-side PNG path as [[pixelStats]]; the oracle
    * recomputes every cell from the generative raster formula, so a
    * hash-match proves decode + partition + accumulate. */
  def pixelThumbnail(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val (w, h) = pixelDims(id)
          val png = MediaCodec.makePngWithPixels(
            w, h, pixelRaster(id, w, h), y => ((id + y) % 5).toInt)
          val img = MediaCodec.decodePngPixels(png).getOrElse(
            sys.error(s"pixel decode failed for doc $id"))
          val sums = Array.ofDim[Long](thumbDim, thumbDim)
          val counts = Array.ofDim[Long](thumbDim, thumbDim)
          var y = 0
          while (y < h) {
            val ty = y * thumbDim / h
            var x = 0
            while (x < w) {
              val tx = x * thumbDim / w
              sums(ty)(tx) += img.bytes((y * w + x) * 4) & 0xff // channel 0
              counts(ty)(tx) += 1
              x += 1
            }
            y += 1
          }
          for (ty <- 0 until thumbDim; tx <- 0 until thumbDim
               if counts(ty)(tx) > 0)
            yield ThumbCell(id, tx, ty, counts(ty)(tx), sums(ty)(tx))
        }
      }
    cells.toDF()
      .withColumn("mean_val", col("px_sum") / col("n_px").cast("double"))
      .orderBy("doc_id", "ty", "tx")
  }

  /** Source-pixel grid + integer box partition, grouped per cell —
    * channel-0 value at (x, y) is (base + y·31 + 28x) mod 256 from the
    * raster formula (byte index x·4 + 0). */
  val pixelThumbnailOracle: String =
    s"""WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 31 + 1 AS BIGINT) AS w,
           CAST(doc_id % 17 + 1 AS BIGINT) AS h,
           doc_id % 251 AS base
         FROM documents WHERE doc_id % 3 = 0),
       px AS (SELECT i.doc_id, i.w, i.h,
           CAST(t1.x * $thumbDim // i.w AS INTEGER) AS tx,
           CAST(t2.y * $thumbDim // i.h AS INTEGER) AS ty,
           (i.base + t2.y * 31 + t1.x * 28) % 256 AS v
         FROM imgs i, range(0, 31) t1(x), range(0, 17) t2(y)
         WHERE t1.x < i.w AND t2.y < i.h)
       SELECT doc_id, tx, ty,
         CAST(count(*) AS BIGINT) AS n_px,
         CAST(sum(v) AS BIGINT) AS px_sum,
         sum(v) / CAST(count(*) AS DOUBLE) AS mean_val
       FROM px GROUP BY doc_id, tx, ty ORDER BY doc_id, ty, tx"""

  // ---- audio zero-crossing rate ----

  case class ZcrRow(doc_id: Long, channel: Int, n_frames: Long,
      n_crossings: Long)

  /** Per-channel zero-crossing count on REAL decoded PCM — the classic
    * cheap audio feature (ZCR separates voiced/unvoiced speech and
    * flags silence vs noise before any model runs). A crossing is a
    * strict sign flip between consecutive frames of one channel, with
    * sign(x) = x < 0 (zero counts as non-negative — fixed convention
    * both engines implement identically). Rides the same executor-side
    * WAV decode as [[wavStats]]; the oracle recomputes every
    * consecutive pair from the generative signal formula. */
  def wavZcr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 1").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val frames = wavFrames(id); val ch = wavChannels(id)
          val wav = MediaCodec.makeWavWithSamples(
            ch, (8000 + (id % 5) * 8000).toInt, wavSignal(id, frames, ch))
          val pcm = MediaCodec.decodeWavSamples(wav).getOrElse(
            sys.error(s"wav decode failed for doc $id"))
          (0 until pcm.channels).map { c =>
            var crossings = 0L
            var f = 1
            while (f < frames) {
              val prev = pcm.samples((f - 1) * pcm.channels + c) < 0
              val cur = pcm.samples(f * pcm.channels + c) < 0
              if (prev != cur) crossings += 1
              f += 1
            }
            ZcrRow(id, c, frames.toLong, crossings)
          }
        }
      }
    rows.toDF()
      .withColumn("zcr_rate",
        when(col("n_frames") > 1,
          col("n_crossings") / (col("n_frames") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .orderBy("doc_id", "channel")
  }

  val wavZcrOracle: String =
    """WITH auds AS (SELECT doc_id,
           CAST(doc_id % 37 + 1 AS INTEGER) AS frames,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 1),
       sm AS (SELECT a.doc_id, a.frames, a.channels,
           CAST(f.f AS INTEGER) AS f, CAST(c.c AS INTEGER) AS channel,
           ((a.doc_id % 251) + (f.f * a.channels + c.c) * 7919) % 65536 - 32768 AS s
         FROM auds a, range(0, 37) f(f), range(0, 2) c(c)
         WHERE f.f < a.frames AND c.c < a.channels),
       pairs AS (SELECT cur.doc_id, cur.channel, cur.frames,
           CASE WHEN (prev.s < 0) <> (cur.s < 0) THEN 1 ELSE 0 END AS x
         FROM sm cur JOIN sm prev
           ON prev.doc_id = cur.doc_id AND prev.channel = cur.channel
           AND prev.f = cur.f - 1),
       g AS (SELECT a.doc_id, c.c AS channel,
           CAST(a.frames AS BIGINT) AS n_frames,
           CAST(coalesce((SELECT sum(x) FROM pairs p
             WHERE p.doc_id = a.doc_id AND p.channel = c.c), 0) AS BIGINT)
             AS n_crossings
         FROM auds a, range(0, 2) c(c) WHERE c.c < a.channels)
       SELECT doc_id, CAST(channel AS INTEGER) AS channel, n_frames,
         n_crossings,
         CASE WHEN n_frames > 1
           THEN n_crossings / CAST(n_frames - 1 AS DOUBLE) ELSE 0.0 END
           AS zcr_rate
       FROM g ORDER BY doc_id, channel"""

  // ---- real compressed-audio tier (FlacCodec) ----

  private[graft] def flacInterFrames(docId: Long): Int =
    (docId % 617 + 64).toInt
  private[graft] def flacChannels(docId: Long): Int = (docId % 2 + 1).toInt

  /** Deterministic interleaved PCM16 for FLAC doc `docId` — distinct
    * constants from [[wavSignal]] so the two audio tiers can never
    * mask each other: sample i is ((docId % 241) + i·6007) % 65536 −
    * 32768, full int16 range, SQL-reproducible from doc_id alone. */
  private[graft] def flacSignal(docId: Long, n: Int): Array[Short] = {
    val out = new Array[Short](n)
    val base = (docId % 241).toInt
    var i = 0
    while (i < n) {
      out(i) = (((base + i * 6007) % 65536) - 32768).toShort
      i += 1
    }
    out
  }

  case class FlacChannelStats(doc_id: Long, channel: Int, n_frames: Int,
      n_samples: Long, s_sum: Long, s_min: Int, s_max: Int)

  /** Per-channel PCM statistics from REAL entropy-coded FLAC — the
    * compressed-audio twin of [[jpegStats]]: each audio doc's signal
    * is encoded in the executors to a spec-compliant FLAC stream
    * ([[FlacCodec.encode]] — STREAMINFO, UTF-8-coded frame numbers,
    * best-of-orders fixed predictors, cost-minimizing Rice residuals,
    * CRC-8 + CRC-16) and decoded back by the general subset decoder
    * (bit-level reads, predictor reconstruction, both CRCs VALIDATED).
    * FLAC is lossless, so unlike JPEG no fixture restriction is needed
    * for bit-exactness: the noise-like signal stresses the Rice coder
    * at high parameters while the oracle recomputes every statistic
    * from the generative formula. The 256-sample block size forces
    * multi-frame streams with a partial tail frame on almost every
    * doc (64..680 interchannel samples), so the frame walk, coded
    * frame numbers, and last-frame-shorter path are always exercised;
    * n_frames is part of the hashed output. Decode failure throws:
    * our own builder's bytes. */
  def flacStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 2").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val nInter = flacInterFrames(id); val ch = flacChannels(id)
          val flac = FlacCodec.encode(
            flacSignal(id, nInter * ch), ch,
            (8000 + (id % 5) * 8000).toInt)
          val dec = FlacCodec.decode(flac).getOrElse(
            sys.error(s"flac decode failed for doc $id"))
          if (dec.info.channels != ch || dec.samples.length != nInter * ch)
            sys.error(s"flac shape mismatch for doc $id")
          (0 until ch).map { c =>
            var s = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var j = c
            while (j < dec.samples.length) {
              val v = dec.samples(j)
              s += v; if (v < mn) mn = v; if (v > mx) mx = v
              j += ch
            }
            FlacChannelStats(id, c, dec.nFrames, nInter.toLong, s, mn, mx)
          }
        }
      }
    stats.toDF()
      .withColumn("mean_s", col("s_sum") / col("n_samples").cast("double"))
      .orderBy("doc_id", "channel")
  }

  /** Arithmetic oracle over the generative signal (the [[wavStats]]
    * technique); n_frames is ceil(n/256) — the encoder's fixed
    * blocking made SQL-checkable. */
  val flacStatsOracle: String =
    """WITH auds AS (SELECT doc_id,
           CAST(doc_id % 617 + 64 AS INTEGER) AS n,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 2),
       sm AS (SELECT a.doc_id, CAST(c.c AS INTEGER) AS channel,
           ((a.doc_id % 241) + (f.f * a.channels + c.c) * 6007) % 65536
             - 32768 AS s
         FROM auds a, range(0, 680) f(f), range(0, 2) c(c)
         WHERE f.f < a.n AND c.c < a.channels)
       SELECT sm.doc_id, sm.channel,
         CAST((a.n + 255) // 256 AS INTEGER) AS n_frames,
         count(*) AS n_samples,
         CAST(sum(sm.s) AS BIGINT) AS s_sum,
         CAST(min(sm.s) AS INTEGER) AS s_min,
         CAST(max(sm.s) AS INTEGER) AS s_max,
         sum(sm.s) / CAST(count(*) AS DOUBLE) AS mean_s
       FROM sm JOIN auds a ON sm.doc_id = a.doc_id
       GROUP BY sm.doc_id, sm.channel, a.n ORDER BY sm.doc_id, sm.channel"""

  // ---- Sobel edge energy on the real PNG decode ----

  case class EdgeEnergy(doc_id: Long, width: Int, height: Int,
      n_interior: Long, energy: Long)

  /** Sobel gradient energy over REAL decoded PNG pixels — the edge/
    * blur screen of an image-curation pipeline (near-zero energy
    * flags blank or synthetic-flat images; extreme energy flags noise
    * and moire — both are drop signals before vision training). The
    * 3×3 Sobel kernels run on channel 0 over interior pixels in the
    * executor right after the [[pixelStats]] decode path; energy =
    * Σ|gx|+|gy| is an exact BIGINT. Sub-3×3 images legitimately emit
    * zero interior pixels and zero energy (totality). The oracle
    * recomputes every gradient from the generative raster formula —
    * whose mod-256 wraps produce large legitimate gradients at wrap
    * columns, so a hash-match proves the kernel really read the
    * decoded neighbor bytes (the [[motionEnergy]] wrap argument). */
  def edgeEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = pixelDims(id)
          val png = MediaCodec.makePngWithPixels(
            w, h, pixelRaster(id, w, h), y => ((id + y) % 5).toInt)
          val img = MediaCodec.decodePngPixels(png).getOrElse(
            sys.error(s"pixel decode failed for doc $id"))
          def v(x: Int, y: Int): Int = img.bytes((y * w + x) * 4) & 0xff
          var energy = 0L; var n = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)) -
                (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1))
              val gy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)) -
                (v(x - 1, y - 1) + 2 * v(x, y - 1) + v(x + 1, y - 1))
              energy += math.abs(gx) + math.abs(gy)
              n += 1
              x += 1
            }
            y += 1
          }
          EdgeEnergy(id, w, h, n, energy)
        }
      }
    rows.toDF()
      .selectExpr("doc_id", "width", "height", "n_interior", "energy",
        "CASE WHEN n_interior > 0 THEN CAST(energy AS DOUBLE) / n_interior " +
          "ELSE 0.0 END AS mean_energy")
      .orderBy("doc_id")
  }

  /** Channel-0 value at (x, y) is (base + 31y + 28x) % 256; the nine
    * kernel taps recompute it at each offset. */
  val edgeEnergyOracle: String = {
    def v(dx: Int, dy: Int): String =
      s"(((i.doc_id % 251) + 31 * (g.y + ${dy}) + 28 * (g.x + ${dx})) % 256)"
    val gx = s"((${v(1, -1)} + 2 * ${v(1, 0)} + ${v(1, 1)}) - " +
      s"(${v(-1, -1)} + 2 * ${v(-1, 0)} + ${v(-1, 1)}))"
    val gy = s"((${v(-1, 1)} + 2 * ${v(0, 1)} + ${v(1, 1)}) - " +
      s"(${v(-1, -1)} + 2 * ${v(0, -1)} + ${v(1, -1)}))"
    s"""WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 31 + 1 AS INTEGER) AS w,
           CAST(doc_id % 17 + 1 AS INTEGER) AS h
         FROM documents WHERE doc_id % 3 = 0),
       grid AS (SELECT CAST(x.x AS BIGINT) AS x, CAST(y.y AS BIGINT) AS y
         FROM range(1, 30) x(x), range(1, 16) y(y)),
       px AS (SELECT i.doc_id, i.w, i.h,
           abs($gx) + abs($gy) AS e
         FROM imgs i JOIN grid g ON g.x < i.w - 1 AND g.y < i.h - 1)
       SELECT i.doc_id, i.w AS width, i.h AS height,
         CAST(coalesce(p.n, 0) AS BIGINT) AS n_interior,
         CAST(coalesce(p.energy, 0) AS BIGINT) AS energy,
         CASE WHEN coalesce(p.n, 0) > 0
           THEN CAST(p.energy AS DOUBLE) / p.n ELSE 0.0 END AS mean_energy
       FROM imgs i LEFT JOIN (SELECT doc_id, count(*) AS n,
           sum(e) AS energy FROM px GROUP BY doc_id) p
         ON i.doc_id = p.doc_id
       ORDER BY i.doc_id"""
  }

  // ---- Walsh-Hadamard spectral energy on the FLAC decode ----

  case class WhtBand(doc_id: Long, channel: Int, band: Int, energy: Long)

  /** Sequency-band energy via a 64-point Walsh–Hadamard transform on
    * the first 64 samples of each REAL-decoded FLAC channel — the
    * integer-exact stand-in for spectral analysis (audio fingerprints
    * and band-energy QC use exactly this transform family): unlike a
    * DFT there is no trigonometry, so every coefficient is an exact
    * BIGINT in BOTH engines and the usual libm-divergence hazard
    * never arises. The executor runs the fast butterfly
    * (O(n log n), the production shape); the ORACLE computes every
    * coefficient by the O(n²) direct form c_k = Σ x_n·(−1)^popcount(k&n)
    * — a hash match therefore proves the butterfly IS the transform,
    * on entropy-decoded bytes. Natural (Hadamard) coefficient order;
    * bands are the dyadic octaves of k. */
  def whtBandEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 2").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val nInter = flacInterFrames(id); val ch = flacChannels(id)
          val flac = FlacCodec.encode(
            flacSignal(id, nInter * ch), ch,
            (8000 + (id % 5) * 8000).toInt)
          val dec = FlacCodec.decode(flac).getOrElse(
            sys.error(s"flac decode failed for doc $id"))
          (0 until ch).flatMap { c =>
            val x = new Array[Long](64)
            var i = 0
            while (i < 64) { x(i) = dec.samples(i * ch + c).toLong; i += 1 }
            // in-place fast WHT butterfly (natural order)
            var len = 1
            while (len < 64) {
              var base = 0
              while (base < 64) {
                var j = base
                while (j < base + len) {
                  val a = x(j); val b = x(j + len)
                  x(j) = a + b; x(j + len) = a - b
                  j += 1
                }
                base += 2 * len
              }
              len *= 2
            }
            val bands = new Array[Long](7)
            var k = 0
            while (k < 64) {
              val band =
                if (k == 0) 0
                else if (k == 1) 1
                else if (k < 4) 2
                else if (k < 8) 3
                else if (k < 16) 4
                else if (k < 32) 5
                else 6
              bands(band) += x(k) * x(k)
              k += 1
            }
            (0 until 7).map(b => WhtBand(id, c, b, bands(b)))
          }
        }
      }
    rows.toDF().orderBy("doc_id", "channel", "band")
  }

  /** Direct-form oracle: sign(k, n) = 1 − 2·(popcount(k AND n) mod 2),
    * samples from the generative FLAC signal formula. */
  val whtBandEnergyOracle: String =
    """WITH auds AS (SELECT doc_id,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 2),
       sm AS (SELECT a.doc_id, CAST(c.c AS INTEGER) AS channel,
           CAST(n.n AS INTEGER) AS n,
           ((a.doc_id % 241) + (n.n * a.channels + c.c) * 6007) % 65536
             - 32768 AS x
         FROM auds a, range(0, 64) n(n), range(0, 2) c(c)
         WHERE c.c < a.channels),
       coeffs AS (SELECT s.doc_id, s.channel, CAST(k.k AS INTEGER) AS k,
           CAST(sum(s.x * (1 - 2 * (bit_count(CAST(k.k AS BIGINT) & s.n) % 2))) AS BIGINT) AS ck
         FROM sm s, range(0, 64) k(k)
         GROUP BY s.doc_id, s.channel, k.k)
       SELECT doc_id, channel,
         CASE WHEN k = 0 THEN 0 WHEN k = 1 THEN 1 WHEN k < 4 THEN 2
              WHEN k < 8 THEN 3 WHEN k < 16 THEN 4 WHEN k < 32 THEN 5
              ELSE 6 END AS band,
         CAST(sum(ck * ck) AS BIGINT) AS energy
       FROM coeffs
       GROUP BY doc_id, channel, band
       ORDER BY doc_id, channel, band"""

  // ---- GIF (LZW) decode stats ----

  private[graft] def gifDims(docId: Long): (Int, Int) =
    ((docId % 29 + 1).toInt, (docId % 13 + 1).toInt)

  /** Deterministic palette-index raster for GIF doc `docId`:
    * p(x, y) = ((docId % 239) + 31·y + 7·x) % 256, identity grayscale
    * palette so index == gray value — SQL-reproducible per pixel. */
  private[graft] def gifRaster(docId: Long, w: Int, h: Int): Array[Int] = {
    val base = (docId % 239).toInt
    Array.tabulate(w * h)(i => (base + 31 * (i / w) + 7 * (i % w)) % 256)
  }

  case class GifStats(doc_id: Long, width: Int, height: Int,
                      n_pixels: Long, p_sum: Long, p_min: Int, p_max: Int)

  /** Pixel statistics from REAL decoded GIF bytes — the third
    * compressed format after JPEG (transform+Huffman) and FLAC
    * (predictive+Rice): [[GifCodec]] LZW with variable-width codes,
    * mid-stream dictionary resets, and LSB-first packing. Each image
    * doc's generative raster is LZW-compressed into a spec-valid
    * GIF87a in the executors and decoded back before the stats, and
    * the oracle recomputes every statistic from the raster formula —
    * GIF is lossless over palette indices, so a hash match proves the
    * string-table round-trip bit-exact on real entropy-coded bytes.
    * Same shape discipline as [[pixelStats]]: decode at the
    * mapPartitions boundary, relational after. */
  def gifStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 0").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = gifDims(id)
          val gif = GifCodec.encode(w, h, gifRaster(id, w, h))
          val img = GifCodec.decode(gif).getOrElse(
            sys.error(s"gif decode failed for doc $id"))
          var s = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < img.pixels.length) {
            val v = img.palette(img.pixels(i)) & 0xff // gray == index
            s += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          GifStats(id, img.width, img.height,
            img.width.toLong * img.height, s, mn, mx)
        }
      }
    rows.toDF()
      .withColumn("mean_val", col("p_sum") / col("n_pixels").cast("double"))
      .orderBy("doc_id")
  }

  val gifStatsOracle: String =
    """WITH imgs AS (SELECT doc_id,
           CAST(doc_id % 29 + 1 AS INTEGER) AS w,
           CAST(doc_id % 13 + 1 AS INTEGER) AS h
         FROM documents WHERE doc_id % 3 = 0),
       grid AS (SELECT CAST(x.x AS BIGINT) AS x, CAST(y.y AS BIGINT) AS y
         FROM range(0, 29) x(x), range(0, 13) y(y)),
       px AS (SELECT i.doc_id, i.w, i.h,
           ((i.doc_id % 239) + 31 * g.y + 7 * g.x) % 256 AS v
         FROM imgs i JOIN grid g ON g.x < i.w AND g.y < i.h)
       SELECT doc_id, CAST(max(w) AS INTEGER) AS width,
         CAST(max(h) AS INTEGER) AS height,
         count(*) AS n_pixels,
         CAST(sum(v) AS BIGINT) AS p_sum,
         CAST(min(v) AS INTEGER) AS p_min,
         CAST(max(v) AS INTEGER) AS p_max,
         sum(v) / CAST(count(*) AS DOUBLE) AS mean_val
       FROM px GROUP BY doc_id ORDER BY doc_id"""

  // ---- fixed-point DFT bin energy on the FLAC decode ----

  /** Analysis bins for [[dftBinEnergy]]: DC-adjacent through Nyquist-
    * adjacent octaves of a 64-point frame. */
  private val dftBins = Array(1, 2, 4, 8, 16, 31)

  /** Q7 integer twiddle factors, computed ONCE here and shared by the
    * executor loop and the oracle SQL text (as literals) — the DFT
    * analogue of the repo-wide "one builder emits both engines" rule.
    * Fixed-point is what makes a TRIG transform oracle-matchable at
    * all: `cos()` routes through each engine's libm, whose last-ulp
    * results are not contractually identical, so the transform bakes
    * the trigonometry into integers up front and the query itself
    * never calls a transcendental. Q7 (×128) is chosen against the
    * BIGINT budget: |Σ x·c| ≤ 64·2¹⁵·2⁷ = 2²⁸, so re²+im² ≤ 2⁵⁷ —
    * exact in both engines' 64-bit sums (Q14 would overflow at 2⁷⁰). */
  private val dftCos: Array[Array[Int]] = dftBins.map(k =>
    Array.tabulate(64)(n =>
      math.round(math.cos(2 * math.Pi * k * n / 64) * 128).toInt))
  private val dftSin: Array[Array[Int]] = dftBins.map(k =>
    Array.tabulate(64)(n =>
      math.round(math.sin(2 * math.Pi * k * n / 64) * 128).toInt))

  case class DftBin(doc_id: Long, channel: Int, k: Int,
                    re: Long, im: Long, energy: Long)

  /** True sinusoidal bin energy via a fixed-point 64-point DFT on the
    * first 64 samples of each REAL-decoded FLAC channel — the
    * frequency-domain twin of [[whtBandEnergy]]: WHT gives sequency
    * octaves with no trigonometry at all; this gives genuine Fourier
    * bins (what audio QC, bandwidth detection, and codec-artifact
    * screens actually read) while STAYING integer-exact through the
    * Q7 twiddle quantization above. Executor side runs the direct
    * per-bin correlation on entropy-decoded bytes (6 bins × 64 macs
    * per channel — cheaper than a full FFT at this bin count);
    * relational from there on. The oracle recomputes every
    * correlation from the generative signal formula joined against
    * the SAME literal twiddle table, so a hash match proves the
    * decode AND the fixed-point arithmetic end-to-end. Scale shape:
    * per-doc local work inside the one sanctioned mapPartitions
    * decode boundary; the output is 6·channels rows per doc. */
  def dftBinEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bins = dftBins; val cosT = dftCos; val sinT = dftSin
    val rows = Tables.documents(spark, dir)
      .select("doc_id").where("doc_id % 3 = 2").as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val nInter = flacInterFrames(id); val ch = flacChannels(id)
          val flac = FlacCodec.encode(
            flacSignal(id, nInter * ch), ch,
            (8000 + (id % 5) * 8000).toInt)
          val dec = FlacCodec.decode(flac).getOrElse(
            sys.error(s"flac decode failed for doc $id"))
          (0 until ch).flatMap { c =>
            val x = new Array[Long](64)
            var i = 0
            while (i < 64) { x(i) = dec.samples(i * ch + c).toLong; i += 1 }
            bins.indices.map { bi =>
              var re = 0L; var im = 0L; var n = 0
              while (n < 64) {
                re += x(n) * cosT(bi)(n); im += x(n) * sinT(bi)(n); n += 1
              }
              DftBin(id, c, bins(bi), re, im, re * re + im * im)
            }
          }
        }
      }
    rows.toDF().orderBy("doc_id", "channel", "k")
  }

  /** Oracle: generative samples joined against the literal twiddle
    * table — 384 (k, n, cw, sw) rows interpolated from [[dftCos]] /
    * [[dftSin]], so both engines correlate against identical
    * integers by construction. */
  val dftBinEnergyOracle: String = {
    val tw = (for {
      bi <- dftBins.indices; n <- 0 until 64
    } yield s"(${dftBins(bi)},$n,${dftCos(bi)(n)},${dftSin(bi)(n)})")
      .mkString(", ")
    s"""WITH auds AS (SELECT doc_id,
           CAST(doc_id % 2 + 1 AS INTEGER) AS channels
         FROM documents WHERE doc_id % 3 = 2),
       sm AS (SELECT a.doc_id, CAST(c.c AS INTEGER) AS channel,
           CAST(n.n AS INTEGER) AS n,
           ((a.doc_id % 241) + (n.n * a.channels + c.c) * 6007) % 65536
             - 32768 AS x
         FROM auds a, range(0, 64) n(n), range(0, 2) c(c)
         WHERE c.c < a.channels),
       tw AS (SELECT * FROM (VALUES $tw) AS t(k, n, cw, sw)),
       co AS (SELECT s.doc_id, s.channel, CAST(t.k AS INTEGER) AS k,
           CAST(sum(s.x * t.cw) AS BIGINT) AS re,
           CAST(sum(s.x * t.sw) AS BIGINT) AS im
         FROM sm s JOIN tw t ON t.n = s.n
         GROUP BY s.doc_id, s.channel, t.k)
       SELECT doc_id, channel, k, re, im,
         CAST(re * re + im * im AS BIGINT) AS energy
       FROM co ORDER BY doc_id, channel, k"""
  }
}
