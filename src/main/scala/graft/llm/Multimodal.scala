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
  * Two codec tiers:
  *  - [[MediaCodec]] is REAL: dependency-free container sniffing and
  *    PNG-IHDR / WAV-fmt header parsing over genuine container bytes
  *    (the metadata tier that drives routing/filtering at scale —
  *    oracle-checked end-to-end via [[headerMeta]]);
  *  - [[FakeCodec]] remains a clearly-marked stand-in for full
  *    pixel/sample decode (image/audio libraries are not in this
  *    environment); it produces a deterministic feature vector so the
  *    feature-pipeline plumbing stays testable.
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
}
