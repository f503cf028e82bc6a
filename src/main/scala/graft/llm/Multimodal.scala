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
  * The actual decoders are STUBS (image/audio libraries are not in
  * this environment): [[FakeCodec]] produces a deterministic feature
  * vector from the payload bytes. The Spark-side plumbing — schema,
  * partitioning, typed signature, batch shape — is real and is what
  * the unit spec exercises.
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
}
