package graft.llm

import java.util.zip.CRC32

/** Dependency-free binary media codec: container sniffing and header
  * parsing for PNG (IHDR: width/height/bit depth/color type) and WAV
  * (RIFF fmt chunk: channels/sample rate/bits per sample), plus
  * builders that emit structurally valid minimal files (real
  * signatures, chunk layout, and CRCs) so the parser is exercised
  * against genuine container bytes.
  *
  * This replaces the round-1 stub for the *metadata* tier of the
  * multimodal pipeline: header parsing needs no external libraries and
  * is what drives schema/routing decisions at scale (decode only what
  * you'll keep). Full pixel/sample decode still needs codec libraries
  * not present in this environment and remains out of scope.
  */
object MediaCodec {

  private val pngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Container by magic bytes: "png", "wav", or "unknown". */
  def sniff(payload: Array[Byte]): String =
    if (payload.length >= 8 && payload.take(8).sameElements(pngMagic)) "png"
    else if (payload.length >= 12
      && payload.take(4).sameElements("RIFF".getBytes("US-ASCII"))
      && payload.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII"))) "wav"
    else "unknown"

  case class PngHeader(width: Int, height: Int, bitDepth: Int, colorType: Int)
  case class WavFormat(channels: Int, sampleRateHz: Int, bitsPerSample: Int)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Parse the IHDR chunk (spec: first chunk after the 8-byte
    * signature; 13-byte payload). None if not a well-formed PNG head. */
  def parsePng(payload: Array[Byte]): Option[PngHeader] =
    if (sniff(payload) != "png" || payload.length < 8 + 8 + 13) None
    else {
      val len = be32(payload, 8)
      val tag = new String(payload.slice(12, 16), "US-ASCII")
      if (tag != "IHDR" || len != 13) None
      else Some(PngHeader(
        width = be32(payload, 16), height = be32(payload, 20),
        bitDepth = payload(24) & 0xff, colorType = payload(25) & 0xff))
    }

  /** Walk RIFF chunks to the "fmt " chunk (not assumed first — real
    * writers emit LIST/INFO chunks before it). None if absent.
    *
    * Payload bytes are untrusted: the RIFF chunk size field is read as
    * UNSIGNED 32-bit into a Long cursor, so a crafted size (e.g.
    * 0xFFFFFFF8, which a signed read would treat as -8 and advance the
    * offset by zero — an infinite loop pinning an executor task) walks
    * harmlessly off the end instead. A strictly-advancing check guards
    * any residual arithmetic surprise. */
  def parseWav(payload: Array[Byte]): Option[WavFormat] = {
    if (sniff(payload) != "wav") return None
    var off: Long = 12L
    while (off + 8 <= payload.length) {
      val o = off.toInt
      val tag = new String(payload.slice(o, o + 4), "US-ASCII")
      val size = le32(payload, o + 4) & 0xFFFFFFFFL
      if (tag == "fmt " && o + 8 + 16 <= payload.length && size >= 16)
        return Some(WavFormat(
          channels = le16(payload, o + 10),
          sampleRateHz = le32(payload, o + 12),
          bitsPerSample = le16(payload, o + 22)))
      val next = off + 8 + size + (size & 1) // chunks are word-aligned
      if (next <= off) return None
      off = next
    }
    None
  }

  // ---- builders (valid minimal files, used by fixtures and specs) ----

  private def u32be(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def u32le(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def u16le(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private def pngChunk(tag: String, body: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val tagB = tag.getBytes("US-ASCII")
    crc.update(tagB); crc.update(body)
    u32be(body.length) ++ tagB ++ body ++ u32be(crc.getValue.toInt)
  }

  /** Minimal spec-valid PNG: signature + IHDR (real CRC) + IEND. */
  def makePng(width: Int, height: Int, bitDepth: Int = 8,
              colorType: Int = 6): Array[Byte] = {
    val ihdr = u32be(width) ++ u32be(height) ++
      Array(bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
    pngMagic ++ pngChunk("IHDR", ihdr) ++ pngChunk("IEND", Array.empty[Byte])
  }

  /** Minimal PCM WAV: RIFF/WAVE + fmt (16-byte PCM) + empty data. */
  def makeWav(channels: Int, sampleRateHz: Int,
              bitsPerSample: Int = 16): Array[Byte] = {
    val byteRate = sampleRateHz * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val fmt = u16le(1) ++ u16le(channels) ++ u32le(sampleRateHz) ++
      u32le(byteRate) ++ u16le(blockAlign) ++ u16le(bitsPerSample)
    val chunks = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++ fmt ++
      "data".getBytes("US-ASCII") ++ u32le(0)
    "RIFF".getBytes("US-ASCII") ++ u32le(4 + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }
}
