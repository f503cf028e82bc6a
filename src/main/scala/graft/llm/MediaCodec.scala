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

  // ---- pixel tier: real PNG decode (inflate + filter reversal) ----

  /** Decoded raster: `bytes.length == width * height * channels`,
    * scanlines concatenated top-to-bottom, filter bytes removed and
    * filters reversed. */
  case class PixelImage(width: Int, height: Int, channels: Int,
                        bytes: Array[Byte])

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1) // grayscale
    case 2 => Some(3) // truecolor
    case 6 => Some(4) // truecolor + alpha
    case _ => None    // palette / gray+alpha not needed by this corpus
  }

  /** Full pixel decode for non-interlaced 8-bit PNGs, dependency-free:
    * IDAT is raw zlib, which `java.util.zip.Inflater` (in the JDK)
    * inflates; the five scanline filters (None/Sub/Up/Average/Paeth,
    * PNG spec §9) are reversed in place. Multiple IDAT chunks are
    * concatenated per spec. Untrusted-input rules as [[parseWav]]:
    * chunk lengths read unsigned into a Long cursor with a
    * strictly-advancing guard, inflated size capped by the expected
    * raster size, and any structural surprise (interlace, palette,
    * 16-bit, truncated or over-long IDAT, bad filter tag) returns None
    * rather than throwing — a corrupt blob must not kill a 100 TB
    * scan. */
  def decodePngPixels(payload: Array[Byte]): Option[PixelImage] = {
    val header = parsePng(payload).getOrElse(return None)
    if (header.bitDepth != 8) return None
    val ch = channelsOf(header.colorType).getOrElse(return None)
    if (payload.length < 8 + 8 + 13 + 4 || (payload(28) & 0xff) != 0)
      return None // interlaced (Adam7) out of scope
    val w = header.width; val h = header.height
    if (w <= 0 || h <= 0 || w.toLong * h * ch > 64L * 1024 * 1024) return None

    // walk chunks, concatenating IDAT payloads
    val idat = new java.io.ByteArrayOutputStream()
    var off: Long = 8L
    var sawEnd = false
    while (!sawEnd && off + 8 <= payload.length) {
      val o = off.toInt
      val size = be32(payload, o) & 0xFFFFFFFFL
      val tag = new String(payload.slice(o + 4, o + 8), "US-ASCII")
      if (tag == "IEND") sawEnd = true
      else if (tag == "IDAT") {
        if (o + 8 + size > payload.length) return None
        idat.write(payload, o + 8, size.toInt)
      }
      val next = off + 8 + size + 4 // length + tag + data + crc
      if (next <= off) return None
      off = next
    }
    if (idat.size() == 0) return None

    // inflate to exactly h * (1 filter byte + w*ch) bytes
    val rowBytes = w * ch
    val expected = h * (1 + rowBytes)
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < expected && !inf.finished()) {
        val n = inf.inflate(raw, got, expected - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got != expected) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // reverse scanline filters (bpp = ch for 8-bit samples)
    val out = new Array[Byte](h * rowBytes)
    var y = 0
    while (y < h) {
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
      val filter = raw(src - 1) & 0xff
      if (filter > 4) return None
      var x = 0
      while (x < rowBytes) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= ch) out(dst + x - ch) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= ch) out(dst - rowBytes + x - ch) & 0xff else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        out(dst + x) = ((cur + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, ch, out))
  }

  /** Paeth predictor (PNG spec §9.4): the neighbor closest to
    * left + up - upLeft, ties broken left, up, upLeft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---- sample tier: real PCM16 WAV decode ----

  /** Decoded PCM: interleaved 16-bit samples (frame-major, channel
    * within frame), little-endian per the RIFF spec. */
  case class WavSamples(channels: Int, sampleRateHz: Int,
                        samples: Array[Short])

  /** Full sample decode for 16-bit PCM WAVs: after [[parseWav]]
    * validates the fmt chunk, walk to the `data` chunk (same
    * untrusted-size discipline — unsigned Long cursor, strictly
    * advancing) and read its payload as little-endian int16. A data
    * chunk that overruns the file, or a non-16-bit format, returns
    * None rather than throwing. */
  def decodeWavSamples(payload: Array[Byte]): Option[WavSamples] = {
    val fmt = parseWav(payload).getOrElse(return None)
    if (fmt.bitsPerSample != 16) return None
    var off: Long = 12L
    while (off + 8 <= payload.length) {
      val o = off.toInt
      val tag = new String(payload.slice(o, o + 4), "US-ASCII")
      val size = le32(payload, o + 4) & 0xFFFFFFFFL
      if (tag == "data") {
        if (o + 8 + size > payload.length) return None
        val n = (size / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((payload(o + 8 + 2 * i) & 0xff)
            | (payload(o + 9 + 2 * i) << 8)).toShort
          i += 1
        }
        return Some(WavSamples(fmt.channels, fmt.sampleRateHz, out))
      }
      val next = off + 8 + size + (size & 1)
      if (next <= off) return None
      off = next
    }
    None
  }

  // ---- video tier: YUV4MPEG2 (y4m) container ----

  /** Parsed y4m stream header + frame count (frames are validated to
    * be complete during the walk). */
  case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                      frames: Int)

  /** Per-plane sample statistics of a decoded y4m stream (plane 0 = Y,
    * 1 = U, 2 = V). */
  case class Y4mPlaneStats(plane: Int, nSamples: Long, sum: Long,
                           min: Int, max: Int)

  /** Parse + fully decode a YUV4MPEG2 stream: tokenized stream header
    * (`YUV4MPEG2 W.. H.. F..:..` plus ignorable tokens), then a frame
    * walk where every `FRAME` line must be followed by a COMPLETE
    * 4:2:0 payload (w·h luma + 2·(w/2)·(h/2) chroma bytes) — a
    * truncated frame, trailing garbage, odd dimensions, a non-420
    * colorspace tag, or a malformed header all return None rather
    * than throwing on untrusted bytes (same discipline as the PNG/WAV
    * walkers). Returns the header plus per-plane sample stats
    * accumulated across frames. */
  def decodeY4m(payload: Array[Byte]): Option[(Y4mVideo, Array[Y4mPlaneStats])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < payload.length && payload(i) != '\n'.toByte) i += 1
      if (i >= payload.length) -1 else i
    }
    val nl = lineEnd(0)
    if (nl < 0) return None
    val toks = new String(payload, 0, nl, "US-ASCII").split(" ")
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "420"
    toks.drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("F")) t.drop(1).split(":") match {
        case Array(a, b) =>
          fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
        case _ => fn = -1
      }
      else if (t.startsWith("C")) cs = t.drop(1)
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    if (w % 2 != 0 || h % 2 != 0) return None
    if (cs != "420" && !cs.startsWith("420")) return None
    // Sizes in Long: header-supplied dims (e.g. W65536 H65536) would
    // overflow Int to a non-positive frameSize, sail past the truncated
    // -frame check, and index payload at a negative offset. A frame
    // larger than the payload can never fit, so reject it up front and
    // only then narrow to Int (safe: bounded by payload.length).
    val ySizeL = w.toLong * h
    val cSizeL = (w.toLong / 2) * (h / 2)
    val frameSizeL = ySizeL + 2 * cSizeL
    if (frameSizeL <= 0 || frameSizeL > payload.length) return None
    val ySize = ySizeL.toInt
    val cSize = cSizeL.toInt
    val frameSize = frameSizeL.toInt
    val sums = new Array[Long](3)
    val mins = Array(255, 255, 255)
    val maxs = Array(0, 0, 0)
    var frames = 0
    var off = nl + 1
    while (off < payload.length) {
      val fnl = lineEnd(off)
      if (fnl < 0) return None
      if (!new String(payload, off, fnl - off, "US-ASCII").startsWith("FRAME"))
        return None
      val start = fnl + 1
      if (start.toLong + frameSize > payload.length) return None // truncated frame
      var j = 0
      while (j < frameSize) {
        val plane = if (j < ySize) 0 else if (j < ySize + cSize) 1 else 2
        val v = payload(start + j) & 0xff
        sums(plane) += v
        if (v < mins(plane)) mins(plane) = v
        if (v > maxs(plane)) maxs(plane) = v
        j += 1
      }
      frames += 1
      off = start + frameSize
    }
    if (frames == 0) return None
    val counts = Array(ySize.toLong, cSize.toLong, cSize.toLong)
    Some((Y4mVideo(w, h, fn, fd, frames),
      Array.tabulate(3)(p =>
        Y4mPlaneStats(p, counts(p) * frames, sums(p), mins(p), maxs(p)))))
  }

  /** Raw-frame variant of [[decodeY4m]]: the same header/FRAME walk,
    * but returning each frame's full 4:2:0 buffer — the consumer
    * shape temporal features (frame deltas, motion energy, scene
    * cuts) need, which the aggregate decoder can't serve. */
  def decodeY4mFrames(payload: Array[Byte]): Option[(Y4mVideo, Array[Array[Byte]])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < payload.length && payload(i) != '\n'.toByte) i += 1
      if (i >= payload.length) -1 else i
    }
    val nl = lineEnd(0)
    if (nl < 0) return None
    val toks = new String(payload, 0, nl, "US-ASCII").split(" ")
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "420"
    toks.drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("F")) t.drop(1).split(":") match {
        case Array(a, b) =>
          fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
        case _ => fn = -1
      }
      else if (t.startsWith("C")) cs = t.drop(1)
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    if (w % 2 != 0 || h % 2 != 0) return None
    if (cs != "420" && !cs.startsWith("420")) return None
    val frameSizeL = w.toLong * h + 2 * ((w.toLong / 2) * (h / 2))
    if (frameSizeL > payload.length) return None
    val frameSize = frameSizeL.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = nl + 1
    while (off < payload.length) {
      val fnl = lineEnd(off)
      if (fnl < 0) return None
      if (!new String(payload, off, fnl - off, "US-ASCII").startsWith("FRAME"))
        return None
      val start = fnl + 1
      if (start.toLong + frameSize > payload.length) return None
      out += java.util.Arrays.copyOfRange(payload, start, start + frameSize)
      off = start + frameSize
    }
    if (out.isEmpty) return None
    Some((Y4mVideo(w, h, fn, fd, out.length), out.toArray))
  }

  // ---- builders (valid minimal files, used by fixtures and specs) ----

  /** Spec-valid YUV4MPEG2 stream at 25 fps, 4:2:0, with deterministic
    * sample bytes: byte j of frame f is (seed + f·17 + j·5) % 256 over
    * the flattened Y+U+V frame buffer — reproducible by a SQL oracle
    * from the seed alone. */
  def makeY4m(width: Int, height: Int, frames: Int, seed: Int): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n"
      .getBytes("US-ASCII"))
    val frameSize = width * height * 3 / 2
    var f = 0
    while (f < frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      var j = 0
      while (j < frameSize) {
        out.write((seed + f * 17 + j * 5) % 256)
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }

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

  /** Spec-valid 8-bit RGBA PNG carrying the given raster
    * (`pixels.length == width * height * 4`): each scanline is
    * FILTERED with `filterFor(y)` (exercising Sub/Up/Average/Paeth on
    * the decode side, not just None) and the stream deflated with the
    * JDK Deflater into a real IDAT chunk. The compressed bytes vary
    * with zlib level/version, but [[decodePngPixels]] must return the
    * raster bit-for-bit — which is what the oracle checks. */
  def makePngWithPixels(width: Int, height: Int, pixels: Array[Byte],
                        filterFor: Int => Int = _ % 5): Array[Byte] = {
    require(pixels.length == width * height * 4, "raster size mismatch")
    val ch = 4
    val rowBytes = width * ch
    val filtered = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val filter = filterFor(y) % 5
      filtered(y * (1 + rowBytes)) = filter.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = pixels(y * rowBytes + x) & 0xff
        val left = if (x >= ch) pixels(y * rowBytes + x - ch) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= ch) pixels((y - 1) * rowBytes + x - ch) & 0xff else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, upLeft)
        }
        filtered(y * (1 + rowBytes) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    val idat = try {
      deflater.setInput(filtered)
      deflater.finish()
      val buf = new Array[Byte](8192)
      val bos = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        bos.write(buf, 0, n)
      }
      bos.toByteArray
    } finally deflater.end()
    val ihdr = u32be(width) ++ u32be(height) ++
      Array(8.toByte, 6.toByte, 0.toByte, 0.toByte, 0.toByte)
    pngMagic ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat) ++
      pngChunk("IEND", Array.empty[Byte])
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

  /** Spec-valid PCM16 WAV carrying the given interleaved samples in a
    * real little-endian `data` chunk. */
  def makeWavWithSamples(channels: Int, sampleRateHz: Int,
                         samples: Array[Short]): Array[Byte] = {
    val bitsPerSample = 16
    val byteRate = sampleRateHz * channels * (bitsPerSample / 8)
    val blockAlign = channels * (bitsPerSample / 8)
    val fmt = u16le(1) ++ u16le(channels) ++ u32le(sampleRateHz) ++
      u32le(byteRate) ++ u16le(blockAlign) ++ u16le(bitsPerSample)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = samples(i).toByte
      data(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val chunks = "fmt ".getBytes("US-ASCII") ++ u32le(16) ++ fmt ++
      "data".getBytes("US-ASCII") ++ u32le(data.length) ++ data
    "RIFF".getBytes("US-ASCII") ++ u32le(4 + chunks.length) ++
      "WAVE".getBytes("US-ASCII") ++ chunks
  }
}
