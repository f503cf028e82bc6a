package graft.llm

/** Dependency-free GIF codec (GIF87a/89a) — the DICTIONARY-coded third
  * member of the compressed-format family: [[JpegCodec]] proved the
  * executor-decode pattern for a lossy transform code (DCT + Huffman),
  * [[FlacCodec]] for a lossless predictive code (fixed predictors +
  * Rice), and GIF proves it for the third classical entropy-coding
  * family — LZW string-table compression with variable-width codes,
  * in-band CLEAR/EOI control codes, dictionary growth to 4096 with
  * mid-stream resets, and LSB-FIRST bit packing (the opposite bit
  * order of both other codecs' readers, which is exactly the kind of
  * sharp edge a binary-ingest pipeline must get right). GIF is
  * lossless over palette indices, so round-trip equality is exact by
  * spec and the DuckDB oracle can recompute pixel statistics from the
  * generative formula while the Spark side decodes real LZW-coded
  * bytes.
  *
  * Encoder (fixture writer, but REAL spec-compliant GIF87a): logical
  * screen + 256-entry grayscale global color table + one image with
  * genuine LZW compression — dictionary of (prefix, byte) strings,
  * code width growing 9→12 bits, CLEAR emitted up front and again
  * whenever the table fills (the spec's reset protocol), data carved
  * into ≤255-byte sub-blocks.
  *
  * Decoder (general within a documented subset): 87a and 89a
  * signatures, any logical-screen/global-table geometry, 89a
  * extension blocks skipped by their own sub-block framing, local
  * color tables, and full LZW including the KwKwK first-use case and
  * post-reset width handling. Refused rather than mis-decoded:
  * interlaced images and multi-image animations. Untrusted-input
  * discipline as everywhere: dimension caps, every read bounds-
  * checked, out-of-range codes rejected, pixel overrun rejected —
  * truncation at any byte offset yields None, never garbage.
  *
  * Reference behavior studied from the public GIF87a/89a
  * specifications only; fixture synthesis follows the repo-wide
  * derive-everything-from-the-row-key discipline.
  */
object GifCodec {

  private val maxDim = 4096
  private val maxPixels = 1 << 22

  final case class GifImage(width: Int, height: Int,
                            palette: Array[Int], pixels: Array[Int])

  // ------------------------------------------------- LSB-first bit io

  /** GIF packs LZW codes little-endian bit-first: the first code
    * occupies the LOW bits of the first byte. */
  private final class LsbBitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def writeCode(v: Int, width: Int): Unit = {
      acc |= v << nBits
      nBits += width
      while (nBits >= 8) {
        buf.write(acc & 0xff); acc >>>= 8; nBits -= 8
      }
    }
    def bytes: Array[Byte] = {
      if (nBits > 0) { buf.write(acc & 0xff); acc = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  private final class LsbBitReader(data: Array[Byte]) {
    private var pos = 0L
    private val end = data.length * 8L
    def readCode(width: Int): Option[Int] = {
      if (pos + width > end) return None
      var v = 0
      var i = 0
      while (i < width) {
        val bit = (data(((pos + i) / 8).toInt) >>> ((pos + i) % 8).toInt) & 1
        v |= bit << i
        i += 1
      }
      pos += width
      Some(v)
    }
  }

  // ---------------------------------------------------------- encoder

  /** Real LZW-compressed single-image GIF87a with an identity
    * grayscale palette (index i → gray i), so decoded indices ARE the
    * pixel values the oracle recomputes. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height)
    require(pixels.forall(p => p >= 0 && p < 256))
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    out.write("GIF87a".getBytes("US-ASCII"))
    // logical screen descriptor: global table, 8 bits/channel, 256 entries
    w16(width); w16(height); w8(0xf7); w8(0); w8(0)
    var i = 0
    while (i < 256) { w8(i); w8(i); w8(i); i += 1 } // grayscale GCT
    // image descriptor (no local table, not interlaced)
    w8(0x2c); w16(0); w16(0); w16(width); w16(height); w8(0)
    // LZW-compressed data, minimum code size 8
    val minCode = 8
    w8(minCode)
    val clear = 1 << minCode        // 256
    val eoi = clear + 1             // 257
    val bw = new LsbBitWriter
    var dict = new java.util.HashMap[Long, Int]()
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    bw.writeCode(clear, codeSize)
    var prefix = -1
    i = 0
    while (i < pixels.length) {
      val k = pixels(i)
      if (prefix < 0) prefix = k
      else {
        val key = (prefix.toLong << 8) | k
        if (dict.containsKey(key)) prefix = dict.get(key)
        else {
          bw.writeCode(prefix, codeSize)
          dict.put(key, nextCode)
          nextCode += 1
          // widen ONE ADD LATER than the decoder checks: the decoder
          // trails the encoder by exactly one table entry (it adds
          // entry i only after reading code i+1), so encoder nextCode
          // == 2^cs + 1 is the decoder's nextCode == 2^cs moment
          if (nextCode - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
          if (nextCode == 4096) {
            // table full: reset per spec
            bw.writeCode(clear, codeSize)
            dict = new java.util.HashMap[Long, Int]()
            nextCode = eoi + 1
            codeSize = minCode + 1
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) bw.writeCode(prefix, codeSize)
    bw.writeCode(eoi, codeSize)
    val payload = bw.bytes
    var off = 0
    while (off < payload.length) {
      val n = math.min(255, payload.length - off)
      w8(n)
      out.write(payload, off, n)
      off += n
    }
    w8(0)    // block terminator
    w8(0x3b) // trailer
    out.toByteArray
  }

  // ---------------------------------------------------------- decoder

  private final class ByteCursor(data: Array[Byte]) {
    var pos = 0
    def u8: Option[Int] =
      if (pos < data.length) { val v = data(pos) & 0xff; pos += 1; Some(v) }
      else None
    def u16: Option[Int] = for (a <- u8; b <- u8) yield a | (b << 8)
    def take(n: Int): Option[Array[Byte]] =
      if (pos + n <= data.length) {
        val a = java.util.Arrays.copyOfRange(data, pos, pos + n)
        pos += n; Some(a)
      } else None
  }

  /** Skip a sub-block chain (extension payloads). */
  private def skipSubBlocks(c: ByteCursor): Option[Unit] = {
    var done = false
    while (!done) c.u8 match {
      case None => return None
      case Some(0) => done = true
      case Some(n) => if (c.take(n).isEmpty) return None
    }
    Some(())
  }

  /** Collect a sub-block chain into one contiguous payload. */
  private def readSubBlocks(c: ByteCursor): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) c.u8 match {
      case None => return None
      case Some(0) => done = true
      case Some(n) => c.take(n) match {
        case None => return None
        case Some(a) => out.write(a, 0, n)
      }
    }
    Some(out.toByteArray)
  }

  def decode(bytes: Array[Byte]): Option[GifImage] = {
    val c = new ByteCursor(bytes)
    for {
      sig <- c.take(6)
      s = new String(sig, "US-ASCII")
      if s == "GIF87a" || s == "GIF89a"
      _ <- c.u16 // logical screen width (image descriptor wins)
      _ <- c.u16
      packed <- c.u8
      _ <- c.u8 // background color index
      _ <- c.u8 // aspect
      gct <- if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        c.take(3 * n).map { raw =>
          Array.tabulate(n)(j => ((raw(3 * j) & 0xff) << 16) |
            ((raw(3 * j + 1) & 0xff) << 8) | (raw(3 * j + 2) & 0xff))
        }
      } else Some(Array.empty[Int])
      img <- decodeBlocks(c, gct)
    } yield img
  }

  @annotation.tailrec
  private def decodeBlocks(c: ByteCursor, gct: Array[Int]): Option[GifImage] =
    c.u8 match {
      case Some(0x21) => // 89a extension: label + sub-blocks, skipped
        (for (_ <- c.u8; _ <- skipSubBlocks(c)) yield ()) match {
          case Some(_) => decodeBlocks(c, gct)
          case None => None
        }
      case Some(0x2c) =>
        // single-image subset: the image must be followed by the 0x3b
        // trailer, so truncation after the pixel data still surfaces
        // as None (the every-byte-truncation contract)
        decodeImage(c, gct).filter(_ => c.u8.contains(0x3b))
      case _ => None // trailer before any image, truncation, or junk
    }

  private def decodeImage(c: ByteCursor, gct: Array[Int]): Option[GifImage] =
    for {
      _ <- c.u16 // left
      _ <- c.u16 // top
      w <- c.u16
      h <- c.u16
      if w > 0 && h > 0 && w <= maxDim && h <= maxDim && w * h <= maxPixels
      packed <- c.u8
      if (packed & 0x40) == 0 // interlaced: refused, not mis-decoded
      palette <- if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        c.take(3 * n).map { raw =>
          Array.tabulate(n)(j => ((raw(3 * j) & 0xff) << 16) |
            ((raw(3 * j + 1) & 0xff) << 8) | (raw(3 * j + 2) & 0xff))
        }
      } else if (gct.nonEmpty) Some(gct) else None
      minCode <- c.u8
      if minCode >= 2 && minCode <= 8
      payload <- readSubBlocks(c)
      pixels <- lzwDecode(payload, minCode, w * h, palette.length)
    } yield GifImage(w, h, palette, pixels)

  /** Variable-width LZW with CLEAR/EOI, KwKwK, and width growth to 12
    * bits. The string table stores (prefixCode, firstByte, lastByte,
    * length) so strings expand without per-entry arrays. */
  private def lzwDecode(payload: Array[Byte], minCode: Int,
                        nPixels: Int, nColors: Int): Option[Array[Int]] = {
    val br = new LsbBitReader(payload)
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefixT = new Array[Int](4096)
    val lastT = new Array[Int](4096)
    val firstT = new Array[Int](4096)
    var nextCode = eoi + 1
    var codeSize = minCode + 1
    val out = new Array[Int](nPixels)
    var nOut = 0
    var prev = -1
    // expand a code into `out` backwards via the prefix chain
    def emit(code: Int): Boolean = {
      var len = 0
      var cc = code
      while (cc >= clear) { len += 1; cc = prefixT(cc) }
      len += 1
      if (nOut + len > nPixels) return false
      var idx = nOut + len - 1
      cc = code
      while (cc >= clear) { out(idx) = lastT(cc); idx -= 1; cc = prefixT(cc) }
      if (cc >= nColors) return false
      out(idx) = cc
      nOut += len
      true
    }
    def firstOf(code: Int): Int = {
      var cc = code
      while (cc >= clear) cc = firstT(cc)
      cc
    }
    var done = false
    while (!done) {
      br.readCode(codeSize) match {
        case None => return None
        case Some(code) if code == clear =>
          nextCode = eoi + 1
          codeSize = minCode + 1
          prev = -1
        case Some(code) if code == eoi =>
          done = true
        case Some(code) =>
          if (code > nextCode || (code == nextCode && prev < 0)) return None
          if (code == nextCode) {
            // KwKwK: string = prev-string + first(prev-string)
            if (nextCode >= 4096) return None
            prefixT(nextCode) = prev
            firstT(nextCode) = firstOf(prev)
            lastT(nextCode) = firstOf(prev)
            nextCode += 1
            if (!emit(code)) return None
          } else {
            if (code < clear && code >= nColors) return None
            if (!emit(code)) return None
            if (prev >= 0 && nextCode < 4096) {
              prefixT(nextCode) = prev
              firstT(nextCode) = firstOf(prev)
              lastT(nextCode) = firstOf(code)
              nextCode += 1
            }
          }
          prev = code
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    if (nOut != nPixels) None else Some(out)
  }
}
