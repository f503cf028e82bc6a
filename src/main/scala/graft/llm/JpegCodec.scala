package graft.llm

/** Dependency-free baseline JPEG (ITU-T T.81) decoder plus a restricted
  * generative encoder for fixtures.
  *
  * This is the first PERCEPTUALLY-CODED format in the multimodal tier
  * (PNG/WAV/Y4M are lossless containers): the decoder walks real
  * markers (SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI), builds canonical
  * Huffman tables from the DHT segments, entropy-decodes the scan with
  * 0xFF00 byte unstuffing and RSTn restart handling, applies DC
  * prediction, dequantization, zig-zag reordering, a separable
  * floating-point IDCT, level shift and clamping, and crops MCU
  * padding — the full baseline pipeline for any number of components
  * at 1x1 sampling (no chroma subsampling; subsampled files return
  * None rather than decode wrongly).
  *
  * The fixture encoder is deliberately restricted: grayscale images
  * whose 8x8 blocks are each CONSTANT, DC quantizer = 4 (divides 8),
  * AC coefficients all zero. For that class the lossy pipeline is
  * bit-exact — FDCT of a constant block is DC-only, 8·(c−128) is
  * divisible by the quantizer, and IDCT of a DC-only block is the
  * constant back — so a DuckDB oracle can recompute decoded-pixel
  * statistics arithmetically while the Spark side runs the REAL
  * decoder on real entropy-coded bytes (including byte stuffing and
  * DC-difference Huffman paths). General-coefficient decoding is
  * exercised against a directly-computed reference IDCT in
  * `JpegCodecSpec`.
  *
  * Untrusted-input hardening (executor safety): declared dimensions
  * are capped (a crafted SOF claiming 2^16×2^16 pixels must not make
  * an executor allocate 4 GB), every table/component index is
  * range-checked, and truncation anywhere returns None instead of
  * throwing or looping.
  */
object JpegCodec {

  /** Decoded planes are stored component-interleaved like
    * [[MediaCodec.PixelImage]]: bytes(i·comps + c). */
  final case class JpegImage(width: Int, height: Int, components: Int,
      bytes: Array[Byte])

  /** Executor-safety cap on declared pixel count (untrusted SOF). */
  private val MaxPixels = 1 << 26

  def sniff(payload: Array[Byte]): Boolean =
    payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff

  // Zig-zag index -> natural (row-major) index.
  private[graft] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Standard Annex K.3.1 luminance DC table.
  private[graft] val StdDcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[graft] val StdDcVals: Array[Int] = (0 to 11).toArray

  // Standard Annex K.3.2 luminance AC table.
  private[graft] val StdAcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private[graft] val StdAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman decode table: (code, length) -> value. Kept as
    * per-length first-code/first-index arrays — the textbook O(length)
    * sequential decode, robust to any DHT content. */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // mincode(l), maxcode(l) (exclusive), valptr(l) for l in 1..16.
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        valPtr(l) = k; minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code // exclusive upper bound at this length
        code <<= 1
        l += 1
      }
    }
    def value(code: Int, len: Int): Option[Int] = {
      if (len < 1 || len > 16) return None
      if (code < minCode(len) || code >= maxCode(len)) None
      else {
        val idx = valPtr(len) + (code - minCode(len))
        if (idx >= vals.length) None else Some(vals(idx))
      }
    }
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * unstuffing; stops (EOF) at any non-stuffing marker. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var hitMarker: Int = -1 // the marker byte that ended the stream, if any

    private def fill(): Boolean = {
      if (pos >= b.length) return false
      val v = b(pos) & 0xff
      if (v == 0xff) {
        if (pos + 1 >= b.length) return false
        val m = b(pos + 1) & 0xff
        if (m == 0x00) { pos += 2; cur = (cur << 8) | 0xff; nbits += 8; true }
        else { hitMarker = m; false } // a real marker: stop before it
      } else { pos += 1; cur = (cur << 8) | v; nbits += 8; true }
    }

    def bit(): Int = {
      if (nbits == 0 && !fill()) return -1
      nbits -= 1
      (cur >>> nbits) & 1
    }

    def bitsValue(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { val x = bit(); if (x < 0) return Int.MinValue; v = (v << 1) | x; i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      nbits = 0; cur = 0
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff) {
        val m = b(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }

    def decodeHuff(h: Huff): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        val x = bit(); if (x < 0) return Int.MinValue
        code = (code << 1) | x; len += 1
        h.value(code, len) match {
          case Some(v) => return v
          case None => // keep extending
        }
      }
      Int.MinValue
    }
  }

  /** EXTEND (T.81 F.2.2.1): map `v` in `n` bits to its signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  private final case class Component(id: Int, hSamp: Int, vSamp: Int, tq: Int)

  /** Decode a baseline JPEG. None on anything malformed, truncated,
    * progressive, subsampled, or over the pixel cap. */
  def decode(payload: Array[Byte]): Option[JpegImage] = {
    if (!sniff(payload)) return None
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var p = 2

    def u16(i: Int): Int = ((payload(i) & 0xff) << 8) | (payload(i + 1) & 0xff)

    while (p + 4 <= payload.length) {
      if ((payload(p) & 0xff) != 0xff) return None
      val marker = payload(p + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan
      val segLen = u16(p + 2)
      if (segLen < 2 || p + 2 + segLen > payload.length) return None
      val body = p + 4
      val bodyLen = segLen - 2
      marker match {
        case 0xdb => // DQT: one or more tables
          var q = body
          while (q < body + bodyLen) {
            val pq = (payload(q) & 0xff) >> 4
            val tq = payload(q) & 0x0f
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            if (q + 1 + 64 > body + bodyLen) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = payload(q + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            q += 65
          }
        case 0xc0 => // SOF0 (baseline). Any other SOFn: unsupported.
          if (bodyLen < 6) return None
          if ((payload(body) & 0xff) != 8) return None
          height = u16(body + 1); width = u16(body + 3)
          val nf = payload(body + 5) & 0xff
          if (width <= 0 || height <= 0 || nf < 1 || nf > 4) return None
          if (width.toLong * height * nf > MaxPixels) return None
          if (bodyLen < 6 + 3 * nf) return None
          comps = (0 until nf).map { c =>
            val o = body + 6 + 3 * c
            Component(payload(o) & 0xff, (payload(o + 1) & 0xff) >> 4,
              payload(o + 1) & 0x0f, payload(o + 2) & 0x0f)
          }.toArray
          if (comps.exists(c => c.hSamp != 1 || c.vSamp != 1 || c.tq > 3))
            return None // no subsampling support — refuse, never mis-decode
        case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          return None // progressive/arithmetic/hierarchical
        case 0xc4 => // DHT: one or more tables
          var q = body
          while (q < body + bodyLen) {
            val tc = (payload(q) & 0xff) >> 4
            val th = payload(q) & 0x0f
            if (tc > 1 || th > 3) return None
            if (q + 17 > body + bodyLen) return None
            val bits = (1 to 16).map(i => payload(q + i) & 0xff).toArray
            val n = bits.sum
            if (q + 17 + n > body + bodyLen) return None
            val vals = (0 until n).map(i => payload(q + 17 + i) & 0xff).toArray
            val h = new Huff(bits, vals)
            if (tc == 0) dcTabs(th) = h else acTabs(th) = h
            q += 17 + n
          }
        case 0xdd => // DRI
          if (bodyLen < 2) return None
          restartInterval = u16(body)
        case 0xda => // SOS — decode the scan and finish
          if (comps == null) return None
          if (bodyLen < 1) return None
          val ns = payload(body) & 0xff
          if (ns != comps.length || bodyLen < 1 + 2 * ns + 3) return None
          val tabOf = new Array[(Int, Int)](ns)
          var i = 0
          while (i < ns) {
            val cid = payload(body + 1 + 2 * i) & 0xff
            val td = (payload(body + 2 + 2 * i) & 0xff) >> 4
            val ta = payload(body + 2 + 2 * i) & 0x0f
            val ci = comps.indexWhere(_.id == cid)
            if (ci < 0 || td > 3 || ta > 3) return None
            if (ci != i) return None // interleaved order must match SOF
            tabOf(i) = (td, ta)
            i += 1
          }
          return decodeScan(payload, p + 2 + segLen, width, height, comps,
            tabOf, quant, dcTabs, acTabs, restartInterval)
        case _ => // APPn / COM / others: skip
      }
      p += 2 + segLen
    }
    None
  }

  private def decodeScan(payload: Array[Byte], start: Int, width: Int,
      height: Int, comps: Array[Component], tabOf: Array[(Int, Int)],
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int): Option[JpegImage] = {
    val nc = comps.length
    val mcuW = (width + 7) / 8
    val mcuH = (height + 7) / 8
    val out = new Array[Byte](width * height * nc)
    val dcPred = new Array[Int](nc)
    val br = new BitReader(payload, start)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)

    var mcu = 0
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart()) return None
          java.util.Arrays.fill(dcPred, 0)
        }
        var c = 0
        while (c < nc) {
          val (td, ta) = tabOf(c)
          val dcT = dcTabs(td); val acT = acTabs(ta)
          val qt = quant(comps(c).tq)
          if (dcT == null || acT == null || qt == null) return None
          java.util.Arrays.fill(coef, 0)
          // DC
          val s = br.decodeHuff(dcT)
          if (s == Int.MinValue || s > 15) return None
          val diffBits = br.bitsValue(s)
          if (diffBits == Int.MinValue) return None
          dcPred(c) += extend(diffBits, s)
          coef(0) = dcPred(c) * qt(0)
          // AC
          var k = 1
          while (k < 64) {
            val rs = br.decodeHuff(acT)
            if (rs == Int.MinValue) return None
            val r = rs >> 4; val sz = rs & 0x0f
            if (sz == 0) {
              if (r == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += r
              if (k > 63) return None
              val vb = br.bitsValue(sz)
              if (vb == Int.MinValue) return None
              coef(Zigzag(k)) = extend(vb, sz) * qt(k)
              k += 1
            }
          }
          idct8x8(coef, tmp)
          // Place with MCU-padding crop.
          var y = 0
          while (y < 8) {
            val py = my * 8 + y
            if (py < height) {
              var x = 0
              while (x < 8) {
                val px = mx * 8 + x
                if (px < width) {
                  val v = math.round(tmp(y * 8 + x)).toInt + 128
                  out((py * width + px) * nc + c) =
                    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                }
                x += 1
              }
            }
            y += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Some(JpegImage(width, height, nc, out))
  }

  /** Separable double-precision IDCT (T.81 A.3.3 definition, applied
    * rows then columns). Clarity over speed: the per-block cost is
    * 2·8·8·8 multiply-adds, parallelized per-partition by Spark. */
  private[graft] def idct8x8(coef: Array[Int], out: Array[Double]): Unit = {
    val c = new Array[Double](8)
    c(0) = 1.0 / math.sqrt(2.0)
    var i = 1; while (i < 8) { c(i) = 1.0; i += 1 }
    val row = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += c(u) * coef(y * 8 + u) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0)
          u += 1
        }
        row(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var x2 = 0
    while (x2 < 8) {
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          s += c(v) * row(v * 8 + x2) *
            math.cos((2 * y2 + 1) * v * math.Pi / 16.0)
          v += 1
        }
        out(y2 * 8 + x2) = s / 2.0
        y2 += 1
      }
      x2 += 1
    }
  }

  // ---- restricted generative encoder (fixture builder) ----

  /** DC quantizer for the fixture class: divides 8, so 8·(c−128)/4 is
    * integral and reconstruction is exact — dequantization is really
    * exercised (a sloppy decoder that ignored DQT would be off 4×). */
  private[graft] val FixtureDcQuant = 4

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1); n += 1
        if (n == 8) {
          buf += cur.toByte
          if ((cur & 0xff) == 0xff) buf += 0x00.toByte // byte stuffing
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (n > 0) { // pad with 1s per T.81 F.1.2.3
        cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1)
        buf += cur.toByte
        if ((cur & 0xff) == 0xff) buf += 0x00.toByte
        cur = 0; n = 0
      }
      buf.toArray
    }
  }

  private def huffCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.toMap
  }

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      (((body.length + 2) >> 8) & 0xff).toByte,
      ((body.length + 2) & 0xff).toByte) ++ body

  private def bitCategory(mag: Int): Int = {
    var cat = 0
    while ((1 << cat) <= mag) cat += 1 // smallest cat with mag < 2^cat
    cat
  }

  /** Shared baseline emitter: headers + entropy-coded scan from
    * already-QUANTIZED coefficient blocks (natural order, raster MCU
    * order) under quant table `qt`. Standard Annex K Huffman tables,
    * real DC prediction, AC run-length/ZRL/EOB coding, byte
    * stuffing. */
  private def encodeBaseline(width: Int, height: Int, qt: Array[Int],
      coefOf: (Int, Int) => Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && qt.length == 64)
    val dqt = seg(0xdb, Array(0x00.toByte) ++ qt.map(_.toByte))
    val sof = seg(0xc0, Array[Byte](8,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      1, 1, 0x11.toByte, 0))
    val dhtDc = seg(0xc4, Array(0x00.toByte) ++
      StdDcBits.map(_.toByte) ++ StdDcVals.map(_.toByte))
    val dhtAc = seg(0xc4, Array(0x10.toByte) ++
      StdAcBits.map(_.toByte) ++ StdAcVals.map(_.toByte))
    val sos = seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))

    val dcCodes = huffCodes(StdDcBits, StdDcVals)
    val acCodes = huffCodes(StdAcBits, StdAcVals)
    val bw = new BitWriter
    var pred = 0
    val mcuW = (width + 7) / 8
    val mcuH = (height + 7) / 8
    var by = 0
    while (by < mcuH) {
      var bx = 0
      while (bx < mcuW) {
        val coef = coefOf(bx, by)
        require(coef.length == 64)
        // DC difference
        val diff = coef(0) - pred
        pred = coef(0)
        val cat = bitCategory(math.abs(diff))
        val (code, len) = dcCodes(cat)
        bw.put(code, len)
        if (cat > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
        // AC run-lengths over zig-zag positions 1..63
        var run = 0
        var k = 1
        while (k < 64) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { // ZRL
              val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16
            }
            val sz = bitCategory(math.abs(v))
            require(sz <= 10, s"AC coefficient too large: $v")
            val (ac, al) = acCodes((run << 4) | sz)
            bw.put(ac, al)
            bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
        bx += 1
      }
      by += 1
    }
    Array(0xff.toByte, 0xd8.toByte) ++ // SOI
      seg(0xe0, "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      dqt ++ sof ++ dhtDc ++ dhtAc ++ sos ++
      bw.finish() ++ Array(0xff.toByte, 0xd9.toByte) // EOI
  }

  /** Encode a grayscale baseline JPEG whose 8x8 block (bx, by) is the
    * constant `blockValue(bx, by)` (0..255). DC quant
    * [[FixtureDcQuant]], AC quant 1. Decoding with ANY conformant
    * baseline decoder returns the constants exactly (see object doc). */
  def encodeGrayConstantBlocks(width: Int, height: Int,
      blockValue: (Int, Int) => Int): Array[Byte] = {
    val qt = new Array[Int](64)
    qt(0) = FixtureDcQuant
    var i = 1; while (i < 64) { qt(i) = 1; i += 1 }
    encodeBaseline(width, height, qt, { (bx, by) =>
      val c = blockValue(bx, by)
      require(c >= 0 && c <= 255, s"block value out of range: $c")
      val coef = new Array[Int](64)
      coef(0) = 8 * (c - 128) / FixtureDcQuant // exact: 2·(c−128)
      coef
    })
  }

  /** Spec builder: arbitrary QUANTIZED coefficient blocks (natural
    * order) at quant 1 — drives the decoder's AC run-length, ZRL and
    * EOB paths with general content (verified against a direct-form
    * IDCT in `JpegCodecSpec`). */
  private[graft] def encodeGrayCoefBlocks(width: Int, height: Int,
      coefOf: (Int, Int) => Array[Int]): Array[Byte] =
    encodeBaseline(width, height, Array.fill(64)(1), coefOf)
}
