package graft.llm

/** Dependency-free FLAC subset codec (RFC 9639) — the compressed-AUDIO
  * twin of [[JpegCodec]]: where JPEG proved the executor-decode
  * pattern survives a perceptual transform code, FLAC proves it for
  * an entropy-coded PREDICTIVE code — bit readers, UTF-8-coded frame
  * numbers, Rice/Golomb residuals, fixed linear predictors, and two
  * CRCs, with none of JPEG's lossy escape hatch: FLAC is lossless, so
  * round-trip equality is exact BY SPEC, and the oracle can recompute
  * per-sample statistics from the generative signal formula while the
  * Spark side decodes real entropy-coded bytes.
  *
  * Encoder (fixture writer, but REAL spec-compliant FLAC):
  * STREAMINFO + fixed-blocking frames; per channel it tries fixed
  * predictor orders 0..2 and keeps the one with the smallest total
  * residual magnitude (the classic libFLAC-style heuristic, made
  * deterministic), then Rice-codes residuals with the exact-cost-
  * minimizing 4-bit parameter in a single partition.
  *
  * Decoder (general within a documented subset): any blocksize/
  * sample-rate/sample-size code, 1..8 independent channels, wasted
  * bits, CONSTANT / VERBATIM / FIXED(0..4) subframes, RICE and RICE2
  * partition methods at any partition order, escaped (raw) partitions.
  * Refused rather than mis-decoded: LPC subframes and the three
  * stereo-decorrelation channel assignments (left/side, right/side,
  * mid/side). Both CRCs are VALIDATED — a flipped bit anywhere in a
  * frame fails the decode — and every read is bounds-checked, so
  * truncation at any byte offset yields None, never garbage samples
  * (the [[JpegCodec]] untrusted-input discipline).
  *
  * Reference behavior studied from the public spec only; the fixture
  * synthesis mirrors slinkytea10/Blinkit-ETL-Pipeline's synthetic-data
  * discipline (scripts/generate_data.py) of deriving every payload
  * deterministically from the row key.
  */
object FlacCodec {

  // ---------------------------------------------------------- bit io

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L)
        nBits += 1
        if (nBits == 8) { buf.write(acc.toInt & 0xff); acc = 0L; nBits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }
    def alignByte(): Unit = if (nBits > 0) writeBits(0L, 8 - nBits)
    def bytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  /** Bounds-checked MSB-first reader: every read is an Option so a
    * truncated payload surfaces as None at the exact failing bit. */
  private final class BitReader(data: Array[Byte], startByte: Int) {
    private var pos = startByte * 8L
    private val end = data.length * 8L
    def bytePos: Int = (pos / 8).toInt
    def aligned: Boolean = pos % 8 == 0
    def readBits(n: Int): Option[Long] = {
      if (pos + n > end) return None
      var v = 0L
      var i = 0
      while (i < n) {
        val b = data((pos / 8).toInt) & 0xff
        v = (v << 1) | ((b >>> (7 - (pos % 8).toInt)) & 1L)
        pos += 1
        i += 1
      }
      Some(v)
    }
    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(maxQ: Int = 1 << 20): Option[Int] = {
      var q = 0
      while (q <= maxQ) {
        readBits(1) match {
          case None => return None
          case Some(1L) => return Some(q)
          case _ => q += 1
        }
      }
      None // unary run absurdly long: corrupt stream, fail loud
    }
    def alignToByte(): Unit = if (pos % 8 != 0) pos = (pos / 8 + 1) * 8
  }

  // ------------------------------------------------------------ crcs

  /** CRC-8, poly 0x07, init 0, MSB-first (frame-header CRC). */
  private[llm] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        j += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0, MSB-first (whole-frame CRC). */
  private[llm] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  // ---------------------------------------------- utf8-coded numbers

  /** FLAC's UTF-8-style variable-length frame number (RFC 9639 §9.1.5
    * — same prefix scheme as UTF-8 but carrying up to 36 bits). */
  private def writeCodedNumber(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.writeBits(n, 8)
    else {
      // count payload bits → bytes needed (6 payload bits per tail byte)
      var bytes = 2
      while (bytes <= 7 && (n >>> (6 * (bytes - 1))) >= (1L << (7 - bytes)))
        bytes += 1
      val lead = ((0xFF << (8 - bytes)) & 0xFF) | (n >>> (6 * (bytes - 1))).toInt
      w.writeBits(lead.toLong, 8)
      var i = bytes - 2
      while (i >= 0) {
        w.writeBits(0x80L | ((n >>> (6 * i)) & 0x3F), 8)
        i -= 1
      }
    }
  }

  private def readCodedNumber(r: BitReader): Option[Long] = {
    val first = r.readBits(8).getOrElse(return None).toInt
    if ((first & 0x80) == 0) return Some(first.toLong)
    var nTail = 0
    var mask = 0x40
    while ((first & mask) != 0 && nTail < 7) { nTail += 1; mask >>= 1 }
    if (nTail < 1 || nTail > 6) return None
    var v = (first & (mask - 1)).toLong
    var i = 0
    while (i < nTail) {
      val b = r.readBits(8).getOrElse(return None).toInt
      if ((b & 0xC0) != 0x80) return None
      v = (v << 6) | (b & 0x3F)
      i += 1
    }
    Some(v)
  }

  // ------------------------------------------------------- encoding

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else ((-r) << 1) - 1

  /** Exact-cost-minimizing 4-bit Rice parameter for one partition. */
  private def bestRiceParam(us: Array[Long]): Int = {
    var bestK = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= 14) {
      var cost = 0L
      var i = 0
      while (i < us.length) { cost += (us(i) >>> k) + 1 + k; i += 1 }
      if (cost < bestCost) { bestCost = cost; bestK = k }
      k += 1
    }
    bestK
  }

  private def fixedResidual(samples: Array[Int], from: Int, len: Int,
                            order: Int): Array[Long] = {
    val out = new Array[Long](len - order)
    var i = order
    while (i < len) {
      val s = (j: Int) => samples(from + i - j).toLong
      out(i - order) = order match {
        case 0 => s(0)
        case 1 => s(0) - s(1)
        case 2 => s(0) - 2 * s(1) + s(2)
        case 3 => s(0) - 3 * s(1) + 3 * s(2) - s(3)
        case 4 => s(0) - 4 * s(1) + 6 * s(2) - 4 * s(3) + s(4)
      }
      i += 1
    }
    out
  }

  /** Encode one channel's block as a FIXED subframe of the best order
    * in {0, 1, 2} by total residual magnitude (deterministic). */
  private def writeSubframe(w: BitWriter, samples: Array[Int], from: Int,
                            len: Int, bps: Int): Unit = {
    val maxOrder = math.min(2, len - 1)
    var bestOrder = 0
    var bestMass = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResidual(samples, from, len, o)
      var m = 0L
      res.foreach(r => m += math.abs(r))
      if (m < bestMass) { bestMass = m; bestOrder = o }
      o += 1
    }
    // subframe header: 0 pad bit, 6-bit type (001000 + order), 0 = no
    // wasted bits
    w.writeBits(0L, 1)
    w.writeBits(8L + bestOrder, 6)
    w.writeBits(0L, 1)
    var i = 0
    while (i < bestOrder) { // warmup, bps bits two's-complement
      w.writeBits(samples(from + i).toLong & ((1L << bps) - 1), bps)
      i += 1
    }
    val res = fixedResidual(samples, from, len, bestOrder)
    val us = res.map(zigzag)
    val k = bestRiceParam(us)
    w.writeBits(0L, 2)         // residual method 0: RICE (4-bit params)
    w.writeBits(0L, 4)         // partition order 0 → one partition
    w.writeBits(k.toLong, 4)
    us.foreach { u =>
      w.writeUnary((u >>> k).toInt)
      if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
    }
  }

  /** Encode interleaved PCM as a spec-compliant FLAC stream: fixed
    * blocking, independent channels, 16-bit samples. */
  def encode(samples: Array[Short], channels: Int, sampleRate: Int,
             blockSize: Int = 256): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(samples.length % channels == 0 && samples.length > 0)
    val nInter = samples.length / channels // interchannel sample count
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('f', 'L', 'a', 'C'))
    // STREAMINFO: last-metadata-block flag + type 0, length 34
    val si = new BitWriter
    si.writeBits(1L, 1); si.writeBits(0L, 7); si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max (last frame may be shorter
                                       // — the spec carves that exception)
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5)               // bps - 1 = 15 → 16-bit
    si.writeBits(nInter.toLong, 36)
    (0 until 16).foreach(_ => si.writeBits(0L, 8)) // MD5 unset (=0, legal)
    out.write(si.bytes)
    // frames
    var frameIdx = 0L
    var pos = 0
    while (pos < nInter) {
      val bs = math.min(blockSize, nInter - pos)
      val fw = new BitWriter
      fw.writeBits(0x3FFEL, 14)  // sync
      fw.writeBits(0L, 1)        // reserved
      fw.writeBits(0L, 1)        // fixed blocking
      fw.writeBits(7L, 4)        // blocksize: 16-bit value - 1 follows
      fw.writeBits(0L, 4)        // sample rate: from STREAMINFO
      fw.writeBits((channels - 1).toLong, 4) // independent channels
      fw.writeBits(4L, 3)        // sample size: 16-bit
      fw.writeBits(0L, 1)        // reserved
      writeCodedNumber(fw, frameIdx)
      fw.writeBits((bs - 1).toLong, 16)
      val headBytes = fw.bytes   // aligned: 4 + coded + 2 bytes
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(headBytes)
      frame.write(crc8(headBytes, 0, headBytes.length))
      // subframes (bit-packed across channel boundaries)
      val sw = new BitWriter
      val chan = new Array[Int](bs)
      var c = 0
      while (c < channels) {
        var i = 0
        while (i < bs) { chan(i) = samples((pos + i) * channels + c); i += 1 }
        writeSubframe(sw, chan, 0, bs, 16)
        c += 1
      }
      frame.write(sw.bytes)      // alignByte pads the frame to a byte
      // CRC-16 over everything from sync through padding
      val fb = frame.toByteArray
      val c16 = crc16(fb, 0, fb.length)
      out.write(fb)
      out.write((c16 >>> 8) & 0xff); out.write(c16 & 0xff)
      frameIdx += 1
      pos += bs
    }
    out.toByteArray
  }

  // ------------------------------------------------------- decoding

  final case class FlacInfo(blockSize: Int, sampleRate: Int, channels: Int,
                            bps: Int, totalSamples: Long)
  final case class FlacAudio(info: FlacInfo, nFrames: Int,
                             samples: Array[Int]) // interleaved

  def parseInfo(payload: Array[Byte]): Option[FlacInfo] = {
    if (payload.length < 4 + 4 + 34) return None
    if (payload(0) != 'f' || payload(1) != 'L' || payload(2) != 'a' ||
      payload(3) != 'C') return None
    val r = new BitReader(payload, 4)
    val last = r.readBits(1).getOrElse(return None)
    val btype = r.readBits(7).getOrElse(return None)
    val blen = r.readBits(24).getOrElse(return None)
    if (btype != 0L || blen != 34L) return None
    r.readBits(16) // min block size
    val maxBs = r.readBits(16).getOrElse(return None).toInt
    r.readBits(24); r.readBits(24)
    val sr = r.readBits(20).getOrElse(return None).toInt
    val ch = r.readBits(3).getOrElse(return None).toInt + 1
    val bps = r.readBits(5).getOrElse(return None).toInt + 1
    val total = r.readBits(36).getOrElse(return None)
    var i = 0
    while (i < 16) { if (r.readBits(8).isEmpty) return None; i += 1 }
    var isLast = last == 1L
    // skip any further metadata blocks
    while (!isLast) {
      val l = r.readBits(1).getOrElse(return None)
      r.readBits(7).getOrElse(return None)
      val len = r.readBits(24).getOrElse(return None).toInt
      var j = 0
      while (j < len) { if (r.readBits(8).isEmpty) return None; j += 1 }
      isLast = l == 1L
    }
    if (sr <= 0 || bps < 4 || bps > 32) return None
    Some(FlacInfo(maxBs, sr, ch, bps, total))
  }

  private def firstFrameOffset(payload: Array[Byte]): Option[Int] = {
    // re-walk the metadata chain byte-wise to find the frame start
    if (payload.length < 8) return None
    var off = 4
    var last = false
    while (!last) {
      if (off + 4 > payload.length) return None
      last = (payload(off) & 0x80) != 0
      val len = ((payload(off + 1) & 0xff) << 16) |
        ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      off += 4 + len
      if (off > payload.length) return None
    }
    Some(off)
  }

  private val blockSizeTable: Array[Int] =
    Array(-1, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048,
      4096, 8192, 16384, 32768)
  private val sampleRateTable: Array[Int] =
    Array(0, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000,
      44100, 48000, 96000, -8, -16, -160, -1)

  private def decodeResiduals(r: BitReader, bs: Int, order: Int)
      : Option[Array[Long]] = {
    val method = r.readBits(2).getOrElse(return None).toInt
    if (method > 1) return None // reserved
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val pOrder = r.readBits(4).getOrElse(return None).toInt
    val nPart = 1 << pOrder
    if (bs % nPart != 0) return None
    val out = new Array[Long](bs - order)
    var idx = 0
    var p = 0
    while (p < nPart) {
      val n = (bs >> pOrder) - (if (p == 0) order else 0)
      if (n < 0) return None
      val param = r.readBits(paramBits).getOrElse(return None).toInt
      if (param == escape) {
        val raw = r.readBits(5).getOrElse(return None).toInt
        var i = 0
        while (i < n) {
          val v = if (raw == 0) 0L
          else {
            val u = r.readBits(raw).getOrElse(return None)
            // sign-extend raw two's complement
            if ((u & (1L << (raw - 1))) != 0) u - (1L << raw) else u
          }
          out(idx) = v; idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary().getOrElse(return None)
          val low = if (param == 0) 0L
            else r.readBits(param).getOrElse(return None)
          val u = (q.toLong << param) | low
          out(idx) = (u >>> 1) ^ -(u & 1L) // un-zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    Some(out)
  }

  private def reconstructFixed(order: Int, warmup: Array[Long],
                               res: Array[Long]): Array[Long] = {
    val n = warmup.length + res.length
    val out = new Array[Long](n)
    System.arraycopy(warmup, 0, out, 0, warmup.length)
    var i = order
    while (i < n) {
      val r = res(i - order)
      out(i) = order match {
        case 0 => r
        case 1 => r + out(i - 1)
        case 2 => r + 2 * out(i - 1) - out(i - 2)
        case 3 => r + 3 * out(i - 1) - 3 * out(i - 2) + out(i - 3)
        case 4 => r + 4 * out(i - 1) - 6 * out(i - 2) + 4 * out(i - 3) -
          out(i - 4)
      }
      i += 1
    }
    out
  }

  private def decodeSubframe(r: BitReader, bs: Int, bps: Int)
      : Option[Array[Long]] = {
    if (r.readBits(1).getOrElse(return None) != 0L) return None // pad bit
    val typ = r.readBits(6).getOrElse(return None).toInt
    val wastedFlag = r.readBits(1).getOrElse(return None)
    val wasted = if (wastedFlag == 1L) r.readUnary(64).getOrElse(return None) + 1
                 else 0
    val effBps = bps - wasted
    if (effBps <= 0) return None
    def readSigned(n: Int): Option[Long] = r.readBits(n).map { u =>
      if (n > 0 && (u & (1L << (n - 1))) != 0) u - (1L << n) else u
    }
    val vals: Option[Array[Long]] =
      if (typ == 0) { // CONSTANT
        readSigned(effBps).map(v => Array.fill(bs)(v))
      } else if (typ == 1) { // VERBATIM
        val out = new Array[Long](bs)
        var i = 0
        while (i < bs) {
          out(i) = readSigned(effBps).getOrElse(return None); i += 1
        }
        Some(out)
      } else if (typ >= 8 && typ <= 12) { // FIXED order 0..4
        val order = typ - 8
        if (order > bs) return None
        val warm = new Array[Long](order)
        var i = 0
        while (i < order) {
          warm(i) = readSigned(effBps).getOrElse(return None); i += 1
        }
        decodeResiduals(r, bs, order)
          .map(res => reconstructFixed(order, warm, res))
      } else if (typ >= 32) {
        None // LPC: outside the documented subset — refuse, never guess
      } else None // reserved types
    vals.map(v => if (wasted == 0) v else v.map(_ << wasted))
  }

  /** Decode the full stream. None on: bad magic, truncation anywhere,
    * CRC-8/CRC-16 mismatch, LPC or stereo-decorrelated frames,
    * reserved codes, or a sample count disagreeing with STREAMINFO. */
  def decode(payload: Array[Byte]): Option[FlacAudio] = {
    val info = parseInfo(payload).getOrElse(return None)
    val frameStart = firstFrameOffset(payload).getOrElse(return None)
    val total =
      if (info.totalSamples > 0) info.totalSamples
      else Long.MaxValue // unknown: read until EOF
    if (info.totalSamples * info.channels > Int.MaxValue / 4) return None
    val samples = new scala.collection.mutable.ArrayBuffer[Int](
      if (info.totalSamples > 0) (info.totalSamples * info.channels).toInt
      else 1024)
    val r = new BitReader(payload, frameStart)
    var got = 0L
    var nFrames = 0
    while (got < total) {
      if (r.bytePos >= payload.length && info.totalSamples == 0) {
        return Some(FlacAudio(info, nFrames, samples.toArray))
      }
      val frameOff = r.bytePos
      val sync = r.readBits(14).getOrElse(
        return if (info.totalSamples == 0)
          Some(FlacAudio(info, nFrames, samples.toArray)) else None)
      if (sync != 0x3FFEL) return None
      if (r.readBits(1).getOrElse(return None) != 0L) return None
      r.readBits(1).getOrElse(return None) // blocking strategy
      val bsCode = r.readBits(4).getOrElse(return None).toInt
      val srCode = r.readBits(4).getOrElse(return None).toInt
      val chAsgn = r.readBits(4).getOrElse(return None).toInt
      val ssCode = r.readBits(3).getOrElse(return None).toInt
      if (r.readBits(1).getOrElse(return None) != 0L) return None
      if (readCodedNumber(r).isEmpty) return None
      val bs = bsCode match {
        case 0 => return None // reserved
        case 6 => r.readBits(8).getOrElse(return None).toInt + 1
        case 7 => r.readBits(16).getOrElse(return None).toInt + 1
        case c => blockSizeTable(c)
      }
      srCode match { // consume trailing sample-rate bytes; value unused
        case 12 => r.readBits(8).getOrElse(return None)
        case 13 | 14 => r.readBits(16).getOrElse(return None)
        case 15 => return None
        case _ => 0L
      }
      if (chAsgn >= 8) return None // stereo decorrelation: refused subset
      val channels = chAsgn + 1
      if (channels != info.channels) return None
      val bps = ssCode match {
        case 0 => info.bps
        case 1 => 8
        case 2 => 12
        case 3 => return None
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
      }
      // header CRC-8 (header bytes end where we stand: reader is
      // byte-aligned after the fixed fields + coded number + extras)
      if (!r.aligned) return None
      val headEnd = r.bytePos
      val c8 = r.readBits(8).getOrElse(return None).toInt
      if (crc8(payload, frameOff, headEnd) != c8) return None
      if (bs <= 0) return None
      val chans = new Array[Array[Long]](channels)
      var c = 0
      while (c < channels) {
        chans(c) = decodeSubframe(r, bs, bps).getOrElse(return None)
        c += 1
      }
      r.alignToByte()
      val bodyEnd = r.bytePos
      val c16 = r.readBits(16).getOrElse(return None).toInt
      if (crc16(payload, frameOff, bodyEnd) != c16) return None
      var i = 0
      while (i < bs) {
        var cc = 0
        while (cc < channels) {
          val v = chans(cc)(i)
          if (v < Int.MinValue || v > Int.MaxValue) return None
          samples += v.toInt
          cc += 1
        }
        i += 1
      }
      got += bs
      nFrames += 1
      if (info.totalSamples > 0 && got > info.totalSamples) return None
    }
    Some(FlacAudio(info, nFrames, samples.toArray))
  }
}
