package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MediaCodec, Multimodal}

/** Real-codec tier: PNG/WAV header build→parse round-trips, container
  * sniffing, malformed-input safety, and the typed mapPartitions
  * extraction path end-to-end. */
class MediaCodecSpec extends SparkSpec {

  test("png build/parse round-trips header fields, including edge dims") {
    for ((w, h, bd, ct) <- Seq((1, 1, 8, 6), (640, 480, 8, 2),
        (65535, 3, 16, 0))) {
      val p = MediaCodec.parsePng(MediaCodec.makePng(w, h, bd, ct))
      assert(p.contains(MediaCodec.PngHeader(w, h, bd, ct)))
    }
  }

  test("wav build/parse round-trips fmt fields; fmt found after other chunks") {
    for ((ch, sr, bps) <- Seq((1, 8000, 16), (2, 44100, 16), (2, 48000, 8))) {
      val f = MediaCodec.parseWav(MediaCodec.makeWav(ch, sr, bps))
      assert(f.contains(MediaCodec.WavFormat(ch, sr, bps)))
    }
    // fmt behind a LIST chunk (real writers do this): chunk walk finds
    // it; odd-sized chunk body exercises the word-alignment padding
    val base = MediaCodec.makeWav(2, 22050)
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes: odd
    val list = "LIST".getBytes("US-ASCII") ++
      Array(listBody.length.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      listBody ++ Array(0.toByte) // word-align pad
    val shuffled = base.take(12) ++ list ++ base.drop(12)
    assert(MediaCodec.parseWav(shuffled)
      .contains(MediaCodec.WavFormat(2, 22050, 16)))
  }

  test("sniff + parse are safe on malformed and truncated inputs") {
    val png = MediaCodec.makePng(10, 10)
    val wav = MediaCodec.makeWav(1, 8000)
    assert(MediaCodec.sniff(png) == "png" && MediaCodec.sniff(wav) == "wav")
    assert(MediaCodec.sniff("plain text".getBytes("UTF-8")) == "unknown")
    assert(MediaCodec.sniff(Array.empty[Byte]) == "unknown")
    // truncations never throw; anything shorter than the 29-byte
    // signature+IHDR head parses to None (the parser needs no more)
    for (n <- 0 until 29)
      assert(MediaCodec.parsePng(png.take(n)).isEmpty)
    for (n <- 0 until 36) // anything shorter than RIFF+fmt payload
      assert(MediaCodec.parseWav(wav.take(n)).isEmpty)
    // wrong chunk tag where IHDR should be
    val bad = png.clone(); bad(13) = 'X'.toByte
    assert(MediaCodec.parsePng(bad).isEmpty)
  }

  test("wav parser terminates on crafted chunk sizes (untrusted bytes)") {
    // A signed reading of size 0xFFFFFFF8 (-8) would advance the chunk
    // cursor by exactly zero bytes — an infinite loop on an executor.
    // Unsigned reading walks off the end and returns None promptly.
    def riff(chunks: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++
        Array((4 + chunks.length).toByte, 0.toByte, 0.toByte, 0.toByte) ++
        "WAVE".getBytes("US-ASCII") ++ chunks
    val sizes = Seq(0xFFFFFFF8, -1, Int.MinValue, Int.MaxValue, 0x7FFFFFF9)
    for (s <- sizes) {
      val junk = "JUNK".getBytes("US-ASCII") ++
        Array(s.toByte, (s >>> 8).toByte, (s >>> 16).toByte, (s >>> 24).toByte) ++
        Array.fill(16)(0.toByte)
      assert(MediaCodec.parseWav(riff(junk)).isEmpty, s"size=$s")
    }
    // a valid fmt BEFORE the hostile chunk still parses
    val good = MediaCodec.makeWav(2, 44100)
    val hostile = "JUNK".getBytes("US-ASCII") ++
      Array(0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val mixed = good ++ hostile
    assert(MediaCodec.parseWav(mixed)
      .contains(MediaCodec.WavFormat(2, 44100, 16)))
  }

  test("png pixel encode/decode round-trips the raster for every filter type") {
    val w = 7; val h = 5
    val raster = Multimodal.pixelRaster(docId = 42L, w, h)
    // each filter type alone, plus the cycling default
    for (f <- 0 to 4) {
      val png = MediaCodec.makePngWithPixels(w, h, raster, _ => f)
      val img = MediaCodec.decodePngPixels(png)
      assert(img.isDefined, s"filter=$f")
      assert(img.get.width == w && img.get.height == h && img.get.channels == 4)
      assert(img.get.bytes.sameElements(raster), s"filter=$f")
    }
    val cyc = MediaCodec.decodePngPixels(MediaCodec.makePngWithPixels(w, h, raster))
    assert(cyc.exists(_.bytes.sameElements(raster)))
    // 1x1 edge: no left/up neighbors anywhere
    val one = Multimodal.pixelRaster(7L, 1, 1)
    for (f <- 0 to 4)
      assert(MediaCodec.decodePngPixels(
        MediaCodec.makePngWithPixels(1, 1, one, _ => f))
        .exists(_.bytes.sameElements(one)))
  }

  test("png pixel decode handles split IDAT and rejects malformed streams") {
    val w = 9; val h = 4
    val raster = Multimodal.pixelRaster(3L, w, h)
    val png = MediaCodec.makePngWithPixels(w, h, raster)

    // split the single IDAT into two chunks (spec: concatenate) — find
    // the IDAT chunk and re-emit its payload as two chunks with real CRCs
    def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val t = tag.getBytes("US-ASCII")
      crc.update(t); crc.update(body)
      val len = body.length; val cv = crc.getValue.toInt
      Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte) ++
        t ++ body ++
        Array((cv >>> 24).toByte, (cv >>> 16).toByte, (cv >>> 8).toByte, cv.toByte)
    }
    var off = 8
    var idatStart = -1; var idatLen = -1
    while (idatStart < 0) {
      val len = be32(png, off)
      val tag = new String(png.slice(off + 4, off + 8), "US-ASCII")
      if (tag == "IDAT") { idatStart = off; idatLen = len }
      else off += 12 + len
    }
    val payload = png.slice(idatStart + 8, idatStart + 8 + idatLen)
    val (p1, p2) = payload.splitAt(payload.length / 2)
    val split = png.take(idatStart) ++ chunk("IDAT", p1) ++ chunk("IDAT", p2) ++
      png.drop(idatStart + 12 + idatLen)
    assert(MediaCodec.decodePngPixels(split).exists(_.bytes.sameElements(raster)))

    // malformed: truncated IDAT → None (never throws)
    val truncated = png.take(idatStart) ++
      chunk("IDAT", payload.take(payload.length / 2)) ++
      png.drop(idatStart + 12 + idatLen)
    assert(MediaCodec.decodePngPixels(truncated).isEmpty)
    // malformed: garbage zlib body → None
    assert(MediaCodec.decodePngPixels(
      png.take(idatStart) ++ chunk("IDAT", Array.fill(idatLen)(0x55.toByte)) ++
        png.drop(idatStart + 12 + idatLen)).isEmpty)
    // interlaced flag set → out of scope, None
    val inter = png.clone(); inter(28) = 1.toByte
    assert(MediaCodec.decodePngPixels(inter).isEmpty)
    // bad filter tag inside an otherwise-valid stream → None
    val rowBytes = w * 4
    val rawRows = new Array[Byte](h * (1 + rowBytes)) // filter 0 rows
    for (y <- 0 until h)
      System.arraycopy(raster, y * rowBytes, rawRows, y * (1 + rowBytes) + 1, rowBytes)
    rawRows(0) = 7.toByte // invalid filter id
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rawRows); deflater.finish()
    val buf = new Array[Byte](1 << 16)
    val n = deflater.deflate(buf); deflater.end()
    val badFilter = png.take(idatStart) ++ chunk("IDAT", buf.take(n)) ++
      png.drop(idatStart + 12 + idatLen)
    assert(MediaCodec.decodePngPixels(badFilter).isEmpty)
    // header-only PNG (no IDAT at all) → None
    assert(MediaCodec.decodePngPixels(MediaCodec.makePng(4, 4)).isEmpty)
  }

  test("wav sample encode/decode round-trips PCM16 incl. int16 extremes") {
    val signal = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      -12345, 12345, 255, -256)
    for (ch <- 1 to 2) {
      val wav = MediaCodec.makeWavWithSamples(ch, 44100, signal)
      val got = MediaCodec.decodeWavSamples(wav)
      assert(got.isDefined, s"ch=$ch")
      assert(got.get.channels == ch && got.get.sampleRateHz == 44100)
      assert(got.get.samples.sameElements(signal), s"ch=$ch")
    }
    // empty signal decodes to zero samples, not None
    assert(MediaCodec.decodeWavSamples(MediaCodec.makeWav(1, 8000))
      .exists(_.samples.isEmpty))
    // non-16-bit fmt → sample tier declines (header tier still parses)
    assert(MediaCodec.decodeWavSamples(MediaCodec.makeWav(1, 8000, 8)).isEmpty)
    // truncated data chunk (declared longer than the file) → None
    val wav = MediaCodec.makeWavWithSamples(1, 8000, signal)
    val truncated = wav.take(wav.length - 4)
    assert(MediaCodec.decodeWavSamples(truncated).isEmpty)
    // not a wav at all
    assert(MediaCodec.decodeWavSamples("nope".getBytes("UTF-8")).isEmpty)
  }

  test("y4m build/decode round-trips header and per-plane stats") {
    val y4m = MediaCodec.makeY4m(8, 6, 3, seed = 42)
    val (video, planes) = MediaCodec.decodeY4m(y4m).get
    assert(video == MediaCodec.Y4mVideo(8, 6, 25, 1, 3))
    assert(planes.map(_.plane).toSeq == Seq(0, 1, 2))
    // plane sizes: Y = w·h per frame, U = V = (w/2)·(h/2)
    assert(planes(0).nSamples == 8L * 6 * 3)
    assert(planes(1).nSamples == 4L * 3 * 3)
    assert(planes(2).nSamples == 4L * 3 * 3)
    // recompute stats directly from the generator formula
    val frameSize = 8 * 6 * 3 / 2
    val all = for (f <- 0 until 3; j <- 0 until frameSize)
      yield (j, (42 + f * 17 + j * 5) % 256)
    def planeOf(j: Int) = if (j < 48) 0 else if (j < 60) 1 else 2
    (0 until 3).foreach { p =>
      val vs = all.collect { case (j, v) if planeOf(j) == p => v }
      assert(planes(p).sum == vs.map(_.toLong).sum, s"plane $p sum")
      assert(planes(p).min == vs.min && planes(p).max == vs.max, s"plane $p")
    }
  }

  test("y4m decode rejects malformed and truncated streams") {
    val good = MediaCodec.makeY4m(4, 4, 2, seed = 7)
    assert(MediaCodec.decodeY4m(good).isDefined)
    // bad magic
    assert(MediaCodec.decodeY4m("JUNK W4 H4 F25:1\n".getBytes("US-ASCII")).isEmpty)
    // missing frame rate / zero dims / odd dims / non-420 colorspace
    assert(MediaCodec.decodeY4m("YUV4MPEG2 W4 H4\nFRAME\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4m("YUV4MPEG2 W0 H4 F25:1\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4m("YUV4MPEG2 W3 H4 F25:1\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4m(
      "YUV4MPEG2 W4 H4 F25:1 C444\n".getBytes("US-ASCII")).isEmpty)
    // header-supplied dims whose frame size overflows Int (65536² ≈ 2^32
    // → a non-positive Int frameSize would sail past the truncation
    // check and index at a negative offset); must reject, never throw
    assert(MediaCodec.decodeY4m(
      ("YUV4MPEG2 W65536 H65536 F25:1\nFRAME\n" + "x" * 64)
        .getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4m(
      ("YUV4MPEG2 W1073741824 H2 F25:1\nFRAME\n" + "x" * 64)
        .getBytes("US-ASCII")).isEmpty)
    // truncated mid-frame, garbage between frames, zero frames
    assert(MediaCodec.decodeY4m(good.dropRight(1)).isEmpty)
    assert(MediaCodec.decodeY4m(good ++ "tail".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4m("YUV4MPEG2 W4 H4 F25:1\n".getBytes("US-ASCII")).isEmpty)
    // a frame header with parameters is legal
    val paramFrame = {
      val hdr = "YUV4MPEG2 W4 H4 F25:1\n".getBytes("US-ASCII")
      val f = "FRAME Xparam\n".getBytes("US-ASCII") ++
        Array.fill(4 * 4 * 3 / 2)(1.toByte)
      hdr ++ f
    }
    assert(MediaCodec.decodeY4m(paramFrame)
      .exists(_._1 == MediaCodec.Y4mVideo(4, 4, 25, 1, 1)))
  }

  test("y4m raw-frame decode agrees with the aggregate decoder and rejects the same garbage") {
    val y4m = MediaCodec.makeY4m(8, 6, 3, seed = 42)
    val (video, frames) = MediaCodec.decodeY4mFrames(y4m).get
    val (video2, planes) = MediaCodec.decodeY4m(y4m).get
    assert(video == video2 && frames.length == 3)
    val frameSize = 8 * 6 * 3 / 2
    assert(frames.forall(_.length == frameSize))
    // the raw frames re-aggregate to exactly the aggregate decoder's sums
    def planeOf(j: Int) = if (j < 48) 0 else if (j < 60) 1 else 2
    (0 until 3).foreach { p =>
      val s = frames.flatMap(_.zipWithIndex.collect {
        case (b, j) if planeOf(j) == p => (b & 0xff).toLong }).sum
      assert(s == planes(p).sum, s"plane $p")
    }
    // same rejection surface as the aggregate decoder
    assert(MediaCodec.decodeY4mFrames(y4m.dropRight(1)).isEmpty)
    assert(MediaCodec.decodeY4mFrames(
      "JUNK W4 H4 F25:1\n".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodeY4mFrames(
      ("YUV4MPEG2 W65536 H65536 F25:1\nFRAME\n" + "x" * 64)
        .getBytes("US-ASCII")).isEmpty)
  }

  test("typed mapPartitions header extraction matches per-row expectation") {
    val rows = Multimodal.extractHeaders(Multimodal.syntheticMedia(spark, sfTiny))
      .collect().sortBy(_.doc_id)
    assert(rows.length == 500)
    rows.foreach { r =>
      (r.doc_id % 3) match {
        case 0 =>
          assert(r.container == "png")
          assert(r.width.contains((r.doc_id % 640 + 1).toInt))
          assert(r.height.contains((r.doc_id % 480 + 1).toInt))
        case 1 =>
          assert(r.container == "wav")
          assert(r.channels.contains((r.doc_id % 2 + 1).toInt))
          assert(r.sample_rate_hz.contains((8000 + (r.doc_id % 5) * 8000).toInt))
          assert(r.bits_per_sample.contains(16))
        case _ =>
          assert(r.container == "unknown" && r.width.isEmpty && r.channels.isEmpty)
      }
    }
  }
}
