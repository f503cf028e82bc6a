package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.JpegCodec

/** Baseline JPEG codec contracts: exact fixture-class roundtrip,
  * general-coefficient decode vs a direct-form reference IDCT,
  * stuffing/DC-prediction coverage, and malformed-input hardening
  * (truncation, lies in SOF, unsupported modes — every one a graceful
  * None, never a throw, hang, or giant allocation). */
class JpegCodecSpec extends AnyFunSuite {

  private def blockVal(id: Long)(bx: Int, by: Int): Int =
    ((id * 31 + bx * 17 + by * 29) % 256).toInt

  private def fixture(id: Long, w: Int = 30, h: Int = 21): Array[Byte] =
    JpegCodec.encodeGrayConstantBlocks(w, h, blockVal(id))

  test("constant-block fixtures roundtrip bit-exactly (odd dims, partial blocks)") {
    for (id <- 0L to 40L) {
      val w = (id % 21 + 10).toInt; val h = (id % 13 + 9).toInt
      val img = JpegCodec.decode(fixture(id, w, h)).getOrElse(fail(s"doc $id"))
      assert(img.width === w && img.height === h && img.components === 1)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val expect = blockVal(id)(x / 8, y / 8)
          val got = img.bytes(y * w + x) & 0xff
          assert(got === expect, s"doc $id pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("entropy stream contains real byte stuffing and still decodes exactly") {
    // Hunt a fixture whose scan bytes include a stuffed 0xFF00 pair.
    val stuffed = (0L to 200L).find { id =>
      val b = fixture(id)
      // scan region: after the SOS segment, before trailing EOI
      val sos = indexOfMarker(b, 0xda)
      val scanStart = sos + 2 + segLen(b, sos)
      (scanStart until b.length - 2).exists(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0x00)
    }
    assert(stuffed.nonEmpty, "no fixture produced byte stuffing — broaden the hunt")
    val img = JpegCodec.decode(fixture(stuffed.get)).get
    assert((img.bytes(0) & 0xff) === blockVal(stuffed.get)(0, 0))
  }

  private def refIdct(coef: Array[Int]): Array[Int] = {
    def c(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    (0 until 64).map { i =>
      val y = i / 8; val x = i % 8
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += c(u) * c(v) * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val p = math.round(s / 4.0).toInt + 128
      if (p < 0) 0 else if (p > 255) 255 else p
    }.toArray
  }

  test("general AC coefficients decode to the direct-form IDCT (run/ZRL/EOB paths)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      // Sparse-ish blocks: a few AC terms incl. long zero runs (ZRL).
      val blocks = Array.fill(2, 2) {
        val coef = new Array[Int](64)
        coef(0) = rnd.nextInt(512) - 256
        for (_ <- 0 until rnd.nextInt(6)) {
          val pos = 1 + rnd.nextInt(63)
          coef(JpegCodec.Zigzag(pos)) = rnd.nextInt(201) - 100
        }
        if (trial % 3 == 0) coef(JpegCodec.Zigzag(63)) = 7 // tail coefficient
        coef
      }
      val jpg = JpegCodec.encodeGrayCoefBlocks(16, 16, (bx, by) => blocks(by)(bx))
      val img = JpegCodec.decode(jpg).getOrElse(fail(s"trial $trial"))
      for (by <- 0 until 2; bx <- 0 until 2) {
        val expect = refIdct(blocks(by)(bx))
        for (y <- 0 until 8; x <- 0 until 8) {
          val got = img.bytes((by * 8 + y) * 16 + bx * 8 + x) & 0xff
          assert(got === expect(y * 8 + x),
            s"trial $trial block ($bx,$by) pixel ($x,$y)")
        }
      }
    }
  }

  private def indexOfMarker(b: Array[Byte], marker: Int): Int = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == marker) return i
      i += 2 + segLen(b, i)
    }
    fail(s"marker $marker not found")
  }

  private def segLen(b: Array[Byte], at: Int): Int =
    ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)

  test("malformed inputs: graceful None, never a throw or giant allocation") {
    val good = fixture(7L)
    assert(JpegCodec.decode(good).isDefined)
    // not a JPEG at all / empty / magic only
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode("hello".getBytes).isEmpty)
    assert(JpegCodec.decode(Array(0xff, 0xd8, 0xff).map(_.toByte)).isEmpty)
    // truncation at EVERY byte boundary must be a quiet None
    // (the scan tail may still decode if only trailing bytes are cut —
    // assert no-throw everywhere, None for structural prefixes)
    for (cut <- 0 until good.length) {
      val t = good.take(cut)
      val r = JpegCodec.decode(t) // must not throw
      if (cut < indexOfMarker(good, 0xda)) assert(r.isEmpty, s"cut=$cut")
    }
    // SOF lying about dimensions: 40000 x 40000 would be 1.6 GB — cap
    val sof = indexOfMarker(good, 0xc0)
    val lying = good.clone()
    lying(sof + 5) = ((40000 >> 8) & 0xff).toByte // height hi
    lying(sof + 6) = (40000 & 0xff).toByte
    lying(sof + 7) = ((40000 >> 8) & 0xff).toByte // width hi
    lying(sof + 8) = (40000 & 0xff).toByte
    assert(JpegCodec.decode(lying).isEmpty)
    // chroma-subsampled SOF: refuse rather than mis-decode
    val sub = good.clone()
    sub(sof + 11) = 0x22.toByte // h=2, v=2 sampling
    assert(JpegCodec.decode(sub).isEmpty)
    // progressive (SOF2): unsupported mode
    val prog = good.clone()
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // corrupted entropy bytes: any outcome but a crash/hang is fine
    val sosAt = indexOfMarker(good, 0xda)
    val scanStart = sosAt + 2 + segLen(good, sosAt)
    for (i <- scanStart until math.min(scanStart + 8, good.length - 2)) {
      val bad = good.clone()
      bad(i) = (~bad(i)).toByte
      JpegCodec.decode(bad) // no-throw contract
    }
  }

  test("sniff recognizes JPEG and rejects PNG/WAV") {
    assert(JpegCodec.sniff(fixture(1L)))
    assert(!JpegCodec.sniff(graft.llm.MediaCodec.makePng(4, 4)))
    assert(!JpegCodec.sniff(graft.llm.MediaCodec.makeWav(1, 8000)))
  }
}
