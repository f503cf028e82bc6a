package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.GifCodec

/** The [[graft.llm.JpegCodec]]/[[graft.llm.FlacCodec]] discipline
  * applied to the LZW tier: lossless round-trips (including the
  * dictionary-reset and KwKwK paths), untrusted-input hardening
  * (truncation at EVERY byte → None, never garbage), and refusal of
  * the shapes the decoder does not claim (interlace). */
class GifCodecSpec extends AnyFunSuite {

  private def gray(n: Int) = Array.tabulate(n)(i => i % 256)

  private def roundTrip(w: Int, h: Int, px: Array[Int]): Unit = {
    val bytes = GifCodec.encode(w, h, px)
    val img = GifCodec.decode(bytes).getOrElse(fail(s"decode failed ${w}x$h"))
    assert(img.width === w)
    assert(img.height === h)
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("round-trip: single pixel, ramp, and repetitive (KwKwK) rasters") {
    roundTrip(1, 1, Array(137))
    roundTrip(16, 4, gray(64))
    // heavy repetition drives the KwKwK first-use case
    roundTrip(50, 8, Array.tabulate(400)(i => (i / 3) % 7))
    roundTrip(10, 10, Array.fill(100)(0))
  }

  test("round-trip through a full dictionary (mid-stream LZW reset)") {
    // a de-correlated raster grows the string table past 4096, forcing
    // the encoder's CLEAR-code reset; the pattern is deterministic
    val n = 300 * 60
    val px = Array.tabulate(n)(i => ((i * 2654435761L >>> 7) % 256).toInt)
    roundTrip(300, 60, px)
  }

  test("every truncation of a valid GIF decodes to None") {
    val bytes = GifCodec.encode(13, 7, gray(91))
    for (len <- 0 until bytes.length) {
      val cut = java.util.Arrays.copyOfRange(bytes, 0, len)
      assert(GifCodec.decode(cut).isEmpty, s"truncation at $len decoded")
    }
  }

  test("interlaced images are refused, 89a extensions are skipped") {
    val bytes = GifCodec.encode(6, 6, gray(36))
    // image-descriptor packed byte sits right after 6 (hdr) + 7 (lsd)
    // + 768 (gct) + 1 (0x2c) + 8 (geometry) = 790
    val interlaced = bytes.clone()
    assert(interlaced(781) === 0x2c.toByte)
    interlaced(790) = 0x40.toByte
    assert(GifCodec.decode(interlaced).isEmpty, "interlace flag accepted")
    // splice a graphic-control extension (0x21 0xf9 len=4 data term)
    // before the image descriptor and flip the version to 89a
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = bytes.take(781) ++ ext ++ bytes.drop(781)
    spliced(4) = '9'.toByte
    val img = GifCodec.decode(spliced).getOrElse(fail("89a ext not skipped"))
    assert(img.pixels.toSeq === gray(36).toSeq)
  }

  test("oversized declared dimensions are rejected") {
    val bytes = GifCodec.encode(6, 6, gray(36))
    val huge = bytes.clone()
    // image descriptor width at offset 786 (little-endian)
    huge(786) = 0xff.toByte; huge(787) = 0xff.toByte
    assert(GifCodec.decode(huge).isEmpty, "65535-wide image accepted")
  }

  test("corrupt LZW codes are rejected, not mis-decoded") {
    val bytes = GifCodec.encode(13, 7, gray(91))
    // flip bits inside the compressed payload; decode must never throw
    // and never return a wrong-but-Some raster silently mismatching
    // dimensions — either None or a 91-pixel raster
    for (off <- 792 until bytes.length - 2) {
      val bad = bytes.clone()
      bad(off) = (bad(off) ^ 0x55).toByte
      GifCodec.decode(bad) match {
        case None => ()
        case Some(img) => assert(img.pixels.length === 91)
      }
    }
  }
}
