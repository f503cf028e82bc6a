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
