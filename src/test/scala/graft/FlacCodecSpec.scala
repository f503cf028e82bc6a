package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.FlacCodec

/** FLAC codec contract: losslessness is exact BY SPEC, so the
  * round-trip is sample-identical — plus the untrusted-input surface
  * (truncation at every byte, bit flips caught by CRC, refused
  * subset) in the JpegCodecSpec discipline. */
class FlacCodecSpec extends AnyFunSuite {

  private def signal(seed: Long, n: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((((seed % 251) + i * 7919) % 65536) - 32768).toShort
      i += 1
    }
    out
  }

  test("round-trip is sample-exact across channels, lengths, block splits") {
    for {
      seed <- Seq(1L, 17L, 250L)
      channels <- Seq(1, 2)
      nInter <- Seq(1, 7, 255, 256, 257, 1000)
    } {
      val pcm = signal(seed * 31 + nInter, nInter * channels)
      val flac = FlacCodec.encode(pcm, channels, 44100)
      val dec = FlacCodec.decode(flac).getOrElse(
        fail(s"decode failed seed=$seed ch=$channels n=$nInter"))
      assert(dec.info.channels == channels)
      assert(dec.info.totalSamples == nInter)
      assert(dec.nFrames == (nInter + 255) / 256)
      assert(dec.samples.length == pcm.length)
      dec.samples.zip(pcm).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e.toInt, s"sample $i seed=$seed ch=$channels n=$nInter")
      }
    }
  }

  test("smooth and constant signals exercise the fixed-order choice") {
    // constant → order-1 residuals all zero; ramp → order-2 all zero:
    // whichever order the encoder picks, the decode must be exact.
    val const = Array.fill(300)(123.toShort)
    val ramp = Array.tabulate(300)(i => (i * 3 - 450).toShort)
    val sine = Array.tabulate(300)(i =>
      (math.sin(i / 7.0) * 12000).toShort)
    for (pcm <- Seq(const, ramp, sine)) {
      val dec = FlacCodec.decode(FlacCodec.encode(pcm, 1, 8000)).get
      assert(dec.samples.toSeq == pcm.map(_.toInt).toSeq)
    }
  }

  test("int16 rails survive the predictor/Rice path sign-exactly") {
    val pcm = Array[Short](32767, -32768, 32767, -32768, 0, 1, -1, 32767)
    val dec = FlacCodec.decode(FlacCodec.encode(pcm, 1, 16000)).get
    assert(dec.samples.toSeq == pcm.map(_.toInt).toSeq)
  }

  test("truncation at EVERY byte offset yields None, never garbage") {
    val pcm = signal(9L, 600)
    val flac = FlacCodec.encode(pcm, 2, 22050)
    (0 until flac.length).foreach { n =>
      val cut = flac.take(n)
      assert(FlacCodec.decode(cut).isEmpty, s"decode of $n-byte prefix")
    }
    assert(FlacCodec.decode(flac).isDefined)
  }

  test("any single flipped bit in a frame fails a CRC, not the samples") {
    val pcm = signal(41L, 300)
    val flac = FlacCodec.encode(pcm, 1, 32000)
    val frameStart = 4 + 4 + 34 // magic + block header + STREAMINFO
    val truth = FlacCodec.decode(flac).get.samples.toSeq
    (frameStart until flac.length).foreach { byteIdx =>
      val mut = flac.clone()
      mut(byteIdx) = (mut(byteIdx) ^ 0x10).toByte
      FlacCodec.decode(mut) match {
        case None => () // CRC (or structural check) caught it — good
        case Some(d) =>
          // A flip in CRC-padding bits of the final byte can decode;
          // samples must then still be the truth.
          assert(d.samples.toSeq == truth,
            s"bit flip at byte $byteIdx silently changed samples")
      }
    }
  }

  test("bad magic / non-audio bytes are refused") {
    assert(FlacCodec.decode("not a flac stream at all".getBytes).isEmpty)
    assert(FlacCodec.decode(Array[Byte]()).isEmpty)
    assert(FlacCodec.decode(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
  }
}
