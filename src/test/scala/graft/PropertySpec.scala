package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY §5.4) via scalacheck directly (no
  * scalatestplus bridge in the offline cache). Spark-level determinism
  * properties are covered by the oracle gate; these cover the pure
  * logic. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("routing is total, stable, and csv-gated for any key") {
    import graft.orchestrate.Orchestrator
    check("routing", Prop.forAll(Gen.asciiPrintableStr) { key =>
      val r1 = Orchestrator.route(key)
      r1 == Orchestrator.route(key) &&
        (if (key.toLowerCase.endsWith(".csv")) r1.nonEmpty else r1.isEmpty)
    })
  }

  test("severity ladder is monotone in |variance|") {
    val rank = Map("Low" -> 1, "Medium" -> 2, "High" -> 3, "Critical" -> 4)
    def sev(v: Int): String =
      if (math.abs(v) > 100) "Critical"
      else if (math.abs(v) > 50) "High"
      else if (math.abs(v) > 10) "Medium" else "Low"
    check("severity", Prop.forAll(Gen.chooseNum(-200, 200), Gen.chooseNum(-200, 200)) {
      (a, b) =>
        math.abs(a) > math.abs(b) || rank(sev(a)) <= rank(sev(b))
    })
  }

  test("png header round-trips for arbitrary dimensions and modes") {
    import graft.llm.MediaCodec
    val dims = Gen.chooseNum(1, Int.MaxValue)
    val depth = Gen.oneOf(1, 2, 4, 8, 16)
    val ctype = Gen.oneOf(0, 2, 3, 4, 6)
    check("png", Prop.forAll(dims, dims, depth, ctype) { (w, h, bd, ct) =>
      MediaCodec.parsePng(MediaCodec.makePng(w, h, bd, ct))
        .contains(MediaCodec.PngHeader(w, h, bd, ct))
    })
  }

  test("wav fmt round-trips for arbitrary channel/rate/width combos") {
    import graft.llm.MediaCodec
    check("wav", Prop.forAll(
      Gen.chooseNum(1, 64), Gen.chooseNum(1, 768000), Gen.oneOf(8, 16, 24, 32)) {
      (ch, sr, bps) =>
        MediaCodec.parseWav(MediaCodec.makeWav(ch, sr, bps))
          .contains(MediaCodec.WavFormat(ch, sr, bps))
    })
  }

  test("unit-interval hash split is stable and in-range (pure mirror)") {
    // pure-logic mirror of Curation's md5→32-bit→[0,1) mapping
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(8), 16).toDouble / 4294967296.0
    }
    check("unitHash", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { id =>
      val v = u(id)
      v == u(id) && v >= 0.0 && v < 1.0
    })
  }

  test("minhash banding: identical shingle sets share every band key") {
    // pure-logic mirror of Gen.minhashSig determinism: same input string
    // set → same md5-min per permutation
    def sig(shingles: Set[String], j: Int): String =
      shingles.map(s => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$s".getBytes("UTF-8")).map("%02x".format(_)).mkString).min
    check("minhash", Prop.forAll(Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))) { ws =>
      val s = ws.toSet
      (0 until 4).forall(j => sig(s, j) == sig(s, j))
    })
  }

  test("morton interleave is a bijection and nests by prefix") {
    // pure mirror of Scale.zorderExpr's div/mod arithmetic
    def z(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc + ((x >> i) & 1L) * (1L << (2 * i)) +
          ((y >> i) & 1L) * (1L << (2 * i + 1)) }
    def unz(v: Long): (Long, Long) =
      (0 until 16).foldLeft((0L, 0L)) { case ((x, y), i) =>
        (x | (((v >> (2 * i)) & 1L) << i),
          y | (((v >> (2 * i + 1)) & 1L) << i)) }
    val k16 = Gen.chooseNum(0L, 65535L)
    check("mortonBijection", Prop.forAll(k16, k16) { (x, y) =>
      unz(z(x, y)) == ((x, y))
    })
    // prefix nesting: dropping 2b low z-bits == dropping b low bits of
    // each dim — the row-group pruning property zorderLocality reports
    check("mortonPrefix", Prop.forAll(k16, k16, Gen.chooseNum(0, 16)) {
      (x, y, b) => (z(x, y) >> (2 * b)) == z(x >> b, y >> b)
    })
  }

  test("topk heap equals sort-take for arbitrary inputs and merge splits") {
    val input = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val kGen = Gen.chooseNum(1, 12)
    check("heapSortTake", Prop.forAll(input, kGen) { (vs, k) =>
      val h = new graft.functions.TopKAgg.Heap(k)
      vs.foreach(h.offer)
      h.sortedDesc.toSeq == vs.sorted.reverse.take(k)
    })
    // associative merge: heaping any split equals heaping the whole
    check("heapMerge", Prop.forAll(input, input, kGen) { (a, b, k) =>
      val ha = new graft.functions.TopKAgg.Heap(k)
      a.foreach(ha.offer)
      val hb = new graft.functions.TopKAgg.Heap(k)
      b.foreach(hb.offer)
      (0 until hb.size).foreach(i => ha.offer(hb.values(i)))
      val whole = new graft.functions.TopKAgg.Heap(k)
      (a ++ b).foreach(whole.offer)
      ha.sortedDesc.toSeq == whole.sortedDesc.toSeq
    })
  }

  test("checksum canonical encoding is invertible (hence injective)") {
    // pure mirror of Profile.canon's string tier: escape then sentinel
    def enc(fields: List[Option[String]]): String =
      fields.map {
        case None => "\\N"
        case Some(s) => s.replace("\\", "\\\\").replace("|", "\\|")
      }.mkString("|")
    // decoder: split into RAW slices on unescaped '|', then a slice is
    // the sentinel iff it is exactly "\\N" (escaped content doubles
    // every backslash, so a lone '\' before 'N' cannot occur in it);
    // otherwise unescape
    def dec(s: String): List[Option[String]] = {
      val slices = scala.collection.mutable.ListBuffer[String]()
      val cur = new StringBuilder
      var escaped = false
      s.foreach { c =>
        if (escaped) { cur.append(c); escaped = false }
        else if (c == '\\') { cur.append(c); escaped = true }
        else if (c == '|') { slices += cur.toString; cur.clear() }
        else cur.append(c)
      }
      slices += cur.toString
      slices.toList.map {
        case "\\N" => None
        case raw => Some(raw.replace("\\|", "|").replace("\\\\", "\\"))
      }
    }
    val field = Gen.option(Gen.listOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('|', '\\', 'N'))).map(_.mkString))
    val row = Gen.listOfN(4, field)
    check("checksumRoundTrip", Prop.forAll(row) { r =>
      dec(enc(r)) == r
    })
  }

  test("media decoders are total on arbitrary byte garbage") {
    import graft.llm.MediaCodec
    val bytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    // also prefix garbage with real magics so the chunk walkers engage
    val seeded = for {
      b <- bytes
      magic <- Gen.oneOf(Array[Byte](), "YUV4MPEG2 ".getBytes("US-ASCII"),
        "RIFF".getBytes("US-ASCII"),
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    } yield magic ++ b
    check("decoderTotality", Prop.forAll(seeded) { payload =>
      MediaCodec.decodeY4m(payload)
      MediaCodec.decodeWavSamples(payload)
      MediaCodec.decodePngPixels(payload)
      true // reaching here means: no throw on any input
    })
  }
}
