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
}
