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
