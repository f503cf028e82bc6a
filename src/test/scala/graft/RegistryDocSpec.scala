package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps README's correctness-gate numbers honest: the "X of the Y
  * `SparkEntry.queries`" sentence must be derived from the registries,
  * not hand-maintained (the round-5 review caught it stale). Also pins
  * the registry invariants the driver relies on: every oracle key names
  * a registered query, and exactly the two by-construction-approximate
  * queries lack oracles.
  */
class RegistryDocSpec extends AnyFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query has an oracle (approx ops gated via audits)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL (drivers record these as errors): $noOracle")
  }

  test("README's gate counts match the registries") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val expected =
      s"${SparkEntry.oracleSql.size} of the ${SparkEntry.queries.size} " +
        "`SparkEntry.queries` have DuckDB oracle SQL"
    assert(readme.contains(expected),
      s"README correctness-gate sentence is stale; expected: $expected")
  }
}
