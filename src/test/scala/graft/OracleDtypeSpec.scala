package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB HUGEINT-promotion guard (the round-9 red row): DuckDB
  * promotes `sum(<integer>)` to HUGEINT (int128); when such a value
  * reaches an oracle's FINAL projection uncast, the driver's pandas
  * bridge renders it float64 while Spark emits int64, and the VALUE
  * hash diverges on numerically identical results
  * (`classifier_train_gd`, CORRECTNESS_r09). Two layers of defense:
  *
  *   1. DYNAMIC (authoritative): `tools/check.py` — the per-round t2
  *      replica — hard-FAILs any query whose Spark/oracle dtype KINDS
  *      split across the int/float family boundary. That check runs
  *      every oracle through DuckDB itself, so it catches promotions
  *      no static rule can see. This spec pins the enforcement text
  *      so a future edit cannot silently soften it back to a warning.
  *   2. STATIC (this suite): the one known-promoted projection keeps
  *      its cast, and the UNION-ALL-arm shape that produced it (a
  *      BIGINT first arm typing the column, later arms carrying bare
  *      integer sums past it) is pinned against regression.
  */
class OracleDtypeSpec extends AnyFunSuite {

  test("classifier_train_gd oracle casts its value column to BIGINT") {
    val sql = SparkEntry.oracleSql("classifier_train_gd")
    assert(sql.contains("CAST(value AS BIGINT)"),
      "the UNION ALL mixes BIGINT weights with integer sums; DuckDB " +
        "promotes the union column to HUGEINT -> pandas float64 " +
        "without the outer cast")
  }

  test("check.py enforces int/float dtype-kind splits as hard FAILs") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/check.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(src.contains("""int_kinds = {"i", "u"}"""),
      "the strict kind check was removed from tools/check.py")
    assert(src.contains("(gk in int_kinds) != (ek in int_kinds)"),
      "the int-kind split check was removed from tools/check.py")
    assert(src.contains("(gk in num_kinds) != (ek in num_kinds)"),
      "the numeric-vs-object split check was removed from tools/check.py")
    assert(src.contains("if hard:") && src.contains("ok = False"),
      "the kind split must fail the query, not just print")
  }

  test("no oracle's final projection ends in a bare integer-sum union arm") {
    // The exact regression shape: `UNION ALL SELECT '<tag>', sum(x)`
    // arms where the summed column is integral and no cast intervenes.
    // classifier_train_apply survives only because its sums pass
    // through an intDiv; anything matching the raw shape must cast.
    val bare = "UNION ALL SELECT '[a-z_]+', sum\\((?!CAST)[a-z_0-9]+\\)\\s*(?:FROM|$)".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(bare.findFirstIn(sql).isEmpty,
        s"$name carries a bare sum() through a UNION ALL arm — DuckDB " +
          "will type the column HUGEINT; wrap the outer projection in CAST")
    }
  }
}
