package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.OracleSql.materializeSharedCtes

/** The shared-CTE MATERIALIZED hint pass (the fix for the round-8
  * driver-timeout artifact loss): multiply-referenced CTEs get the
  * keyword, single-use CTEs stay inline (pushdown survives), hinted
  * text is left alone, and the rewrite is purely textual — value
  * equivalence is covered by the full oracle gate, which runs every
  * hinted statement against DuckDB. */
class OracleHintsSpec extends AnyFunSuite {

  test("multiply-referenced CTE gets MATERIALIZED; single-use stays inline") {
    val sql =
      """WITH base AS (SELECT 1 AS x),
         twice AS (SELECT x FROM base),
         out AS (SELECT a.x FROM twice a JOIN twice b ON a.x = b.x)
         SELECT * FROM out"""
    val hinted = materializeSharedCtes(sql)
    assert(hinted.contains("twice AS MATERIALIZED ("))
    assert(hinted.contains("base AS (SELECT 1"), "single-use CTE must stay inline")
    assert(hinted.contains("out AS (SELECT a.x"), "single-use CTE must stay inline")
  }

  test("column-list heads (recursive CTEs) keep their list intact") {
    val sql =
      """WITH RECURSIVE r(x, y) AS (
           SELECT 1, 1 UNION ALL SELECT x + 1, y FROM r WHERE x < 3)
         SELECT max(x) FROM r"""
    val hinted = materializeSharedCtes(sql)
    assert(hinted.contains("r(x, y) AS MATERIALIZED ("), hinted)
  }

  test("already-hinted heads are not double-hinted") {
    val sql =
      """WITH m AS MATERIALIZED (SELECT 1 AS x)
         SELECT a.x FROM m a JOIN m b ON a.x = b.x"""
    assert(materializeSharedCtes(sql) == sql)
  }

  test("table aliases and casts never match the head pattern") {
    val sql =
      """SELECT t.a FROM (VALUES (1)) AS t(a)
         WHERE CAST(t.a AS BIGINT) = 1"""
    assert(materializeSharedCtes(sql) == sql)
  }

  test("the kcore doubling chain is hinted end to end") {
    // the real regression: every knodes round is referenced twice by
    // the next round's two joins — all must materialize
    val sql = SparkEntry.oracleSql("dedup_kcore")
    (0 to 7).foreach { r =>
      assert(sql.contains(s"knodes$r AS MATERIALIZED ("),
        s"knodes$r not materialized")
    }
  }
}
