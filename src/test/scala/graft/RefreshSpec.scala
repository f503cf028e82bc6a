package graft

import org.apache.spark.sql.functions._
import graft.sql.Extras

/** Invariants for the incremental-refresh and islands operators, plus
  * a crafted-corpus check of the sparse TF-IDF pair semantics. */
class RefreshSpec extends SparkSpec {

  test("refresh split is non-degenerate: base AND delta both contribute") {
    // the oracle equality only proves the merge if both sides of the
    // split are non-empty — an out-of-range split date would silently
    // reduce the query to a plain aggregate (the bug class this pins)
    val li = graft.io.Tables.lineitem(spark, sfTiny)
    val base = li.filter(col("l_shipdate") < lit("1998-06-01")).count()
    val delta = li.filter(col("l_shipdate") >= lit("1998-06-01")).count()
    assert(base > 0 && delta > 0, s"degenerate split: base=$base delta=$delta")
    // and the merged output accounts for every input row exactly once
    val merged = Extras.incrementalRefresh(spark, sfTiny)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    assert(merged == base + delta)
  }

  test("islands partition the order stream into contiguous runs") {
    val islands = Extras.priorityIslands(spark, sfTiny)
      .select("o_custkey", "island", "priority", "n_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val totalOrders = graft.io.Tables.orders(spark, sfTiny).count()
    assert(islands.map(_._4).sum == totalOrders, "islands must cover every order")
    islands.groupBy(_._1).foreach { case (cust, rows) =>
      val sorted = rows.sortBy(_._2)
      // ids are 1..k with no holes
      assert(sorted.map(_._2).sameElements(1L to sorted.length),
        s"customer $cust has non-contiguous island ids")
      // a run only ends when the priority changes
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3,
          s"customer $cust: adjacent islands share priority ${a._3}")
        case _ =>
      }
    }
  }

  test("cdc apply decomposes into key-disjoint micro-batches") {
    // the property a foreachBatch CDC sink relies on: folding the
    // changelog batch-by-batch through applyChanges lands on exactly
    // the one-shot snapshot, as long as batches don't split a key
    import org.apache.spark.sql.functions.{abs => sabs, col, hash, lit, pmod}
    val o = graft.io.Tables.orders(spark, sfTiny)
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents")
    val changes = o.filter("o_orderkey % 7 = 0")
      .selectExpr("o_orderkey AS key",
        "CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op",
        "o_custkey", "o_orderstatus", "price_cents + 10000 AS price_cents")
      .unionByName(o.filter("o_orderkey % 11 = 0")
        .selectExpr("o_orderkey + 1000000000 AS key", "'I' AS op",
          "o_custkey", "o_orderstatus", "price_cents"))
    val oneShot = Extras.applyChanges(o, changes)
      .orderBy("o_orderkey").collect()
    val folded = (0 until 3).foldLeft(o) { (state, b) =>
      // key-hash batching: disjoint by construction; materialized so
      // each step is a clean state-to-state transition
      val batch = changes.filter(pmod(sabs(hash(col("key"))), lit(3)) === b)
      Extras.applyChanges(state, batch).localCheckpoint()
    }.orderBy("o_orderkey").collect()
    assert(folded.length == oneShot.length && folded.length > 0)
    assert(folded.sameElements(oneShot))
  }

  test("pii redaction masks every span type and leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe@example.com or +1 (555) 123-4567 ok"),
      (2L, "see https://example.com/a?b=c#d for details"),
      (3L, "ssn 123-45-6789 on file"),
      (4L, "perfectly clean prose with no identifiers"))
      .toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.piiRedactDf(df)
      .select("doc_id", "text_redacted").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact me at [EMAIL] or [PHONE] ok")
    assert(got(2L) == "see [URL] for details")
    assert(got(3L) == "ssn [ID] on file")
    assert(got(4L) == "perfectly clean prose with no identifiers")
  }

  test("tfidf pairs: duplicates hit cosine 1.0, disjoint docs never pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tfidf").toString
    val rep = (s: String) => Seq.fill(3)(s).mkString(" ")
    // docs 1/2 identical; doc 3 shares nothing; docs must clear the
    // 3-gram minimum and each shared gram needs df in [2, 20]
    Seq(
      (1L, rep("alpha beta gamma delta epsilon"), "en", "web", 40),
      (2L, rep("alpha beta gamma delta epsilon"), "en", "web", 40),
      (3L, rep("zeta eta theta iota kappa"), "en", "web", 40))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val pairs = graft.llm.TextAnalysis.tfidfPairs(spark, dir)
      .select("doc_a", "doc_b", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length == 1, s"expected exactly the duplicate pair, got ${pairs.toSeq}")
    assert(pairs(0)._1 == 1L && pairs(0)._2 == 2L)
    // identical quantized weight vectors → dot == norm product exactly
    assert(pairs(0)._3 == 1.0)
  }
}
