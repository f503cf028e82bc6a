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
