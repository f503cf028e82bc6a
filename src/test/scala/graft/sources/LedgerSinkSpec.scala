package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The transactional sink's commit protocol and codec: bit-exact
  * roundtrips (nulls, unicode, structural chars, double payloads),
  * manifest-gated visibility (stale duplicate attempts invisible),
  * append vs overwrite manifests, and truncation of torn lines being
  * impossible by construction (readers never list the directory). */
class LedgerSinkSpec extends graft.SparkSpec {
  import spark.implicits._

  private def scratch(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_ledger_$tag")
    d.toString
  }

  test("roundtrip is bit-exact across types, nulls, and hostile strings") {
    val dir = scratch("rt")
    val df = Seq(
      (1L, Some(42), Some(1.5), Some("plain")),
      (2L, None, Some(-0.0), Some("comma,percent%и\nnewline\\N")),
      (3L, Some(-7), None, Some("日本語 héllo")),
      (4L, Some(0), Some(Double.NaN), None),
      (5L, Some(9), Some(java.lang.Double.MIN_VALUE), Some("\\N"))
    ).toDF("k", "i", "d", "s")
    df.write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    val back = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load()
      .orderBy("k").collect()
    val want = df.orderBy("k").collect()
    back.zip(want).foreach { case (g, w) =>
      (0 until 4).foreach { c =>
        if (w.isNullAt(c)) assert(g.isNullAt(c), s"col $c null lost")
        else c match {
          case 2 => // NaN-safe double compare, bit-exact incl. -0.0
            assert(java.lang.Double.doubleToRawLongBits(g.getDouble(2)) ===
              java.lang.Double.doubleToRawLongBits(w.getDouble(2)))
          case _ => assert(g.get(c) === w.get(c))
        }
      }
    }
  }

  test("readers see the manifest, not the directory: stale attempts invisible") {
    val dir = scratch("stale")
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    // a speculative duplicate attempt that lost the race: staged but
    // never committed — must not be read
    Files.write(Paths.get(dir, "_staging", "part-9-999.ledger"),
      "99,ghost\n".getBytes(UTF_8))
    val rows = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load().collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("append unions manifests; overwrite truncates") {
    val dir = scratch("modes")
    Seq((1L, "a")).toDF("k", "v").write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    Seq((2L, "b")).toDF("k", "v").write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("append").save()
    def keys() = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load().collect().map(_.getLong(0)).sorted.toSeq
    assert(keys() === Seq(1L, 2L))
    Seq((3L, "c")).toDF("k", "v").write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    assert(keys() === Seq(3L))
  }

  test("unsupported column types are refused at plan time") {
    val dir = scratch("badtype")
    val df = Seq((1L, Array(1.0f))).toDF("k", "emb")
    val e = intercept[Exception] {
      df.write.format(classOf[LedgerSink].getName)
        .option("path", dir).mode("overwrite").save()
    }
    assert(e.getMessage.contains("does not support") ||
      Option(e.getCause).exists(_.getMessage.contains("does not support")))
  }

  test("manifest stats skip whole files; statless columns never skip") {
    val dir = scratch("skip")
    // range-partitioned write → per-file key ranges are disjoint, so
    // the manifest's min/max actually discriminate
    spark.range(0, 10000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
      .repartitionByRange(8, col("k"))
      .write.format(classOf[LedgerSink].getName)
      .option("path", dir).mode("overwrite").save()
    val all = spark.read.format(classOf[LedgerSink].getName)
      .option("path", dir).load()
    def parts(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }.getOrElse(fail("no scan"))
    assert(parts(all) === 8)
    val narrow = all.where(col("k") >= 9000L)
    assert(parts(narrow) < 8, "stats did not skip files")
    // pruning is advisory: the rows that survive are exactly right
    assert(narrow.count() === 1000L)
    assert(all.where(col("k") === 4242L).count() === 1L)
    // a filter on a statless (string) column must not skip anything
    assert(parts(all.where(col("v") > "zzz")) === 8)
  }

  test("fixture roundtrip query matches the direct scan") {
    val out = LedgerRoundtrip.sinkRoundtrip(spark, sfTiny).collect()
    val direct = graft.io.Tables.customer(spark, sfTiny)
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey").collect()
    assert(out.length === direct.length)
    out.zip(direct).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      assert(g.getString(1) === w.getString(1))
      assert(java.lang.Double.doubleToRawLongBits(g.getDouble(3)) ===
        java.lang.Double.doubleToRawLongBits(w.getDouble(2)))
    }
  }
}
