package graft

import org.apache.spark.sql.functions._

/** The Misra–Gries native aggregate's two theorems, checked under
  * DIFFERENT partitionings of the same stream — the property the
  * oracle gate leans on (`text_heavyhitters_audit` must produce
  * identical flags at whatever core count the driver runs). */
class HeavyHittersSpec extends SparkSpec {

  private def mkStream(): Seq[Long] = {
    // skewed stream: key i appears ~ 20000/i times (Zipf-ish), keys
    // 1..500, n ≈ 20000·H(500); deterministic interleave
    val items = (1 to 500).flatMap(i => Seq.fill(4000 / i)(i.toLong))
    // deterministic shuffle: order by a multiplicative hash of (value,
    // occurrence index) so heavy keys are spread through the stream
    items.zipWithIndex
      .sortBy { case (v, ix) => (v * 2654435761L + ix * 40503L) % 999983 }
      .map(_._1)
  }

  private def summarize(parts: Int, k: Int): Map[Long, Long] = {
    graft.functions.Native.register(spark)
    import spark.implicits._
    val df = mkStream().toDF("h").repartition(parts)
    val rows = df.agg(expr(s"graft_heavyhitters(h, $k)").as("sk"))
      .selectExpr("explode(sk) AS e")
      .selectExpr("e.key AS key", "e.cnt AS cnt")
      .collect()
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("MG bounds hold for every retained key at 1, 4, and 32 partitions") {
    val stream = mkStream()
    val n = stream.length.toLong
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val k = 32
    for (parts <- Seq(1, 4, 32)) {
      val sk = summarize(parts, k)
      assert(sk.size <= k)
      sk.foreach { case (key, cnt) =>
        val t = truth(key)
        assert(cnt <= t, s"overcount at parts=$parts key=$key: $cnt > $t")
        assert(t - cnt <= n / (k + 1) + 1,
          s"slack violated at parts=$parts key=$key: $t - $cnt")
      }
      // retention: every key with true > n/(k+1) must be present
      truth.filter { case (_, t) => t * (k + 1) > n }.keys.foreach { key =>
        assert(sk.contains(key),
          s"heavy key $key missing from sketch at parts=$parts")
      }
    }
  }

  test("audit query flags are all 1 and the heavy set is non-empty") {
    val rows = graft.llm.TextAnalysis.heavyHittersAudit(spark, sfTiny).collect()
    assert(rows.nonEmpty, "fixture has no heavy tokens — audit is vacuous")
    rows.foreach { r =>
      assert(r.getAs[Int]("in_sketch") === 1)
      assert(r.getAs[Int]("no_overcount") === 1)
      assert(r.getAs[Int]("slack_ok") === 1)
    }
  }

  test("MG aggregate runs under streaming complete-mode aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    graft.functions.Native.register(spark)
    implicit val sq = spark.sqlContext
    val stream = mkStream().take(4000)
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("h")
      .agg(expr("graft_heavyhitters(h, 16)").as("sk"))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches: state must merge across batches
      in.addData(stream.take(2000): _*)
      q.processAllAvailable()
      in.addData(stream.drop(2000): _*)
      q.processAllAvailable()
      val sk = spark.table("hh_stream")
        .selectExpr("explode(sk) AS e")
        .selectExpr("e.key AS key", "e.cnt AS cnt").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = stream.groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      val n = stream.length.toLong
      assert(sk.nonEmpty && sk.size <= 16)
      sk.foreach { case (k, cnt) =>
        assert(cnt <= truth(k), s"streaming overcount at $k")
        assert(truth(k) - cnt <= n / 17 + 1, s"streaming slack at $k")
      }
      truth.filter { case (_, t) => t * 17 > n }.keys.foreach { k =>
        assert(sk.contains(k), s"streaming heavy key $k missing")
      }
    } finally q.stop()
  }

  test("analysis-time rejection of bad arguments") {
    graft.functions.Native.register(spark)
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("h")
    intercept[Exception] {
      df.agg(expr("graft_heavyhitters(h, 0)")).collect()
    }
    intercept[Exception] {
      df.agg(expr("graft_heavyhitters(h, 100000)")).collect()
    }
  }
}
