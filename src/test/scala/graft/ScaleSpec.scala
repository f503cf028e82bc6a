package graft

import org.apache.spark.sql.functions._
import graft.ops.Scale

/** Skew-salting equivalence and bucketed-join exchange elimination. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg == direct groupBy aggregation") {
    val li = graft.io.Tables.lineitem(spark, sfTiny)
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Scale.saltedAgg(li, Seq("l_returnflag"), "l_quantity")
      .as[(String, Double, Long)].collect().toSet
    // integral quantities: sums exact regardless of combine order
    assert(salted == direct)
  }

  test("saltedJoin == plain join on a skewed key") {
    // skew: every row keyed to one of two values, 90% on one
    val large = (1 to 2000)
      .map(i => (if (i % 10 == 0) "cold" else "hot", i))
      .toDF("k", "v")
    val small = Seq(("hot", 1.5), ("cold", 2.5)).toDF("k", "w")
    val plain = large.join(small, Seq("k")).select("k", "v", "w")
      .as[(String, Int, Double)].collect().toSet
    val salted = Scale.saltedJoin(large, small, "k").select("k", "v", "w")
      .as[(String, Int, Double)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("bucketed tables join without an exchange on the bucketed sides") {
    val li = graft.io.Tables.table(spark, sfTiny, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = graft.io.Tables.table(spark, sfTiny, "orders")
      .select("o_orderkey", "o_totalprice")
    Scale.bucketedTable(li, "li_bkt", 4, "l_orderkey")
    Scale.bucketedTable(ord, "ord_bkt", 4, "o_orderkey")
    // force the sort-merge path (broadcast would bypass bucketing)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom pre-filter is selective and never drops a true match") {
    graft.functions.Native.register(spark)
    graft.io.Tables.orders(spark, sfTiny)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").createOrReplaceTempView("ss_dim")
    graft.io.Tables.lineitem(spark, sfTiny)
      .select("l_orderkey").createOrReplaceTempView("ss_fact")
    val counts = spark.sql(
      """WITH bloom AS (SELECT graft_bloom_agg(xxhash64(o_orderkey),
             CAST(100000 AS BIGINT), CAST(800000 AS BIGINT)) AS bf
           FROM ss_dim)
         SELECT count(*) AS total,
           sum(CASE WHEN graft_might_contain((SELECT bf FROM bloom),
             xxhash64(l_orderkey)) THEN 1 ELSE 0 END) AS passed,
           sum(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM ss_dim)
             THEN 1 ELSE 0 END) AS true_matches
         FROM ss_fact""").collect()(0)
    val (total, passed, trueMatches) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    // no false negatives — a bloom filter's defining guarantee
    assert(passed >= trueMatches)
    // and it must actually shed rows, or the pre-filter is pointless
    assert(passed < total,
      s"bloom passed everything: $passed of $total (true=$trueMatches)")
  }

  test("adaptive salting picks the right branch and both branches agree") {
    import spark.implicits._
    import graft.ops.Scale
    // balanced: 3 keys × 10 rows → ratio 1, plain branch
    val balanced = (1 to 30).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val (b, bSalted) = Scale.adaptiveSaltedAgg(balanced, Seq("k"), "v", 2.0)
    assert(!bSalted, "balanced keys must not trigger salting")
    // skewed: one key holds 97% of rows → salted branch
    val skewed = ((1 to 97).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("b", 2L), ("c", 3L))).toDF("k", "v")
    val (sk, skSalted) = Scale.adaptiveSaltedAgg(skewed, Seq("k"), "v", 2.0)
    assert(skSalted, "a 97%-hot key must trigger salting")
    // and the salted result equals the plain aggregation bit-for-bit
    val plain = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("sum_v"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = sk.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == plain)
  }

  test("z-order buckets confine BOTH key dimensions") {
    // top 10 z-bits = top 5 bits of each 16-bit dim → within a bucket
    // each dimension spans < 2^11. This is the 2-D pruning property;
    // a plain single-key sort would leave the other dim's span ~full.
    val rows = graft.ops.Scale.zorderLocality(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, xs, ys) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(xs < 2048, s"bucket $b x_span $xs")
      assert(ys < 2048, s"bucket $b y_span $ys")
    }
  }

  test("a selective dim filter dynamically prunes fact partitions at runtime") {
    // Dynamic Partition Pruning: the fact side is partitioned by
    // order year; the dim side's filter is only known at runtime
    // (a join, not a literal the optimizer could fold into a static
    // partition filter), so the scan must carry a dynamicpruning
    // subquery that narrows the partitions from the broadcast dim —
    // at 100 TB the difference between scanning one year and seven.
    val zone = java.nio.file.Files
      .createTempDirectory("dpp_zone").toString
    graft.io.Tables.orders(spark, sfTiny)
      .selectExpr("o_orderkey", "o_totalprice",
        "year(CAST(o_orderdate AS DATE)) AS o_year")
      .write.mode("overwrite").partitionBy("o_year").parquet(zone)
    val fact = spark.read.parquet(zone)
    val nYears = fact.select("o_year").distinct().count()
    assert(nYears > 1, "fixture must span years for pruning to mean anything")
    // independent dim with a NON-partition filter column: the
    // optimizer cannot fold `label = 'keep'` into a static partition
    // predicate on the fact, so pruning must happen at runtime
    val pickYear = fact.agg(max("o_year")).head.getInt(0)
    val years = fact.select("o_year").distinct()
      .as[Int].collect().toSeq
    val dimZone = java.nio.file.Files
      .createTempDirectory("dpp_dim").toString
    years.map(y => (y, if (y == pickYear) "keep" else "drop"))
      .toDF("o_year", "label")
      .write.mode("overwrite").parquet(dimZone)
    val dim = spark.read.parquet(dimZone)
    val q = fact.join(dim.filter(col("label") === "keep"), Seq("o_year"))
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in plan:\n${plan.take(2000)}")
    // and the pruned result equals the statically-filtered truth
    val expect = fact.filter(col("o_year") === pickYear)
      .agg(count(lit(1)), sum("o_totalprice")).head
    assert(q.head == expect)
  }
}
