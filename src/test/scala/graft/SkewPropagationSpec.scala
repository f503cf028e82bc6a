package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew guard in label propagation (VERDICT r7 #5): a viral near-dup
  * hub — one doc matched by ~10^5 others — must not concentrate the
  * per-round dst join onto one reducer. The guard splits the static
  * edge relation by dst degree once; hot keys (bounded at maxHot) join
  * their ≤ maxHot label rows via broadcast, map-side, so the hub's
  * edges keep their even scan partitioning instead of hashing onto the
  * hub key.
  *
  * All joins here run with broadcast thresholds forced to -1, so the
  * even spread is structural (the explicit broadcast of the bounded hot
  * relation), not a small-fixture stats accident.
  */
class SkewPropagationSpec extends SparkSpec {

  private val nSpokes = 100000L

  /** Star pairs: hub 0 — spoke i, i in [1, nSpokes]. */
  private def starPairs: DataFrame =
    spark.range(1, nSpokes + 1)
      .selectExpr("CAST(0 AS BIGINT) AS doc_a", "id AS doc_b")

  private def symmetrized(pairs: DataFrame): DataFrame =
    pairs.toDF("doc_a", "doc_b")
      .union(pairs.toDF("doc_a", "doc_b").select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")

  private def partitionSizes(df: DataFrame): Seq[Long] =
    df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().toSeq

  /** Force thresholds to -1 AND switch off AQE's small-partition
    * coalescing: at fixture scale AQE happily merges every post-shuffle
    * partition into one (they are all far below the 64 MB advisory
    * size), which would make partition counts reflect data volume, not
    * the shuffle key distribution this spec is about. At real scale the
    * hub partition is the one too BIG to coalesce — the exact opposite
    * regime. */
  private def withNoAutoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = (keys :+ "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("star-graph propagation step spreads the hub's edges evenly") {
    withNoAutoBroadcast {
      val edges = symmetrized(starPairs)
      val labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id"))
        .transform(graft.ops.Checkpoints.cut)
      val (cold, hot, hotKeys) =
        graft.llm.Dedup.splitByHotDst(edges, hotDegreeThreshold = 1000, maxHot = 8)
      // The hub (and only the hub) is detected as hot.
      assert(hotKeys.collect().map(_.getLong(0)).toSeq === Seq(0L))
      assert(hot.count() === nSpokes)     // all i -> 0 edges
      assert(cold.count() === nSpokes)    // all 0 -> i edges

      // Guarded step: hot branch is a broadcast join in the plan...
      val step = graft.llm.Dedup.propagateOnce(cold, hot, hotKeys, labels)
      assert(step.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // ...and no partition holds a hub-sized clump.
      val guarded = partitionSizes(step)
      assert(guarded.sum === 2 * nSpokes)
      assert(guarded.max <= 50000L,
        s"straggler partition under the guard: ${guarded.max} rows")

      // Contrast: the unguarded dst join concentrates the hub key.
      val unguarded = partitionSizes(
        edges.join(labels, edges("dst") === labels("doc_id"))
          .select(edges("src").as("doc_id"), col("cluster_id")))
      assert(unguarded.max >= nSpokes,
        s"expected the hub's $nSpokes rows on one reducer, max=${unguarded.max}")
    }
  }

  test("star graph converges to the hub label through the guarded path") {
    withNoAutoBroadcast {
      val labels = graft.llm.Dedup.propagateLabels(
        starPairs, hotDegreeThreshold = 1000, maxHot = 8)
      assert(labels.agg(countDistinct("cluster_id")).head.getLong(0) === 1L)
      assert(labels.agg(max("cluster_id")).head.getLong(0) === 0L)
      assert(labels.count() === nSpokes + 1)
    }
  }

  test("guard is inert on an unskewed graph (no hot keys, same fixpoint)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val (cold, hot, hotKeys) =
      graft.llm.Dedup.splitByHotDst(symmetrized(pairs), 1000, 8)
    assert(hotKeys.count() === 0)
    assert(hot.count() === 0)
    assert(cold.count() === 6)
    val labels = graft.llm.Dedup.propagateLabels(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
