package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Stationary-distribution power method (`EventsStream.markovStationary`)
  * replayed imperatively: the r14 bounded-domain dispatch (≤64 event
  * types → the whole 4-round iteration runs as a driver loop over the
  * collected type²-bounded transition counts) must produce the EXACT
  * integer picomass vector of the distributed loop it replaces, and
  * both must equal a from-scratch replay of the oracle's arithmetic
  * (BIGINT (m·n_ab) DIV n_a inflow, absorbing states keep their own
  * mass). Any disagreement is a dispatch bug, not float noise — the
  * entire chain is integer until the final /1e12 display column.
  */
class MarkovStationarySpec extends SparkSpec {

  private val MR = 1000000000000L
  private val iters = 4

  /** (a, b, n_ab) from the same per-user lag the engine uses. */
  private def transRows: Seq[(String, String, Long)] = {
    val ev = spark.read.parquet(s"$sfTiny/events.parquet")
      .selectExpr("user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS ts_us", // NTZ via UTC session: order-preserving
        "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
    ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3).toList
      ordered.zip(ordered.drop(1))
    }.groupBy(p => p).map { case ((a, b), g) => (a, b, g.size.toLong) }.toSeq
  }

  private def replay(types: Seq[String],
      trans: Seq[(String, String, Long)]): Map[String, Long] = {
    val outTot = trans.groupBy(_._1).map { case (a, rs) => a -> rs.map(_._3).sum }
    var pi: Map[String, Long] =
      if (types.isEmpty) Map.empty else types.map(_ -> MR / types.length).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.HashMap.empty[String, Long]
      trans.foreach { case (a, b, nAb) =>
        inflow(b) = inflow.getOrElse(b, 0L) +
          Math.multiplyExact(pi(a), nAb) / outTot(a)
      }
      pi = pi.map { case (t, m) =>
        t -> (if (outTot.contains(t)) inflow.getOrElse(t, 0L)
              else inflow.getOrElse(t, 0L) + m)
      }
    }
    pi
  }

  test("driver dispatch and distributed loop both equal the imperative replay") {
    val types = spark.read.parquet(s"$sfTiny/events.parquet")
      .select("event_type").distinct().collect().map(_.getString(0)).toSeq.sorted
    assert(types.nonEmpty && types.length <= 64,
      "fixture must exercise the bounded-domain driver path")
    val expected = replay(types, transRows)
      .toSeq.sortBy { case (t, m) => (-m, t) }

    // engine path 1: the public query (dispatches to the driver loop here)
    val viaDispatch = EventsStream.markovStationary(spark, sfTiny)
      .select("event_type", "stationary_pico").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaDispatch == expected)

    // engine path 2: the distributed loop the dispatch replaces (>64-type shape)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = spark.read.parquet(s"$sfTiny/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("a"), col("event_type").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    val viaLoop = EventsStream.markovStationaryLoop(spark, sfTiny, trans)
      .select("event_type", "stationary_pico").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaLoop == expected)
  }
}
