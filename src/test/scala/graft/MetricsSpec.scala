package graft

import org.apache.spark.sql.functions._
import graft.ops.Metrics

/** Unit truth tables for the derived-column formulas (SURVEY §5.2):
  * sentiment normalizer (03:83-96), severity ladder (05:91-95),
  * guarded divisions (04:57-95), variance null handling (05:82-84). */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("sentiment normalizer truth table incl. case-folding and Unknown") {
    val rows = Seq("Positive", "GOOD", "excellent", "negative", "Bad", "poor",
      "NEUTRAL", "average", "okay", "broken", "")
      .toDF("sentiment")
      .select(Metrics.sentimentNormalized(col("sentiment")).as("n"))
      .as[String].collect().toSeq
    assert(rows == Seq("Positive", "Positive", "Positive", "Negative",
      "Negative", "Negative", "Neutral", "Neutral", "Neutral",
      "Unknown", "Unknown"))
  }

  test("sentiment score ladder") {
    val got = Seq("Positive", "Negative", "Neutral", "Unknown").toDF("s")
      .select(Metrics.sentimentScore(col("s")).as("v")).as[Int].collect().toSeq
    assert(got == Seq(1, -1, 0, 0))
  }

  test("severity ladder thresholds are strict (>10, >50, >100) on |variance|") {
    val got = Seq(0, 10, 11, -11, 50, 51, -51, 100, 101, -101).toDF("v")
      .select(Metrics.severity(col("v")).as("s")).as[String].collect().toSeq
    assert(got == Seq("Low", "Low", "Medium", "Medium", "Medium", "High",
      "High", "High", "Critical", "Critical"))
  }

  test("severity ordinal round-trips and orders Critical > High > Medium > Low") {
    val ord = Seq("Low", "Medium", "High", "Critical").toDF("s")
      .select(Metrics.severityOrdinal(col("s")).as("o")).as[Int].collect().toSeq
    assert(ord == Seq(1, 2, 3, 4))
    val back = Seq(1, 2, 3, 4).toDF("o")
      .select(Metrics.severityFromOrdinal(col("o")).as("s")).as[String].collect().toSeq
    assert(back == Seq("Low", "Medium", "High", "Critical"))
  }

  test("guarded divisions return 0.0 on zero denominators (04:57-95)") {
    val df = Seq((0, 0, 0.0, 0.0)).toDF("clicks", "impressions", "spend", "revenue")
    val r = df.select(
      Metrics.ctr(col("clicks"), col("impressions")).as("ctr"),
      Metrics.conversionRate(lit(5), col("clicks")).as("cr"),
      Metrics.cpc(col("spend"), col("clicks")).as("cpc"),
      Metrics.cpa(col("spend"), lit(0)).as("cpa"),
      Metrics.roas(col("revenue"), col("spend")).as("roas"),
      Metrics.roiPct(col("revenue"), col("spend")).as("roi"))
      .first()
    (0 until 6).foreach(i => assert(r.getDouble(i) == 0.0, s"col $i"))
  }

  test("variance: coalesce(null,0) on either side; antisymmetry") {
    val df = Seq(
      (Some(5), Some(3)), (None, Some(3)), (Some(5), None),
      (Option.empty[Int], Option.empty[Int]))
      .toDF("nw", "old")
    val v = df.select(Metrics.variance(col("nw"), col("old")).as("v"))
      .as[Int].collect().toSeq
    assert(v == Seq(2, -3, 5, 0))
    val anti = df.select(
      (Metrics.variance(col("nw"), col("old"))
        + Metrics.variance(col("old"), col("nw"))).as("z"))
      .as[Int].collect().toSeq
    assert(anti.forall(_ == 0))
  }

  test("has_discrepancy iff any variance nonzero (05:85)") {
    val got = Seq((0, 0), (1, 0), (0, -1), (2, 3)).toDF("sv", "dv")
      .select(Metrics.hasDiscrepancy(col("sv"), col("dv")).as("f"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 1, 1, 1))
  }

  test("delivery delay flag") {
    val df = Seq(("2024-01-02 00:00:01", "2024-01-02 00:00:00"),
      ("2024-01-01 23:59:59", "2024-01-02 00:00:00"),
      ("2024-01-02 00:00:00", "2024-01-02 00:00:00"))
      .toDF("delivered", "promised")
      .select(Metrics.isDelayed(to_timestamp(col("delivered")),
        to_timestamp(col("promised"))).as("d"))
    assert(df.as[Int].collect().toSeq == Seq(1, 0, 0))
  }
}
