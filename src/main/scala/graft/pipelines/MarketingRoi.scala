package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Cleaning, Metrics}

/** Pipeline 04 (reference `04_marketing_roi_etl.py`): composite-key
  * dedup (04:48), guarded-division campaign metrics (04:57-90), and the
  * weighted effectiveness score (04:93-96).
  *
  * Operators: P10 (composite, deterministic form), F4 guards, F10
  * arithmetic.
  *
  * Scale notes: the dedup is the only shuffle (window over
  * (campaign_id, date)); every metric is a codegen'd per-row projection.
  */
object MarketingRoi {

  def run(marketing: DataFrame): DataFrame =
    Cleaning.dedupByKeyDeterministic(
        Cleaning.requireNonNull(marketing, "campaign_id", "date"),
        Seq("campaign_id", "date"), Seq("event_id"))
      .withColumn("ctr", Metrics.ctr(col("clicks"), col("impressions")))
      .withColumn("conversion_rate",
        Metrics.conversionRate(col("conversions"), col("clicks")))
      .withColumn("cpc", Metrics.cpc(col("spend"), col("clicks")))
      .withColumn("cpa", Metrics.cpa(col("spend"), col("conversions")))
      .withColumn("roas", Metrics.roas(col("revenue_generated"), col("spend")))
      .withColumn("roi_pct", Metrics.roiPct(col("revenue_generated"), col("spend")))
      .withColumn("effectiveness_score",
        Metrics.effectivenessScore(col("ctr"), col("conversion_rate"), col("roas")))
      .withColumn("year", year(col("date")))
      .withColumn("month", month(col("date")))
      .withColumn("date", to_date(col("date")))
      .select("event_id", "campaign_id", "campaign_name", "channel", "date",
        "impressions", "clicks", "conversions", "spend", "revenue_generated",
        "ctr", "conversion_rate", "cpc", "cpa", "roas", "roi_pct",
        "effectiveness_score", "year", "month")
}
