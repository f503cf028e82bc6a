package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column formulas (SURVEY.md §2.7 F-group), re-expressed from
  * the reference ETL scripts. All pure `Column` expressions — codegen'd
  * by Catalyst, no UDFs (reference has zero UDFs, SURVEY §2.12).
  */
object Metrics {

  /** 01:77 — line_total = quantity * unit_price. */
  def lineTotal(quantity: Column, unitPrice: Column): Column =
    quantity * unitPrice

  /** 01:82 — profit = line_total * margin_percentage / 100. */
  def profit(lineTotal: Column, marginPct: Column): Column =
    lineTotal * marginPct / 100.0

  /** 03:83-96 — keyword sentiment normalizer (when/lower/isin chains;
    * NOT ML). Unmatched words → "Unknown" (03:87). */
  def sentimentNormalized(sentiment: Column): Column = {
    val s = lower(sentiment)
    when(s.isin("positive", "good", "excellent"), "Positive")
      .when(s.isin("negative", "bad", "poor"), "Negative")
      .when(s.isin("neutral", "average", "okay"), "Neutral")
      .otherwise("Unknown")
  }

  /** 03:89-96 — sentiment score ladder over the normalized label. */
  def sentimentScore(sentimentNorm: Column): Column =
    when(sentimentNorm === "Positive", 1)
      .when(sentimentNorm === "Negative", -1)
      .otherwise(0)

  /** 04:57-78 — guarded ratios (zero denominator → 0.0, per the
    * reference's when(denom > 0, num/denom).otherwise(0) guards). */
  def guardedDiv(num: Column, denom: Column): Column =
    when(denom > 0, num / denom).otherwise(0.0)

  /** 04:57-59 — click-through rate %. */
  def ctr(clicks: Column, impressions: Column): Column =
    guardedDiv(clicks * 100.0, impressions)

  /** 04:65 — conversion rate %. */
  def conversionRate(conversions: Column, clicks: Column): Column =
    guardedDiv(conversions * 100.0, clicks)

  /** 04:71 — cost per click. */
  def cpc(spend: Column, clicks: Column): Column = guardedDiv(spend, clicks)

  /** 04:74-78 — cost per acquisition. */
  def cpa(spend: Column, conversions: Column): Column =
    guardedDiv(spend, conversions)

  /** 04:83 — return on ad spend. */
  def roas(revenue: Column, spend: Column): Column =
    guardedDiv(revenue, spend)

  /** 04:86-90 — ROI %. */
  def roiPct(revenue: Column, spend: Column): Column =
    guardedDiv((revenue - spend) * 100.0, spend)

  /** 04:93-96 — weighted campaign effectiveness score. */
  def effectivenessScore(ctr: Column, convRate: Column, roas: Column): Column =
    ctr * 0.3 + convRate * 0.3 + roas * 0.4

  /** 05:82-84 — stock/damage variance (new − old, null-safe via
    * coalesce(x, 0) — F7/F8). */
  def variance(newVal: Column, oldVal: Column): Column =
    coalesce(newVal, lit(0)) - coalesce(oldVal, lit(0))

  /** 05:85 — discrepancy flag. */
  def hasDiscrepancy(stockVar: Column, damagedVar: Column): Column =
    when(stockVar =!= 0 || damagedVar =!= 0, 1).otherwise(0)

  /** 05:91-95 — severity ladder over |stock variance|. */
  def severity(stockVar: Column): Column =
    when(abs(stockVar) > 100, "Critical")
      .when(abs(stockVar) > 50, "High")
      .when(abs(stockVar) > 10, "Medium")
      .otherwise("Low")

  /** §2.10 — severity as an ordinal for max_severity aggregation
    * (Critical>High>Medium>Low; lexicographic max would be wrong). */
  def severityOrdinal(severity: Column): Column =
    when(severity === "Critical", 4)
      .when(severity === "High", 3)
      .when(severity === "Medium", 2)
      .otherwise(1)

  /** Inverse of [[severityOrdinal]]. */
  def severityFromOrdinal(ord: Column): Column =
    when(ord === 4, "Critical")
      .when(ord === 3, "High")
      .when(ord === 2, "Medium")
      .otherwise("Low")

  /** 05:97-107 — financial impact of a discrepancy:
    * |stock_var| * price + |damaged_var| * price * 0.5, price null → 0. */
  def financialImpact(stockVar: Column, damagedVar: Column, price: Column): Column =
    abs(stockVar) * coalesce(price, lit(0.0)) +
      abs(damagedVar) * coalesce(price, lit(0.0)) * 0.5

  /** delivery_partner.sql:8 reconstruction — delivery duration hours
    * from exact epoch-second arithmetic (order-independent). */
  def deliveryHours(delivered: Column, orderDate: Column): Column =
    (unix_timestamp(delivered) - unix_timestamp(orderDate)) / 3600.0

  /** delivery_partner.sql:5-7 reconstruction — delayed iff delivered
    * after promised. */
  def isDelayed(delivered: Column, promised: Column): Column =
    when(delivered > promised, 1).otherwise(0)
}
