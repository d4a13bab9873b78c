package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The gold analytical query: `exec_daily_kpi` (reference
  * `scripts/sql/.sql:3-26`) as a Spark DataFrame program — 3-way UNION ALL
  * over the CM2 marts on the 7 shared columns, then the day × channel ×
  * country × region KPI aggregate with ratio KPIs, newest day first.
  *
  * Scale notes: one hash-aggregate shuffle; `countDistinct(order_no)` is
  * exact (the reference's contract). order_no is unique within a channel's
  * mart, so at extreme scale the same result is available shuffle-free as
  * `count(*)` per group — kept as distinct-count to preserve the query's
  * semantics under the reference's own duplication behaviors (§2.8).
  */
object Kpi {

  private val shared = Seq(
    "date_key", "order_no", "net_revenue", "cm2_amount",
    "channel_id", "country", "region")

  /** U1: unify the three marts by name (`scripts/sql/.sql:18-22`). */
  def unionCm2(joorCm2: DataFrame, shopifyCm2: DataFrame, tiktokCm2: DataFrame): DataFrame = {
    val cols = shared.map(col)
    joorCm2.select(cols: _*)
      .unionByName(shopifyCm2.select(cols: _*))
      .unionByName(tiktokCm2.select(cols: _*))
  }

  /** A5+F13: the KPI view body (`scripts/sql/.sql:4-26`).
    *
    * Money follows the [[graft.queries.Exact]] decimal discipline (the
    * reference's gold layer types money as Decimal(10,2),
    * `silver_to_gold.py:138-143`): each order's money is snapped to cents
    * at the aggregate boundary and summed as exact decimals, so the
    * result is independent of partial-aggregation order — `sum(double)`
    * drifts with accumulation order and can never hash-match an oracle.
    * Ratio KPIs are unrounded double divisions of exact operands (the
    * oracle-portable form of the reference's `round(x, 2)`).
    */
  def execDailyKpi(unioned: DataFrame): DataFrame = {
    import graft.queries.Exact.{cents, dec2}
    unioned
      .groupBy(col("date_key"), col("channel_id"), col("country"), col("region"))
      .agg(
        cents(sum(dec2(col("net_revenue")))).as("total_revenue"),
        cents(sum(dec2(col("cm2_amount")))).as("net_margin"),
        countDistinct(col("order_no")).as("total_orders"))
      .select(
        col("date_key"), col("channel_id"), col("country"), col("region"),
        to_date(col("date_key"), "yyyyMMdd").as("date"),
        col("total_revenue"), col("net_margin"), col("total_orders"),
        (col("total_revenue") / col("total_orders")).as("avg_order_value"),
        (col("net_margin") / col("total_revenue") * 100.0).as("margin_percentage"))
      .orderBy(desc("date_key"))
  }
}
