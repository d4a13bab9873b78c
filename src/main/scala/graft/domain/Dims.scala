package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Conformed dimensions + freight fact (reference `silver_to_gold.py:630-727`). */
object Dims {

  /** dim_channels (`silver_to_gold.py:709-715`). */
  def dimChannels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("joor", "Joor", "B2B", "Wholesale"),
      ("shopify", "Shopify", "DTC", "Direct-to-Consumer"),
      ("tiktok", "TikTok", "Livestream", "Social Commerce"))
      .toDF("channel_id", "channel_name", "channel_type", "description")
  }

  /** dim_date — the reference declares a full calendar DDL
    * (`silver_to_gold.py:111-121`) but hardcodes ONE stale wall-clock row
    * (`:634-641`). Built properly here: a generated span around the
    * injected clock via `sequence` + `explode` (distributed, no driver
    * loop; F11).
    */
  def dimDate(spark: SparkSession, cfg: DomainConfig, daysBack: Int = 365, daysFwd: Int = 30): DataFrame = {
    import spark.implicits._
    spark.range(1)
      .select(explode(sequence(
        date_sub(to_date(lit(cfg.asOf)), daysBack),
        date_add(to_date(lit(cfg.asOf)), daysFwd))).as("date"))
      .select(
        date_format($"date", "yyyyMMdd").as("date_key"),
        $"date",
        year($"date").as("year"),
        quarter($"date").as("quarter"),
        month($"date").as("month"),
        date_format($"date", "EEEE").as("day_of_week"),
        dayofweek($"date").isin(1, 7).cast("int").as("is_weekend"))
  }

  /** fact_freight (`silver_to_gold.py:719-727`): silver freight stamped
    * with the processing date_key and renamed to the conformed `order_no`.
    */
  def factFreight(silverFreight: DataFrame, cfg: DomainConfig): DataFrame =
    silverFreight.select(
      date_format(to_date(lit(cfg.asOf)), "yyyyMMdd").as("date_key"),
      col("tracking_number"),
      col("provider"),
      col("cost"),
      col("order_reference").as("order_no"),
      lit(cfg.asOf).as("created_at"))
}
