package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Bronze→Silver cleansers (SURVEY §2.2 P3/P4/P5, reference
  * `bronze_to_silver_all_sources.py:39-79`): flatten the envelope, apply
  * the incremental watermark, then a null-safe typed projection per
  * source. Pure narrow transformations — no shuffle, fully codegen'd, and
  * the watermark predicate pushes into the file scan.
  */
object Cleanse {

  /** P1+P2: unnest `raw_api_data.*` + `kafka_metadata.bronze_timestamp`
    * and apply the high-watermark filter (ISO-8601 strings compare
    * lexicographically, which is order-correct).
    */
  def flatten(bronze: DataFrame, checkpoint: String = "1900-01-01"): DataFrame =
    bronze
      .select(col("raw_api_data.*"), col("kafka_metadata.bronze_timestamp"))
      .filter(col("bronze_timestamp") > lit(checkpoint))

  // try_cast, not cast: the reference ran with ANSI off, where a malformed
  // string price casts to NULL and falls into the coalesce default
  // (`bronze_to_silver_all_sources.py:43`); Spark 4's ANSI-on cast would
  // instead fail the job on the first messy row.
  private def str0(c: Column): Column = coalesce(c, lit(""))
  private def dbl0(c: Column): Column = coalesce(c.try_cast(DoubleType), lit(0.0))
  private def int0(c: Column): Column = coalesce(c.try_cast(IntegerType), lit(0))

  /** joor: string price → double (`bronze_to_silver_all_sources.py:39-47`). */
  def joor(flat: DataFrame): DataFrame =
    flat.select(
      str0(col("order_id")).as("order_id"),
      str0(col("buyer")).as("buyer"),
      dbl0(col("price")).as("price"),
      int0(col("quantity")).as("quantity"),
      str0(col("sku")).as("sku"),
      col("bronze_timestamp"))

  /** shopify: int id → string key (`bronze_to_silver_all_sources.py:48-56`). */
  def shopify(flat: DataFrame): DataFrame =
    flat.select(
      str0(col("id").cast("string")).as("order_id"),
      str0(col("customer")).as("customer_name"),
      dbl0(col("price")).as("price"),
      int0(col("quantity")).as("quantity"),
      str0(col("sku")).as("sku"),
      col("bronze_timestamp"))

  /** tiktok: cents → dollars ÷100 (`bronze_to_silver_all_sources.py:57-65`). */
  def tiktok(flat: DataFrame): DataFrame =
    flat.select(
      str0(col("order_id")).as("order_id"),
      str0(col("buyer")).as("buyer_name"),
      coalesce(col("price_cents").try_cast(DoubleType) / 100, lit(0.0)).as("price"),
      int0(col("quantity")).as("quantity"),
      str0(col("sku")).as("sku"),
      col("bronze_timestamp"))

  /** freight (`bronze_to_silver_all_sources.py:66-72`). */
  def freight(flat: DataFrame): DataFrame =
    flat.select(
      str0(col("tracking")).as("tracking_number"),
      str0(col("provider")).as("provider"),
      dbl0(col("cost")).as("cost"),
      str0(col("order_ref")).as("order_reference"),
      col("bronze_timestamp"))

  /** gsheets: payload passthrough (`bronze_to_silver_all_sources.py:73-79`). */
  def gsheets(flat: DataFrame): DataFrame =
    flat.select(
      str0(col("sheet_name")).as("sheet_name"),
      col("sheet_data").as("raw_data"),
      col("bronze_timestamp"))

  /** A3: next checkpoint = max bronze_timestamp
    * (`bronze_to_silver_all_sources.py:93`).
    */
  def nextCheckpoint(cleansed: DataFrame): Option[String] =
    Option(cleansed.agg(max(col("bronze_timestamp"))).first.getString(0))

  /** P5: silver shape = cleansed minus the watermark column
    * (`bronze_to_silver_all_sources.py:82`).
    */
  def toSilver(cleansed: DataFrame): DataFrame = cleansed.drop("bronze_timestamp")
}
