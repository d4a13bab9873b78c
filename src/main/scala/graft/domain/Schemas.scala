package graft.domain

import org.apache.spark.sql.types._

/** Explicit schemas for the commerce domain (SURVEY §1).
  *
  * The reference infers bronze schemas per cycle (`spark.read.json`,
  * `bronze_to_silver_all_sources.py:26`) — a full extra pass over the data
  * and a nondeterminism source. Here every layer is pinned.
  *
  * Payload shapes from the raw generator
  * (`api_data_generator.py:60-116,126-155,162-190`); silver shapes from the
  * cleanse projections (`bronze_to_silver_all_sources.py:39-79`) and the
  * DDL fallbacks (`silver_to_gold.py:671-692`).
  */
object Schemas {

  /** Kafka→bronze envelope metadata (`kafka_fashion_consumer.py:60-69`). */
  val kafkaMetadata: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("stream_timestamp", StringType),
    StructField("bronze_timestamp", StringType)))

  /** Raw joor payload — note `price` is a STRING (messy by design,
    * `api_data_generator.py:64`).
    */
  val joorRaw: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("buyer", StringType),
    StructField("quantity", IntegerType),
    StructField("price", StringType),
    StructField("currency", StringType),
    StructField("payment", StringType),
    StructField("country", StringType),
    StructField("sku", StringType),
    StructField("product", StringType),
    StructField("date", StringType)))

  /** Raw shopify payload — `id` is an INT, `price` a formatted string
    * (`api_data_generator.py:82-94`).
    */
  val shopifyRaw: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("customer", StringType),
    StructField("email", StringType),
    StructField("quantity", IntegerType),
    StructField("price", StringType),
    StructField("country", StringType),
    StructField("sku", StringType),
    StructField("product", StringType),
    StructField("payment", StringType),
    StructField("status", StringType),
    StructField("created_at", StringType)))

  /** Raw tiktok payload — money in `price_cents`, epoch-seconds timestamp
    * (`api_data_generator.py:104-116`).
    */
  val tiktokRaw: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("buyer", StringType),
    StructField("quantity", IntegerType),
    StructField("price_cents", IntegerType),
    StructField("currency", StringType),
    StructField("country", StringType),
    StructField("sku", StringType),
    StructField("product", StringType),
    StructField("live_stream", BooleanType),
    StructField("creator", StringType),
    StructField("timestamp", LongType)))

  /** Raw freight payload — 3 provider tracking formats, unit-suffixed
    * weight string (`api_data_generator.py:126-155`).
    */
  val freightRaw: StructType = StructType(Seq(
    StructField("tracking", StringType),
    StructField("cost", DoubleType),
    StructField("currency", StringType),
    StructField("status", StringType),
    StructField("weight", StringType),
    StructField("provider", StringType),
    StructField("order_ref", StringType)))

  /** Raw gsheets payload — 2-D string array with a header row
    * (`api_data_generator.py:162-190`).
    */
  val gsheetsRaw: StructType = StructType(Seq(
    StructField("sheet_name", StringType),
    StructField("sheet_data", ArrayType(ArrayType(StringType)))))

  /** Bronze envelope around a given payload schema. */
  def bronzeEnvelope(payload: StructType): StructType = StructType(Seq(
    StructField("raw_api_data", payload),
    StructField("kafka_metadata", kafkaMetadata)))

  // ── Silver (typed, flat — `bronze_to_silver_all_sources.py:39-79`) ──

  val silverJoor: StructType = StructType.fromDDL(
    "order_id string, buyer string, price double, quantity int, sku string")
  val silverShopify: StructType = StructType.fromDDL(
    "order_id string, customer_name string, price double, quantity int, sku string")
  val silverTiktok: StructType = StructType.fromDDL(
    "order_id string, buyer_name string, price double, quantity int, sku string")
  val silverFreight: StructType = StructType.fromDDL(
    "tracking_number string, provider string, cost double, order_reference string")
  val silverGsheets: StructType = StructType(Seq(
    StructField("sheet_name", StringType),
    StructField("raw_data", ArrayType(ArrayType(StringType)))))

  /** Topic names (`docker-compose.yml:156-160`). */
  val topics: Map[String, String] = Map(
    "joor_orders" -> "raw-joor-orders",
    "shopify_orders" -> "raw-shopify-orders",
    "tiktok_orders" -> "raw-tiktok-orders",
    "freight_data" -> "raw-freight-data",
    "gsheets_data" -> "raw-gsheets-data")
}
