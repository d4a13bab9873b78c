package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, distributed re-expression of the reference's raw-data
  * generator (`api_data_generator.py:55-190`): same payload shapes, same
  * messiness traits (string prices, cents-vs-dollars, inconsistent
  * currency/country spellings, mixed timestamp suffixes, 2-D sheet
  * arrays), but seeded and Spark-native — `spark.range` + hash-derived
  * choices instead of a driver-side Faker loop, so generating 10⁹ rows is
  * as cheap per-row as 10².
  *
  * @param linkedFreight the reference draws `order_ref` as a random
  *   "ORDER-nnnnn" (`api_data_generator.py:154`) while joor order ids are
  *   uuids — its freight join can NEVER match and every order falls to the
  *   15.0/'not shipped yet' defaults. true (default) makes freight
  *   reference real joor order ids so the enrichment join is exercised;
  *   false reproduces the reference's disconnect.
  */
final case class GenSpec(
    joor: Int = 120,
    shopify: Int = 500,
    tiktok: Int = 300,
    freight: Int = 400,
    seed: Long = 42L,
    linkedFreight: Boolean = true,
    partitions: Int = 4)

object DataGen {

  // ── seeded primitives ──────────────────────────────────────────────

  /** uniform [0,1) from (seed, row id, tag) — stable across evaluations. */
  private def u(seed: Long, tag: String): Column =
    pmod(xxhash64(lit(seed), col("id"), lit(tag)), lit(1000000L))
      .cast(DoubleType) / 1000000.0

  private def uniform(seed: Long, tag: String, lo: Double, hi: Double): Column =
    lit(lo) + u(seed, tag) * lit(hi - lo)

  private def uniformInt(seed: Long, tag: String, lo: Int, hi: Int): Column =
    (lit(lo) + u(seed, tag) * lit(hi - lo + 1)).cast(IntegerType)

  private def choice(seed: Long, tag: String, opts: Seq[String]): Column =
    element_at(array(opts.map(lit): _*),
      (u(seed, tag) * opts.size).cast(IntegerType) + 1)

  /** uuid-shaped id from a hash (8-4-4-4-12 hex). */
  private def uuidIsh(seed: Long, tag: String, idCol: Column): Column = {
    val h = md5(concat_ws(":", lit(seed), idCol.cast(StringType), lit(tag)))
    concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  private def isoTs(base: Column, offsetSec: Column): Column =
    date_format(timestamp_seconds(unix_timestamp(base) + offsetSec.cast(LongType)),
      "yyyy-MM-dd'T'HH:mm:ss")

  // buyer-company tokens: geo-loaded prefixes exercise the joor rlike
  // chains; neutral ones fall to the weighted residual
  private val companyPrefixes = Seq(
    "London", "Manchester", "Toronto", "Berlin", "Paris", "Sydney",
    "Tokyo", "Singapore", "Milano", "Madrid", "Amsterdam", "Rio",
    "Guadalajara", "Cape Town", "Dubai", "Seoul", "Shanghai", "Mumbai",
    "EU", "Acme", "Vertex", "Nimbus", "Zephyr", "Cobalt", "Harbor",
    "Summit", "Atlas", "Meridian")
  private val companySuffixes = Seq(
    "Fashion House", "Trading Co", "Atelier", "Apparel", "Retail Group",
    "Styles", "Collective", "Boutique")
  private val firstNames = Seq(
    "Ava", "Noah", "Mia", "Liam", "Zoe", "Kai", "Ivy", "Leo", "Uma",
    "Max", "Nia", "Eli", "Sam", "Joy", "Rex")
  private val lastNames = Seq(
    "Tan", "Lee", "Garcia", "Smith", "Chen", "Patel", "Silva", "Kim",
    "Novak", "Moreau", "Haddad", "Okafor")
  private val products = Seq(
    "Relaxed Linen Blazer", "Cropped Denim Jacket", "Silk Slip Dress",
    "Oversized Knit Cardigan", "Pleated Midi Skirt", "Boxy Cotton Tee",
    "Wide-Leg Trousers", "Quilted Bomber", "Ribbed Tank", "Satin Camisole")

  private def range(spark: SparkSession, n: Int, parts: Int): DataFrame =
    spark.range(0, n, 1, parts).toDF("id")

  // ── per-source payloads (flat columns, messy) ──────────────────────

  /** joor B2B payload (`api_data_generator.py:60-72`): STRING price,
    * currency ∈ {USD, usd, $}, mixed ISO suffixes.
    */
  def joorPayload(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame = {
    val s = spec.seed
    range(spark, spec.joor, spec.partitions).select(
      col("id"),
      uuidIsh(s, "joor-oid", col("id")).as("order_id"),
      concat_ws(" ", choice(s, "jbuy1", companyPrefixes),
        choice(s, "jbuy2", companySuffixes)).as("buyer"),
      uniformInt(s, "jqty", 10, 100).as("quantity"),
      uniform(s, "jprice", 25, 200).cast(StringType).as("price"),
      choice(s, "jcur", Seq("USD", "usd", "$")).as("currency"),
      choice(s, "jpay", Seq("stripe", "hilldun", "net_30")).as("payment"),
      choice(s, "jcty", Seq("US", "USA", "United States")).as("country"),
      concat(lit("JOR-"), uniformInt(s, "jsku", 1000, 9999)).as("sku"),
      choice(s, "jprod", products).as("product"),
      concat(isoTs(lit(cfg.asOf), -uniformInt(s, "jdate", 0, 86400)),
        choice(s, "jsuf", Seq("Z", "+00:00", ""))).as("date"))
  }

  /** shopify DTC payload (`api_data_generator.py:80-94`): INT id,
    * "%.2f"-formatted string price.
    */
  def shopifyPayload(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame = {
    val s = spec.seed
    range(spark, spec.shopify, spec.partitions).select(
      col("id").as("_row_id"),
      (lit(100000L) + pmod(xxhash64(lit(s), col("id"), lit("sid")), lit(900000L))).as("id"),
      concat_ws(" ", choice(s, "sfn", firstNames), choice(s, "sln", lastNames)).as("customer"),
      concat(lower(choice(s, "sfn", firstNames)), lit("."),
        lower(choice(s, "sln", lastNames)), lit("@example.com")).as("email"),
      uniformInt(s, "sqty", 1, 5).as("quantity"),
      format_string("%.2f", uniform(s, "sprice", 20, 300)).as("price"),
      choice(s, "scty", Seq("US", "CA", "GB")).as("country"),
      concat(lit("SH-"), uniformInt(s, "ssku", 1000, 9999)).as("sku"),
      choice(s, "sprod", products).as("product"),
      choice(s, "spay", Seq("shopify_payments", "paypal", "stripe")).as("payment"),
      choice(s, "sstat", Seq("paid", "pending", "refunded")).as("status"),
      isoTs(lit(cfg.asOf), -uniformInt(s, "sdate", 0, 86400)).as("created_at"))
  }

  /** tiktok payload (`api_data_generator.py:102-116`): price in CENTS,
    * epoch-seconds timestamp, creator handle, live_stream flag.
    */
  def tiktokPayload(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame = {
    val s = spec.seed
    range(spark, spec.tiktok, spec.partitions).select(
      col("id"),
      concat(lit("TT"), (lit(10000000L) +
        pmod(xxhash64(lit(s), col("id"), lit("toid")), lit(90000000L)))).as("order_id"),
      concat_ws(" ", choice(s, "tfn", firstNames), choice(s, "tln", lastNames)).as("buyer"),
      uniformInt(s, "tqty", 1, 3).as("quantity"),
      uniformInt(s, "tcents", 1500, 10000).as("price_cents"),
      choice(s, "tcur", Seq("USD", "SGD")).as("currency"),
      choice(s, "tcty", Seq("US", "SG", "MY")).as("country"),
      concat(lit("TT-"), uniformInt(s, "tsku", 1000, 9999)).as("sku"),
      choice(s, "tprod", products).as("product"),
      (u(s, "tlive") < 0.5).as("live_stream"),
      concat(lit("@"), lower(choice(s, "tfn", firstNames)),
        uniformInt(s, "tcrn", 10, 99)).as("creator"),
      (unix_timestamp(lit(cfg.asOf)) - uniformInt(s, "tts", 0, 86400)).as("timestamp"))
  }

  /** freight payload (`api_data_generator.py:126-155`): 3 provider
    * tracking/cost/status/weight shapes; `order_ref` either linked to real
    * joor order ids or the reference's unmatched "ORDER-nnnnn".
    */
  def freightPayload(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame = {
    val s = spec.seed
    val provider = choice(s, "fprov", Seq("dhl", "ups", "easyship"))
    val hexDigits = (tag: String) => pmod(xxhash64(lit(s), col("id"), lit(tag)), lit(10L))
    def digits(tag: String, n: Int): Column =
      concat((1 to n).map(i => hexDigits(s"$tag$i").cast(StringType)): _*)
    val orderRef =
      if (spec.linkedFreight)
        // point at a real joor order id (same uuid derivation over a
        // random joor row index) — duplicates across freight rows are
        // intentional: they exercise the J1b fanout
        uuidIsh(s, "joor-oid",
          pmod(xxhash64(lit(s), col("id"), lit("flink")), lit(spec.joor.toLong)))
      else concat(lit("ORDER-"), uniformInt(s, "fref", 10000, 99999))
    range(spark, spec.freight, spec.partitions).select(
      col("id"),
      when(provider === "dhl", concat(lit("DHL"), digits("fd", 7)))
        .when(provider === "ups", concat(lit("1Z"), digits("fu", 11)))
        .otherwise(concat(lit("ES"), digits("fe", 6))).as("tracking"),
      when(provider === "dhl", uniform(s, "fc1", 15, 45))
        .when(provider === "ups", uniform(s, "fc2", 12, 38))
        .otherwise(uniform(s, "fc3", 8, 25)).as("cost"),
      when(provider === "easyship", "SGD").otherwise("USD").as("currency"),
      when(provider === "dhl", choice(s, "fs1", Seq("picked_up", "in_transit", "delivered")))
        .when(provider === "ups", choice(s, "fs2", Seq("origin", "transit", "delivered")))
        .otherwise(choice(s, "fs3", Seq("created", "shipped", "delivered"))).as("status"),
      when(provider === "ups",
        format_string("%.1f lbs", uniform(s, "fw2", 2, 10)))
        .when(provider === "dhl", format_string("%.1f kg", uniform(s, "fw1", 1, 5)))
        .otherwise(format_string("%.1f kg", uniform(s, "fw3", 0.5, 3))).as("weight"),
      provider.as("provider"),
      orderRef.as("order_ref"))
  }

  /** gsheets payload (`api_data_generator.py:162-190`): two sheets of 2-D
    * string arrays with a header row; cells mix "$12.34", "", "5.2%", raw
    * numbers, "m/d/Y" dates.
    */
  def gsheetsPayload(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame = {
    val s = spec.seed
    import spark.implicits._
    val production = Seq(("Production Tracker", 20, true)).toDF("sheet_name", "rows", "is_prod")
    val sales = Seq(("Sales Tracker", 15, false)).toDF("sheet_name", "rows", "is_prod")
    def cellU(tag: String, r: Column) =
      pmod(xxhash64(lit(s), col("sheet_name"), r, lit(tag)), lit(1000000L))
        .cast(DoubleType) / 1000000.0
    def cellChoice(tag: String, r: Column, opts: Seq[String]) =
      element_at(array(opts.map(lit): _*), (cellU(tag, r) * opts.size).cast(IntegerType) + 1)
    val prodHeader = array(lit("Style No"), lit("Cost USD"), lit("Factory"), lit("Date"))
    val salesHeader = array(lit("Buyer"), lit("Commission %"), lit("Payment"), lit("Country"))
    production.unionByName(sales).select(
      col("sheet_name"),
      concat(
        array(when(col("is_prod"), prodHeader).otherwise(salesHeader)),
        transform(sequence(lit(1), col("rows")), r =>
          when(col("is_prod"), array(
            concat(lit("STYLE-"), (lit(1000) + (cellU("gsty", r) * 9000).cast(IntegerType))),
            format_string("$%.2f", lit(10.0) + cellU("gcost", r) * 40.0),
            cellChoice("gfac", r, Seq("Factory A", "Factory B", "")),
            when(cellU("gdate", r) > 0.1,
              date_format(date_sub(to_date(lit(cfg.asOf)), (cellU("gdd", r) * 300).cast(IntegerType)), "M/d/yyyy"))
              .otherwise(lit(""))))
          .otherwise(array(
            concat_ws(" ", cellChoice("gb1", r, companyPrefixes), cellChoice("gb2", r, companySuffixes)),
            when(cellU("gcp", r) > 0.3, format_string("%.1f%%", lit(3.0) + cellU("gcv", r) * 5.0))
              .otherwise((lit(3.0) + cellU("gcv", r) * 5.0).cast(StringType)),
            cellChoice("gpay", r, Seq("Hilldun", "stripe", "NET30")),
            cellChoice("gcty", r, Seq("US", "USA", "United States")))))).as("sheet_data"))
  }

  // ── bronze envelope (`kafka_fashion_consumer.py:60-69`) ────────────

  /** Wrap a flat payload frame in the bronze envelope. `payloadCols` must
    * name the payload fields (order matters for the struct).
    */
  def toBronze(payload: DataFrame, topic: String, cfg: DomainConfig,
      payloadCols: Seq[String], rowId: String = "id"): DataFrame =
    payload.select(
      struct(payloadCols.map(col): _*).as("raw_api_data"),
      struct(
        lit(topic).as("topic"),
        pmod(col(rowId), lit(3)).cast(IntegerType).as("partition"),
        col(rowId).as("offset"),
        date_format(lit(cfg.asOf), "yyyy-MM-dd'T'HH:mm:ss").as("stream_timestamp"),
        concat(date_format(lit(cfg.asOf), "yyyy-MM-dd'T'HH:mm:ss"), lit("."),
          lpad(pmod(col(rowId), lit(1000000L)).cast(StringType), 6, "0")).as("bronze_timestamp")).as("kafka_metadata"))

  def bronzeJoor(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame =
    toBronze(joorPayload(spark, spec, cfg), Schemas.topics("joor_orders"), cfg,
      Seq("order_id", "buyer", "quantity", "price", "currency", "payment",
        "country", "sku", "product", "date"))

  def bronzeShopify(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame =
    toBronze(shopifyPayload(spark, spec, cfg), Schemas.topics("shopify_orders"), cfg,
      Seq("id", "customer", "email", "quantity", "price", "country", "sku",
        "product", "payment", "status", "created_at"), rowId = "_row_id")

  def bronzeTiktok(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame =
    toBronze(tiktokPayload(spark, spec, cfg), Schemas.topics("tiktok_orders"), cfg,
      Seq("order_id", "buyer", "quantity", "price_cents", "currency",
        "country", "sku", "product", "live_stream", "creator", "timestamp"))

  def bronzeFreight(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame =
    toBronze(freightPayload(spark, spec, cfg), Schemas.topics("freight_data"), cfg,
      Seq("tracking", "cost", "currency", "status", "weight", "provider", "order_ref"))

  def bronzeGsheets(spark: SparkSession, spec: GenSpec, cfg: DomainConfig): DataFrame =
    gsheetsPayload(spark, spec, cfg).select(
      struct(col("sheet_name"), col("sheet_data")).as("raw_api_data"),
      struct(
        lit(Schemas.topics("gsheets_data")).as("topic"),
        lit(0).as("partition"),
        monotonically_increasing_id().as("offset"),
        date_format(lit(cfg.asOf), "yyyy-MM-dd'T'HH:mm:ss").as("stream_timestamp"),
        date_format(lit(cfg.asOf), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("bronze_timestamp")).as("kafka_metadata"))
}
