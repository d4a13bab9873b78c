package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CM2 order-level margin marts (SURVEY §2.3/§2.4 A1+J1, reference
  * `silver_to_gold.py:499-628`): item→order rollup, freight enrichment
  * (left join + null-fill), channel-specific fee waterfall.
  *
  * Scale notes: the rollup is the only wide shuffle (hash partial+final on
  * order keys); the freight side is explicitly `broadcast()` — in the
  * reference's deployment freight is tiny relative to orders, and at
  * 100 TB a broadcast bound should be revisited per actual dim size (drop
  * the hint and let AQE decide if freight grows past ~100 MB). The
  * optional `dedupeFreight` pre-aggregation (J1b) collapses the many-side
  * BEFORE the join, which both fixes the fanout duplication and shrinks
  * the broadcast.
  */
object Cm2 {

  /** Freight side of the enrichment join: `(order_reference, cost,
    * 'shipped')` (`silver_to_gold.py:513`), optionally deduped to one row
    * per order (first cost by tracking number — deterministic).
    */
  private def freightSide(freight: DataFrame, cfg: DomainConfig): DataFrame = {
    val projected = freight.select(
      col("order_reference"), col("cost"), lit("shipped").as("freight_status"))
    if (cfg.dedupeFreight)
      projected.groupBy("order_reference").agg(
        min_by(col("cost"), col("cost")).as("cost"),
        first(col("freight_status")).as("freight_status"))
    else projected
  }

  /** The F12 predicate: the reference compares lowercase `"hilldun"`
    * against the emitted `"Hilldun"` literal → always false
    * (`silver_to_gold.py:279,535-543`). `fixHilldunCase` makes it behave
    * as evidently intended.
    */
  private def isHilldun(cfg: DomainConfig) =
    if (cfg.fixHilldunCase) lower(col("payment_source")) === "hilldun"
    else col("payment_source") === "hilldun"

  /** Joor order mart (`silver_to_gold.py:499-548`). */
  def joor(cm1: DataFrame, freight: DataFrame, cfg: DomainConfig): DataFrame = {
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "currency", "payment_source",
        "date_key", "channel_id", "country", "region")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        round(sum(col("net_revenue")), 2).as("net_revenue"),
        round(sum(col("unit_cost")), 2).as("production_cost"),
        round(sum(col("prod_com")), 2).as("production_comm"))

    val joined = rolled.join(
      broadcast(freightSide(freight, cfg)),
      rolled("order_no") === col("order_reference"), "left")

    val trxFees = when(isHilldun(cfg), lit(0.0))
      .otherwise(col("net_revenue") * lit(0.029))
    joined.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"), col("payment_source"),
      col("qty"), col("net_revenue"), col("production_cost"), col("production_comm"),
      coalesce(col("freight_status"), lit("not shipped yet")).as("freight_out_status"),
      lit("SGD").as("freight_currency"),
      (col("qty") * lit(3.0)).as("freight_in"),
      coalesce(col("cost"), lit(15.0)).as("freight_out"),
      lit("USD").as("trx_currency"),
      trxFees.as("trx_fees"),
      lit("USD").as("comm_currency"),
      lit(0.05).as("sales_comm"),
      lit("USD").as("insurance_currency"),
      when(isHilldun(cfg), col("net_revenue") * lit(0.02))
        .otherwise(lit(0.0)).as("insurance"),
      (col("net_revenue") - col("production_cost") - col("production_comm")
        - trxFees - (col("qty") * lit(3.0))
        - coalesce(col("cost"), lit(15.0))).as("cm2_amount"),
      col("channel_id"))
  }

  /** Shopify order mart (`silver_to_gold.py:550-590`) — no freight join;
    * the reference draws shipping status/cost randomly (deterministic
    * key-derived draws by default, F4).
    */
  def shopify(cm1: DataFrame, cfg: DomainConfig): DataFrame = {
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "country", "region", "date_key", "channel_id")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        round(sum(col("net_revenue")), 2).as("net_revenue"),
        round(sum(col("total_returns")), 2).as("total_returns"),
        round(sum(col("item_unit_cost")), 2).as("total_unit_cost"),
        round(sum(col("margin")), 2).as("cm1_amount"))
      .withColumn("currency", lit("SGD"))   // A2: constant through the agg

    val shippedDraw = cfg.draw(col("order_no"), "ship")
    val costDraw = cfg.draw(col("order_no"), "shipcost")
    rolled.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"),
      col("qty"), col("net_revenue"), col("total_returns"),
      lit("USD").as("cost_currency"),
      col("total_unit_cost"), col("cm1_amount"),
      when(shippedDraw < 0.7, lit("shipped"))
        .otherwise(lit("not shipped yet")).as("freight_out_status"),
      (col("qty") * lit(3.0)).as("freight_in"),
      when(shippedDraw < 0.7, lit(12.0) + (costDraw * lit(8.0)))
        .otherwise(lit(12.0)).as("freight_out"),
      lit("not shipped yet").as("return_status"),
      lit(8.0).as("freight_return"),
      lit(0.0).as("freight_income"),
      (col("net_revenue") * lit(0.029)).as("shopify_fees"),
      col("channel_id"))
      .withColumn("cm2_amount",
        col("cm1_amount") - col("freight_in") - col("freight_out") - lit(8.0)
          + col("freight_income") - col("shopify_fees"))
  }

  /** TikTok order mart (`silver_to_gold.py:592-628`) — freight join with a
    * 10.0 default, 5% platform trx fee, 8% sales commission rate column.
    */
  def tiktok(cm1: DataFrame, freight: DataFrame, cfg: DomainConfig): DataFrame = {
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "country", "region", "date_key", "channel_id")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        round(sum(col("net_revenue")), 2).as("net_revenue"),
        round(sum(col("item_unit_cost")), 2).as("production_cost"),
        round(sum(col("prod_com")), 2).as("production_comm"))
      .withColumn("currency", lit("SGD"))

    val joined = rolled.join(
      broadcast(freightSide(freight, cfg)),
      rolled("order_no") === col("order_reference"), "left")

    joined.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"),
      col("qty"), col("net_revenue"), col("production_cost"), col("production_comm"),
      lit("SGD").as("freight_currency"),
      (col("qty") * lit(3.0)).as("freight_in"),
      coalesce(col("cost"), lit(10.0)).as("freight_out"),
      lit("SGD").as("trx_currency"),
      (col("net_revenue") * lit(0.05)).as("trx_fees"),
      lit("SGD").as("comm_currency"),
      lit(0.08).as("sales_comm"),
      (col("net_revenue") - col("production_cost") - col("production_comm")
        - (col("qty") * lit(3.0)) - coalesce(col("cost"), lit(10.0))
        - (col("net_revenue") * lit(0.05))).as("cm2_amount"),
      col("channel_id"))
  }
}
