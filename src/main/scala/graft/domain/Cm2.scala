package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CM2 order-level margin marts (SURVEY §2.3/§2.4 A1+J1, reference
  * `silver_to_gold.py:499-628`): item→order rollup, freight enrichment
  * (left join + null-fill), channel-specific fee waterfall.
  *
  * Money follows the [[graft.queries.Exact]] decimal discipline (the
  * reference's gold layer types money as Decimal(10,2),
  * `silver_to_gold.py:138-143`): each money line of the waterfall —
  * revenue, costs, fees, freight — is snapped to cents as an exact
  * decimal, and `cm2_amount` is the exact decimal difference of those
  * lines. Raw double subtraction here would produce genuine half-cent
  * ties (a 2-dp revenue × a 2-dp rate is exactly x.xxx5 whenever the
  * cents digit is odd) that no two engines round alike; decimal math
  * makes the mart bit-reproducible anywhere, which is what lets the
  * flagship KPI carry a DuckDB hash gate ([[DomainOracle]]).
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
    import graft.queries.Exact.{dec2, dec4}
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "currency", "payment_source",
        "date_key", "channel_id", "country", "region")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        dec2(sum(col("net_revenue"))).as("net_d2"),
        dec2(sum(col("unit_cost"))).as("pc_d2"),
        dec2(sum(col("prod_com"))).as("pcm_d2"))

    // WIRED advisor site (flag `spark.graft.advisor.arm`): the hand plan
    // keeps the explicit broadcast hint; armed, PlannedJoin prices the
    // left join and executes its own verdict (at reference scale it
    // agrees — broadcast_b; at a freight side past the threshold it
    // would shuffle/salt instead of over-broadcasting, the "revisit the
    // bound per actual dim size" note above made mechanical)
    val fSide = freightSide(freight, cfg)
    val joined = graft.operators.Advisor.join("cm2_joor_freight",
      "broadcast_b", rolled,
      fSide.withColumnRenamed("order_reference", "order_no"),
      Seq("order_no"), "left") {
      rolled.join(broadcast(fSide),
        rolled("order_no") === col("order_reference"), "left")
    }

    val trxD2 = when(isHilldun(cfg), dec2(lit(0.0)))
      .otherwise(dec2(col("net_d2") * dec4(lit(0.029))))
    val fiD2 = dec2(col("qty") * lit(3.0))
    val foD2 = dec2(coalesce(col("cost"), lit(15.0)))
    joined.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"), col("payment_source"),
      col("qty"),
      col("net_d2").cast("double").as("net_revenue"),
      col("pc_d2").cast("double").as("production_cost"),
      col("pcm_d2").cast("double").as("production_comm"),
      coalesce(col("freight_status"), lit("not shipped yet")).as("freight_out_status"),
      lit("SGD").as("freight_currency"),
      fiD2.cast("double").as("freight_in"),
      foD2.cast("double").as("freight_out"),
      lit("USD").as("trx_currency"),
      trxD2.cast("double").as("trx_fees"),
      lit("USD").as("comm_currency"),
      lit(0.05).as("sales_comm"),
      lit("USD").as("insurance_currency"),
      when(isHilldun(cfg), dec2(col("net_d2") * dec4(lit(0.02))))
        .otherwise(dec2(lit(0.0))).cast("double").as("insurance"),
      (col("net_d2") - col("pc_d2") - col("pcm_d2")
        - trxD2 - fiD2 - foD2).cast("double").as("cm2_amount"),
      col("channel_id"))
  }

  /** Shopify order mart (`silver_to_gold.py:550-590`) — no freight join;
    * the reference draws shipping status/cost randomly (deterministic
    * key-derived draws by default, F4).
    */
  def shopify(cm1: DataFrame, cfg: DomainConfig): DataFrame = {
    import graft.queries.Exact.{dec2, dec4}
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "country", "region", "date_key", "channel_id")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        dec2(sum(col("net_revenue"))).as("net_d2"),
        dec2(sum(col("total_returns"))).as("ret_d2"),
        dec2(sum(col("item_unit_cost"))).as("tuc_d2"),
        dec2(sum(col("margin"))).as("cm1_d2"))
      .withColumn("currency", lit("SGD"))   // A2: constant through the agg

    val shippedDraw = cfg.draw(col("order_no"), "ship")
    val costDraw = cfg.draw(col("order_no"), "shipcost")
    val fiD2 = dec2(col("qty") * lit(3.0))
    val foD2 = dec2(when(shippedDraw < 0.7, lit(12.0) + (costDraw * lit(8.0)))
      .otherwise(lit(12.0)))
    val feesD2 = dec2(col("net_d2") * dec4(lit(0.029)))
    rolled.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"),
      col("qty"),
      col("net_d2").cast("double").as("net_revenue"),
      col("ret_d2").cast("double").as("total_returns"),
      lit("USD").as("cost_currency"),
      col("tuc_d2").cast("double").as("total_unit_cost"),
      col("cm1_d2").cast("double").as("cm1_amount"),
      when(shippedDraw < 0.7, lit("shipped"))
        .otherwise(lit("not shipped yet")).as("freight_out_status"),
      fiD2.cast("double").as("freight_in"),
      foD2.cast("double").as("freight_out"),
      lit("not shipped yet").as("return_status"),
      lit(8.0).as("freight_return"),
      lit(0.0).as("freight_income"),
      feesD2.cast("double").as("shopify_fees"),
      col("channel_id"),
      (col("cm1_d2") - fiD2 - foD2 - dec2(lit(8.0))
        + dec2(lit(0.0)) - feesD2).cast("double").as("cm2_amount"))
  }

  /** TikTok order mart (`silver_to_gold.py:592-628`) — freight join with a
    * 10.0 default, 5% platform trx fee, 8% sales commission rate column.
    */
  def tiktok(cm1: DataFrame, freight: DataFrame, cfg: DomainConfig): DataFrame = {
    import graft.queries.Exact.{dec2, dec4}
    val rolled = cm1
      .groupBy("order_no", "buyer_name", "country", "region", "date_key", "channel_id")
      .agg(
        round(sum(col("qty")), 0).as("qty"),
        dec2(sum(col("net_revenue"))).as("net_d2"),
        dec2(sum(col("item_unit_cost"))).as("pc_d2"),
        dec2(sum(col("prod_com"))).as("pcm_d2"))
      .withColumn("currency", lit("SGD"))

    // same WIRED advisor site shape as the joor mart above
    val fSide = freightSide(freight, cfg)
    val joined = graft.operators.Advisor.join("cm2_tiktok_freight",
      "broadcast_b", rolled,
      fSide.withColumnRenamed("order_reference", "order_no"),
      Seq("order_no"), "left") {
      rolled.join(broadcast(fSide),
        rolled("order_no") === col("order_reference"), "left")
    }

    val fiD2 = dec2(col("qty") * lit(3.0))
    val foD2 = dec2(coalesce(col("cost"), lit(10.0)))
    val trxD2 = dec2(col("net_d2") * dec4(lit(0.05)))
    joined.select(
      col("date_key"), col("order_no"), col("buyer_name"),
      col("country"), col("region"), col("currency"),
      col("qty"),
      col("net_d2").cast("double").as("net_revenue"),
      col("pc_d2").cast("double").as("production_cost"),
      col("pcm_d2").cast("double").as("production_comm"),
      lit("SGD").as("freight_currency"),
      fiD2.cast("double").as("freight_in"),
      foD2.cast("double").as("freight_out"),
      lit("SGD").as("trx_currency"),
      trxD2.cast("double").as("trx_fees"),
      lit("SGD").as("comm_currency"),
      lit(0.08).as("sales_comm"),
      (col("net_d2") - col("pc_d2") - col("pcm_d2")
        - fiD2 - foD2 - trxD2).cast("double").as("cm2_amount"),
      col("channel_id"))
  }
}
