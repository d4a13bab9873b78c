package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Exact._

/** The reference's gold layer re-expressed over the driver testdata.
  *
  * Shape mirrors `exec_daily_kpi` (reference `scripts/sql/.sql:3-26`): a
  * per-order CM2 rollup (reference `silver_to_gold.py:504-509`), a 3-way
  * channel UNION ALL, then a day × channel × country × region KPI aggregate
  * with exact distinct-order counts and ratio KPIs.
  *
  * TPC-H mapping: order channel := o_orderstatus (O/F/P → the reference's
  * three sales channels), geography := customer → nation → region dims,
  * net_revenue := Σ l_extendedprice·(1−l_discount), and the reference's
  * margin waterfall (5% commission, 2.9% transaction fee, flat 15.0 freight
  * — `silver_to_gold.py:532-544`) applied per order. Money math follows the
  * [[Exact]] decimal discipline (reference gold money is Decimal(10,2),
  * `silver_to_gold.py:138`).
  *
  * Scale notes (100 TB): the only wide shuffles are the two hash aggregates
  * (partial+final, map-side combined by Spark) — lineitem is aggregated
  * BEFORE joining orders so the join input is one row per order, and all
  * dimension joins (channel, nation, region) are broadcast; nothing
  * re-shuffles the fact twice. countDistinct(order_no) is exact per the
  * reference's KPI contract (`scripts/sql/.sql:13`).
  */
object CommerceKpi {

  /** dim_channels analog (reference `silver_to_gold.py:710-715`, S4). */
  def dimChannels(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("O", 1, "wholesale", "B2B showroom channel"),
      ("F", 2, "shopify", "DTC web channel"),
      ("P", 3, "livestreaming", "Live commerce channel"))
      .toDF("o_orderstatus", "channel_id", "channel_name", "channel_desc")
  }

  /** Order-level margin mart: per-order rollup of lineitem + margin math.
    * One row per order_no; money rounded to cents exactly where the
    * reference rounds (`silver_to_gold.py:505-508`).
    */
  def cm2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)

    // Fact-side rollup first: shrinks lineitem to one row per order before
    // any join (at 100 TB this is the difference between joining 600B rows
    // and joining 150B).
    val perOrder = li
      .select($"l_orderkey",
        (dec2($"l_extendedprice") * dec4(lit(1.0) - $"l_discount")).as("item_net"),
        $"l_quantity")
      .groupBy($"l_orderkey")
      .agg(
        sum($"item_net").as("net_rev_exact"),
        round(sum($"l_quantity"), 0).as("qty"))

    // Geography dims are tiny → broadcast; orders at sf0.01 is small but at
    // scale it shuffles on o_orderkey to meet the rollup (AQE plans this).
    val geo = o
      .join(broadcast(dimChannels(spark)), Seq("o_orderstatus"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyyMMdd").as("date_key"),
        $"channel_id", $"channel_name",
        $"n_name".as("country"), $"r_name".as("region"))

    val netRev = dec2($"net_rev_exact")                // round to cents, exact
    val commission = dec2(netRev * dec4(lit(0.05)))    // silver_to_gold.py:532
    val trxFees    = dec2(netRev * dec4(lit(0.029)))   // silver_to_gold.py:535-541
    val freight    = dec2(lit(15.0))                   // silver_to_gold.py:533

    perOrder
      .join(geo, perOrder("l_orderkey") === geo("o_orderkey"))
      .select(
        $"l_orderkey".as("order_no"),
        $"date_key", $"channel_id", $"channel_name", $"country", $"region",
        $"qty",
        netRev.cast("double").as("net_revenue"),
        commission.cast("double").as("commission"),
        trxFees.cast("double").as("trx_fees"),
        freight.cast("double").as("freight_cost"),
        (netRev - commission - trxFees - freight).cast("double").as("cm2_amount"))
  }

  /** SQL text of the CM2 mart for DuckDB (same math, same aliases). */
  val cm2Sql: String = """
    WITH per_order AS (
      SELECT l_orderkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS net_rev_exact,
             round(sum(l_quantity), 0) AS qty
      FROM lineitem GROUP BY l_orderkey
    ), chan(o_orderstatus, channel_id, channel_name) AS (
      VALUES ('O', 1, 'wholesale'), ('F', 2, 'shopify'), ('P', 3, 'livestreaming')
    ), geo AS (
      SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y%m%d') AS date_key,
             ch.channel_id, ch.channel_name,
             n.n_name AS country, r.r_name AS region
      FROM orders o
      JOIN chan ch ON o.o_orderstatus = ch.o_orderstatus
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ), mart AS (
      SELECT p.l_orderkey AS order_no, g.date_key, g.channel_id, g.channel_name,
             g.country, g.region, p.qty,
             CAST(round(p.net_rev_exact, 2) AS DECIMAL(18,2)) AS net_rev,
             CAST(round(CAST(round(p.net_rev_exact, 2) AS DECIMAL(18,2)) * CAST(0.05 AS DECIMAL(18,4)), 2) AS DECIMAL(18,2)) AS comm,
             CAST(round(CAST(round(p.net_rev_exact, 2) AS DECIMAL(18,2)) * CAST(0.029 AS DECIMAL(18,4)), 2) AS DECIMAL(18,2)) AS trx,
             CAST(15.0 AS DECIMAL(18,2)) AS frt
      FROM per_order p JOIN geo g ON p.l_orderkey = g.o_orderkey
    )
    SELECT order_no, date_key, channel_id, channel_name, country, region, qty,
           CAST(net_rev AS DOUBLE) AS net_revenue,
           CAST(comm AS DOUBLE) AS commission,
           CAST(trx AS DOUBLE) AS trx_fees,
           CAST(frt AS DOUBLE) AS freight_cost,
           CAST(net_rev - comm - trx - frt AS DOUBLE) AS cm2_amount
    FROM mart"""

  /** Flagship: `exec_daily_kpi` analog (U1 + A5 + F13). The 3-way channel
    * UNION ALL of the reference is reproduced literally: the mart is split
    * by channel and re-unified with `unionByName` before the KPI aggregate.
    * Ratio KPIs are unrounded double divisions of exact operands (the
    * oracle-portable form of the reference's `round(x, 2)` —
    * `scripts/sql/.sql:14-15`; see [[Exact]]).
    */
  def execDailyKpi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialize the mart once before the 3-way split — the reference's
    // CM2 tables are STORED (ClickHouse) before the view unions them, and
    // without this Catalyst triples the whole mart subtree (measured: 3
    // lineitem scans, 21 exchanges → 1 scan of the cached mart)
    val mart = cm2(spark, dir).persist()
    val cols = Seq("date_key", "channel_name", "country", "region",
      "order_no", "net_revenue", "cm2_amount").map(col)
    // U1: union by name, robust to column order (scripts/sql/.sql:18-22)
    val unioned = mart.filter($"channel_id" === 1).select(cols: _*)
      .unionByName(mart.filter($"channel_id" === 2).select(cols: _*))
      .unionByName(mart.filter($"channel_id" === 3).select(cols: _*))

    unioned
      .groupBy($"date_key", $"channel_name", $"country", $"region")
      .agg(
        cents(sum(dec2($"net_revenue"))).as("total_revenue"),
        cents(sum(dec2($"cm2_amount"))).as("net_margin"),
        countDistinct($"order_no").as("total_orders"))
      .withColumn("avg_order_value", $"total_revenue" / $"total_orders")
      .withColumn("margin_percentage", $"net_margin" / $"total_revenue" * 100.0)
      .withColumn("date", to_date($"date_key", "yyyyMMdd"))  // F13
      .orderBy(desc("date_key"), $"channel_name", $"country", $"region")
  }

  val execDailyKpiSql: String = s"""
    WITH cm2 AS ($cm2Sql),
    unioned AS (
      SELECT date_key, channel_name, country, region, order_no, net_revenue, cm2_amount
      FROM cm2 WHERE channel_id = 1
      UNION ALL
      SELECT date_key, channel_name, country, region, order_no, net_revenue, cm2_amount
      FROM cm2 WHERE channel_id = 2
      UNION ALL
      SELECT date_key, channel_name, country, region, order_no, net_revenue, cm2_amount
      FROM cm2 WHERE channel_id = 3
    ), kpi AS (
      SELECT date_key, channel_name, country, region,
             CAST(CAST(sum(CAST(net_revenue AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
             CAST(CAST(sum(CAST(cm2_amount AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS net_margin,
             count(DISTINCT order_no) AS total_orders
      FROM unioned
      GROUP BY date_key, channel_name, country, region
    )
    SELECT date_key, channel_name, country, region, total_revenue, net_margin,
           total_orders,
           total_revenue / total_orders AS avg_order_value,
           net_margin / total_revenue * 100.0 AS margin_percentage,
           strptime(date_key, '%Y%m%d')::DATE AS "date"
    FROM kpi
    ORDER BY date_key DESC, channel_name, country, region"""

  val queries: Seq[Q] = Seq(
    Q("cm2_order_mart", cm2Sql)(cm2),
    Q("kpi_daily", execDailyKpiSql)(execDailyKpi))
}
