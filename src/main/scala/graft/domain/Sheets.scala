package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Typed normalization of the gsheets silver payload — the one source the
  * reference ingests and stores but never parses (silver `raw_data` is a
  * dead end: no downstream consumer exists in `silver_to_gold.py`).
  *
  * The 2-D string array (`api_data_generator.py:162-190`) becomes typed
  * rows: header row dropped, cells cleansed per the sheet's known messy
  * formats — `"$12.34"` money, `"5.2%"`-vs-bare-number commission rates,
  * `"m/d/yyyy"`-or-empty dates, empty-string factories → null.
  *
  * Shape: explode the row arrays (posexplode keeps provenance), then a
  * narrow per-cell cleanse projection — no shuffle, codegen'd, same P3
  * discipline as the five main sources.
  */
object Sheets {

  private def money(c: Column): Column =
    regexp_replace(c, "[$,]", "").try_cast(DoubleType)

  /** "5.2%" → 0.052; bare "5.2" → 0.052 too (the sheet mixes both —
    * `api_data_generator.py:181`); unparseable → null.
    */
  private def percent(c: Column): Column =
    when(c.endsWith("%"),
      regexp_replace(c, "%", "").try_cast(DoubleType) / 100.0)
      .otherwise(c.try_cast(DoubleType) / 100.0)

  private def usDate(c: Column): Column =
    to_date(nullif(c, lit("")), "M/d/yyyy")

  /** Production Tracker → (style_no, cost_usd, factory, production_date). */
  def productionTracker(silverGsheets: DataFrame): DataFrame =
    silverGsheets
      .filter(col("sheet_name") === "Production Tracker")
      .select(posexplode(col("raw_data")).as(Seq("row_idx", "cells")))
      .filter(col("row_idx") > 0) // drop header row
      .select(
        col("cells").getItem(0).as("style_no"),
        money(col("cells").getItem(1)).as("cost_usd"),
        nullif(col("cells").getItem(2), lit("")).as("factory"),
        usDate(col("cells").getItem(3)).as("production_date"))

  /** Sales Tracker → (buyer, commission_rate, payment, country_norm).
    * Country spellings are normalized the same way the cleanse layer
    * would ("US"/"USA"/"United States" → "United States").
    */
  def salesTracker(silverGsheets: DataFrame): DataFrame =
    silverGsheets
      .filter(col("sheet_name") === "Sales Tracker")
      .select(posexplode(col("raw_data")).as(Seq("row_idx", "cells")))
      .filter(col("row_idx") > 0)
      .select(
        col("cells").getItem(0).as("buyer"),
        percent(col("cells").getItem(1)).as("commission_rate"),
        col("cells").getItem(2).as("payment"),
        when(col("cells").getItem(3).isin("US", "USA", "United States"), "United States")
          .otherwise(col("cells").getItem(3)).as("country_norm"))

  /** Per-sheet row counts + parse health — the data-quality summary the
    * reference's declared-but-unused `data-quality-alerts` topic implies.
    */
  def parseHealth(silverGsheets: DataFrame): DataFrame = {
    val prod = productionTracker(silverGsheets)
      .agg(
        count(lit(1)).as("rows"),
        sum(col("cost_usd").isNull.cast(IntegerType)).as("bad_money"),
        sum(col("production_date").isNull.cast(IntegerType)).as("missing_dates"))
      .withColumn("sheet", lit("Production Tracker"))
    val sales = salesTracker(silverGsheets)
      .agg(
        count(lit(1)).as("rows"),
        sum(col("commission_rate").isNull.cast(IntegerType)).as("bad_money"),
        sum(lit(0)).cast("long").as("missing_dates"))
      .withColumn("sheet", lit("Sales Tracker"))
    prod.unionByName(sales)
      .select(col("sheet"), col("rows"), col("bad_money"), col("missing_dates"))
  }
}
