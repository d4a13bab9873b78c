package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine FP discipline for oracle-compared queries.
  *
  * `round(double, n)` is NOT portable: Spark rounds via the shortest
  * decimal string repr (BigDecimal.valueOf) while DuckDB rounds the
  * scaled double — values whose shortest repr looks like a tie (e.g.
  * 7624.015) round differently (observed: 7624.01 vs 7624.02). And raw
  * double aggregation drifts with partial-agg accumulation order.
  *
  * The portable recipe, used by every money query here:
  *  1. cast base columns to DECIMAL FIRST — the testdata money columns
  *     are clean 2-dp decimals, so `cast(x AS DECIMAL(18,2))` is exact
  *     in both engines (no rounding happens at all);
  *  2. do all arithmetic in decimal (exact, order-independent);
  *  3. round by casting to DECIMAL(18,2) — decimal→decimal rounding is
  *     HALF_UP in Spark and half-away-from-zero in DuckDB, identical for
  *     the positive money domain (and well-defined on exact inputs);
  *  4. emit money as `decimal.cast(double)` (identical nearest-double on
  *     both sides) and ratios as unrounded double division of exact
  *     operands (IEEE-identical).
  *
  * This also matches the reference's gold-layer typing, which carries
  * money as Decimal(10,2) (`silver_to_gold.py:138-143`).
  */
object Exact {
  /** Exact cast of a clean 2-dp money column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact cast of short-decimal rates/factors (≤4 dp). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Round an exact decimal to cents, emit as double. */
  def cents(c: Column): Column = c.cast(DecimalType(18, 2)).cast(DoubleType)
}
