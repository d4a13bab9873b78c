package graft.domain

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Behavior switches for the domain pipeline.
  *
  * The reference's observable behavior includes nondeterminism and real
  * bugs; the engine default is deterministic-and-faithful-in-shape, with
  * flags to reproduce each quirk bit-for-bit (SURVEY §7 "hard parts").
  *
  * @param asOf injected processing clock replacing `current_timestamp()`
  *             (`silver_to_gold.py:272` stamps gold rows with wall-clock;
  *             injection makes runs reproducible and backfillable)
  * @param faithfulRand true → real `rand()` per when-branch like
  *             `silver_to_gold.py:304-329` (non-deterministic across
  *             re-evaluation, the reference's actual behavior); false →
  *             key-derived uniforms with the same compounding distribution
  * @param fixHilldunCase the reference compares `payment_source ==
  *             "hilldun"` against an emitted literal `"Hilldun"` — the
  *             predicate is ALWAYS false (`silver_to_gold.py:279,535`), so
  *             Joor insurance ≡ 0 and trx fees always apply. false (default)
  *             reproduces that faithfully; true compares case-insensitively
  * @param dedupeFreight the freight generator draws `order_ref` randomly so
  *             one order can own several freight rows and the reference's
  *             left join fans out (`api_data_generator.py:154`,
  *             `silver_to_gold.py:512-516`). true pre-aggregates freight to
  *             one row per order before the join
  */
final case class DomainConfig(
    asOf: Timestamp = Timestamp.valueOf("2025-07-04 10:00:00"),
    faithfulRand: Boolean = false,
    fixHilldunCase: Boolean = false,
    dedupeFreight: Boolean = false) {

  /** One uniform [0,1) draw per (row, branch). Deterministic mode derives
    * it from the first 24 bits of `md5(key:tag)` — chosen over xxhash64
    * because md5 is the one keyed hash every SQL engine shares, so the
    * oracle (DuckDB) can recompute the identical draw:
    * Spark `conv(substr(md5(k),1,6),16,10)` ≡ DuckDB
    * `CAST('0x' || substr(md5(k),1,6) AS BIGINT)`. The ÷2^24 is a
    * power-of-two division, exact in binary floating point, so the draw
    * double is bit-identical cross-engine. (md5 costs ~10× xxhash64 per
    * draw; at 100 TB with draw-heavy classifiers, swap in a xxhash64
    * variant and give up SQL-oracle reproducibility — the distribution
    * contract is the same.) Faithful mode is an independent `rand()` per
    * branch like the reference.
    */
  def draw(key: Column, tag: String): Column =
    if (faithfulRand) rand()
    else conv(substring(md5(concat_ws(":", key, lit(tag))), 1, 6), 16, 10)
      .cast(LongType).cast(DoubleType) / 16777216.0
}
