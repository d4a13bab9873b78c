package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional layout trick every
  * large table format (Delta OPTIMIZE ZORDER, Iceberg sort orders) builds
  * on, expressed with plain Spark: interleave the bits of two quantized
  * sort dimensions and RANGE-PARTITION the write by the interleaved key.
  * A file then covers a small Z-curve segment — a rectangle in (x, y) —
  * so parquet/ORC min-max footer stats become tight on BOTH dimensions
  * and a 2-D box filter skips most files. A single-column sort gives
  * tight stats on that column only; the second dimension's ranges stay
  * [min, max] everywhere and prune nothing.
  *
  * The z-value is a fixed fan-in of shifts/masks/ORs — pure codegen'd
  * integer math (no UDF), and deterministic: the same expression is
  * SQL-expressible in any engine, so the driver oracle checks it
  * bit-for-bit (`z1_zorder_key`).
  *
  * At 100 TB: z-ordering is a per-partition maintenance rewrite (like
  * [[Compaction]] — run it on cold partitions); the write is one range
  * exchange on the z-key. `bits` trades key resolution for skew: 8 bits
  * per dimension = 65,536 curve cells, plenty for file-level pruning.
  */
object ZOrder {

  /** Bit-interleave two non-negative columns quantized to `bits` bits:
    * x occupies even bit positions, y odd. Fixed expression tree —
    * `bits` pairs of shift/mask/shift/or — entirely inside whole-stage
    * codegen.
    */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 16, "bits must be in [1, 16]")
    // widen to long BEFORE shifting: with IntegerType inputs and bits=16,
    // shiftleft(..., 31) would land y's top bit on the int sign bit and
    // produce negative keys that sort before the whole curve
    val (xl, yl) = (x.cast("long"), y.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` into `nFiles` files clustered by the z-curve over
    * (xCol, yCol). `repartitionByRange` on the z-key gives contiguous,
    * balanced curve segments per file (a hash repartition would scatter
    * the curve and destroy the stats locality that makes this work).
    *
    * Operational note: range boundaries come from SAMPLING
    * (`spark.sql.execution.rangeExchange.sampleSizePerPartition`,
    * default 100/partition). For a layout rewrite that default is too
    * noisy — one unlucky quantile makes one fat file whose z-range spans
    * a query box and the pruning win evaporates. Production rewrites
    * should raise it (2000/partition costs milliseconds at write time
    * and buys stable file boundaries); ZOrderSpec pins the measured
    * effect.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int, bits: Int = 8): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
