package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DISTRIBUTED GLOBAL RUNNING SUM (prefix scan) — the operator Spark's
  * window machinery cannot express at scale: `sum(x) OVER (ORDER BY …)`
  * with no PARTITION BY collapses the whole dataset into ONE task, the
  * canonical single-partition-window scale killer.
  *
  * This is the classic two-level scan, expressed declaratively:
  *
  *  1. decompose the global order by a caller-supplied BUCKET that is
  *     monotone in the sort key (a time bucket, an id range band, …);
  *  2. per-bucket totals → EXCLUSIVE prefix offsets (a window over
  *     |buckets| rows — bounded by the bucketing scheme, e.g. days in
  *     the calendar, never by data volume);
  *  3. broadcast the offsets back and run the within-bucket running-sum
  *     window — each bucket scans in parallel, offset + local prefix =
  *     the exact global prefix.
  *
  * Deterministic by construction (no spark_partition_id, no range-
  * partitioner sampling), so the result is oracle-replayable as a plain
  * global window on the small-SF gate. Bucket-skew is the caller's
  * dial: a hotter stream wants finer buckets (hour instead of day).
  */
object PrefixScan {

  /** Append `out` = running sum of `value` over the global order
    * (bucket, order…). `bucket` MUST be monotone non-decreasing in the
    * intended global sort: rows in an earlier bucket precede all rows of
    * a later one.
    */
  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
      value: Column, out: String): DataFrame = {
    val b = df.withColumn("__bucket", bucket).withColumn("__v", value)
    val totals = b.groupBy(col("__bucket")).agg(sum(col("__v")).as("__btotal"))
    // |buckets| rows: the only unpartitioned window, bounded by the
    // bucketing scheme (cf. Windows.scala post-aggregation windows)
    val exclusive = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__offset", coalesce(sum(col("__btotal")).over(exclusive), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    val local = Window.partitionBy(col("__bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), "__bucket")
      .withColumn(out, sum(col("__v")).over(local) + col("__offset"))
      .drop("__bucket", "__v", "__offset")
  }

  /** Append `out` = max of `value` over all STRICTLY earlier rows in the
    * global (bucket, order…) order — null for the global first row. Same
    * two-level decomposition as [[runningSum]] (per-bucket maxima →
    * exclusive offsets over \|buckets\| rows → within-bucket exclusive
    * window), same contract: `bucket` monotone in the sort, (bucket,
    * order…) a total order. The prefix-max is what linearizes dominance
    * scans (o3's skyline staircase) the way the prefix-sum linearizes
    * running totals.
    */
  def runningMaxExclusive(df: DataFrame, bucket: Column, order: Seq[Column],
      value: Column, out: String): DataFrame = {
    val b = df.withColumn("__bucket", bucket).withColumn("__v", value)
    val totals = b.groupBy(col("__bucket")).agg(max(col("__v")).as("__bmax"))
    val exclusive = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__offset", max(col("__bmax")).over(exclusive))
      .select(col("__bucket"), col("__offset"))
    val local = Window.partitionBy(col("__bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() ignores nulls (first row of first bucket stays null —
    // exactly the plain exclusive window's semantics)
    b.join(broadcast(offsets), "__bucket")
      .withColumn(out, greatest(max(col("__v")).over(local), col("__offset")))
      .drop("__bucket", "__v", "__offset")
  }
}
