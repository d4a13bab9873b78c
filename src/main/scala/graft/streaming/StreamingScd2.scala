package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming TYPE-2 dimension maintenance — the streaming face of the
  * batch SCD2 build (`p10_scd2_dim`), completing the pair with
  * [[StreamingIngest.upsertSink]] (which maintains the TYPE-1 latest-row
  * snapshot from the same kind of keyed update stream).
  *
  * Layout under `dir`: two bucketed stores, both partitioned by
  * `__bucket = pmod(xxhash64(key), nBuckets)`:
  *
  *  - `updates/` — the deduplicated raw update log (one row per
  *    (key, seq), payload ties resolved by remaining-columns-asc, the
  *    same rule as the Type-1 merge);
  *  - `dim/` — the derived SCD2 history: per key, no-op updates (no
  *    tracked column changed) are suppressed, then versions number off
  *    in seq order with half-open [valid_from, valid_to) intervals and
  *    an `is_current` flag — exactly the p10 shape.
  *
  * Per micro-batch only the buckets the batch touches are read, merged,
  * re-derived and dynamically overwritten — per-batch cost is
  * O(touched-bucket bytes), never O(dimension). The history is a pure
  * function of the deduplicated update SET, so an at-least-once replay
  * (same batch, any subset, any order) converges to the identical store:
  * idempotence by recomputation, not by fencing.
  *
  * A crash between the two store writes leaves `updates/` ahead of
  * `dim/`; the next batch touching those buckets (or a zero-row repair
  * run of the same batch) re-derives `dim/` from `updates/` — the log is
  * the source of truth, the dim a materialization.
  */
object StreamingScd2 {

  /** Pure derivation: deduped updates → SCD2 history (p10 shape +
    * no-op-change suppression). `trackedCols` are the attributes whose
    * change opens a new version.
    */
  def deriveHistory(updates: DataFrame, keyCol: String, seqCol: String,
      trackedCols: Seq[String]): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val tracked = struct(trackedCols.map(col): _*)
    val suppressed = updates
      .withColumn("__prev", lag(tracked, 1).over(byKey))
      // first version always opens; later rows only on a tracked change.
      // null-safe inequality: a null attribute value is still a value
      .filter(col("__prev").isNull || !(col("__prev") <=> tracked))
      .drop("__prev")
    suppressed
      .withColumn("version", row_number().over(byKey))
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(byKey))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0).cast("int"))
  }

  private def bucketOf(keyCol: String, nBuckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(nBuckets))

  /** Deterministic one-row-per-(key,seq) winner — remaining columns asc,
    * the Type-1 merge's tie rule, so replays always pick the same row.
    */
  private def dedup(df: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val rest = df.columns.filterNot(c => c == keyCol || c == seqCol || c == "__bucket")
    val w = Window.partitionBy(col(keyCol), col(seqCol))
      .orderBy(rest.map(c => col(c).asc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def stagedDynamicOverwrite(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(dir + ".stage")
    fs.delete(stage, true)
    df.write.partitionBy("__bucket").mode("overwrite").parquet(stage.toString)
    spark.read.parquet(stage.toString)
      .write.partitionBy("__bucket").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(dir)
    fs.delete(stage, true)
  }

  /** One micro-batch of SCD2 maintenance (also the spec's replay entry
    * point). `batch` must carry `keyCol`, `seqCol` (long, the version
    * clock — offset or event-time micros) and the tracked columns.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, keyCol: String,
      seqCol: String, trackedCols: Seq[String], dir: String,
      nBuckets: Int = 16): Unit = {
    val cols = (Seq(keyCol, seqCol) ++ trackedCols).map(col)
    val incoming = dedup(
      batch.filter(col(keyCol).isNotNull).select(cols: _*), keyCol, seqCol)
      .withColumn("__bucket", bucketOf(keyCol, nBuckets))
    if (incoming.isEmpty) return

    val updDir = s"$dir/updates"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touched = incoming.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0)).toIndexedSeq // ≤ nBuckets rows

    val mergedUpdates =
      if (!fs.exists(new Path(updDir))) incoming
      else dedup(
        spark.read.parquet(updDir)
          .filter(col("__bucket").isin(touched: _*)) // partition-pruned
          .unionByName(incoming),
        keyCol, seqCol)
    stagedDynamicOverwrite(mergedUpdates, updDir)

    // re-derive the touched buckets' history from the merged log (read
    // back from the store so dim derives from exactly what updates/ holds)
    val logNow = spark.read.parquet(updDir)
      .filter(col("__bucket").isin(touched: _*))
    stagedDynamicOverwrite(
      deriveHistory(logNow, keyCol, seqCol, trackedCols), s"$dir/dim")
  }

  /** The streaming sink wrapper. */
  def scd2Sink(updates: DataFrame, keyCol: String, seqCol: String,
      trackedCols: Seq[String], dir: String, checkpointDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, keyCol, seqCol, trackedCols,
          dir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("update")

  /** Read the maintained dimension. */
  def dim(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/dim").drop("__bucket")
}
