package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** LIVE PPS SAMPLE MAINTENANCE — t38's streaming face: keep, per source
  * stratum, the current k-winner sequential-Poisson sample (ranking key =
  * md5-uniform ÷ token count, the t38 scheme exactly) over everything
  * ever ingested, updated per micro-batch.
  *
  * Why this is exactly maintainable: bottom-k selection DECOMPOSES —
  * bottom-k(history ∪ batch) = bottom-k(bottom-k(history) ∪ batch) — so
  * the carried state is never more than k rows per stratum, and the
  * maintained sample is EQUAL (not approximately equal) to rerunning t38
  * over the full history. The same property is why the batch operator
  * can run as a bounded-heap partial aggregate; here it bounds streaming
  * state instead.
  *
  * State is the LEDGER ITSELF (the StreamingCusum pattern): batch N
  * writes the MERGED sample snapshot under `batch_id=N` (≤ k·|sources|
  * rows), computed from its PREDECESSOR partition (immutable once
  * written) plus the incoming batch. Consequences, all by construction:
  *  - replays rewrite byte-identical partitions (the merge reads only
  *    strictly-earlier state, and every scored column is a deterministic
  *    function of the doc payload);
  *  - there is NO pin/ordering crash window — the snapshot is the only
  *    artifact, and a torn write is healed by the replay's overwrite;
  *  - sample-as-of-batch time travel is free (read partition ≤ N);
  *  - a re-delivered doc (at-least-once sources) occupies ONE slot — the
  *    merge dedups on (source, doc_id) before selecting, and an
  *    identical payload scores identically.
  *
  * At 100 TB the per-batch cost is scoring the batch (narrow projection)
  * + a k-per-stratum selection over (batch ∪ k·|sources| carried rows);
  * the snapshot read is one bounded partition, never a history scan.
  * Old snapshots are audit/time-travel history; `vacuum` reclaims them
  * past a horizon (the latest snapshot is all the merge ever needs).
  */
object StreamingSampler {

  val defaultK = 8

  /** Score a raw `(doc_id, text, source)` batch with the t38 ranking
    * columns — one narrow projection, no shuffle.
    */
  def scored(batch: DataFrame): DataFrame =
    batch.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      conv(substring(md5(concat(lit("pps:"), col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("long").as("u24"))
      .withColumn("sel_key", col("u24").cast("double") / col("n_tokens"))

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).selectExpr("CAST(id AS STRING) AS source",
      "id AS doc_id", "id AS n_tokens", "id AS u24",
      "CAST(id AS DOUBLE) AS sel_key")

  /** The predecessor snapshot for `batchId`: the partition with the
    * largest batch id STRICTLY below it (replays never see their own or
    * later state — the StreamingAdmission fence), or the empty sample.
    */
  def stateBefore(spark: SparkSession, sampleDir: String, batchId: Long): DataFrame =
    SnapshotLedger.before(spark, sampleDir, batchId).getOrElse(emptyState(spark))

  /** The merged snapshot for one batch: predecessor state ∪ scored batch,
    * deduped on (source, doc_id), bottom-k per source by (sel_key,
    * doc_id). The result is what t38 would select over the union of every
    * doc the predecessor chain has seen plus this batch.
    */
  def mergeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      sampleDir: String, k: Int = defaultK): DataFrame = {
    val merged = stateBefore(spark, sampleDir, batchId)
      .unionByName(scored(batch))
      // a re-delivered doc is the same payload → identical row; keep one
      .dropDuplicates("source", "doc_id")
    graft.plans.TopKPerGroup.topK(merged, Seq("source"),
      Seq(("sel_key", true), ("doc_id", true)), k)
  }

  /** One micro-batch: merge and land the snapshot under `batch_id=N`
    * (plain overwrite of the batch's own partition — replay-idempotent).
    * Empty batches still write (the snapshot chain stays gapless, so
    * `sample()` = latest partition is always current). Public for
    * direct replay.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      sampleDir: String, k: Int = defaultK): Unit =
    SnapshotLedger.write(
      // materialize BEFORE the overwrite: the merge reads the predecessor
      // partition, and batch-id reuse across restarts may make that the
      // same path this write replaces
      mergeBatch(spark, batch, batchId, sampleDir, k).localCheckpoint(true),
      sampleDir, batchId)

  /** The current sample: the latest snapshot partition (one bounded
    * read; equals a t38 rerun over the full ingested history).
    */
  def sample(spark: SparkSession, sampleDir: String): DataFrame =
    SnapshotLedger.latest(spark, sampleDir).getOrElse(emptyState(spark))

  /** Time travel: the sample as of batch `asOf` (largest id ≤ asOf). */
  def sampleAsOf(spark: SparkSession, sampleDir: String, asOf: Long): DataFrame =
    SnapshotLedger.asOf(spark, sampleDir, asOf).getOrElse(emptyState(spark))

  /** Reclaim snapshots strictly below `keepFrom`, never the latest (the
    * merge chain only ever needs the newest partition; older ones exist
    * for audit/as-of reads). Returns partitions deleted.
    */
  def vacuum(spark: SparkSession, sampleDir: String, keepFrom: Long): Int =
    SnapshotLedger.vacuum(spark, sampleDir, keepFrom)

  /** Streaming sink over [[processBatch]]. */
  def sink(docs: DataFrame, sampleDir: String, checkpointDir: String,
      k: Int = defaultK,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, sampleDir, k)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
}
