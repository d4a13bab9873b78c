package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** LIVE RANGE-PARTITION PLANNING — z2's streaming face: maintain the
  * deterministic md5-bottom-256 key sample over everything ever
  * ingested, so CURRENT range boundaries for a global sort/write are
  * always one bounded read away — no planning scan over history before
  * a nightly re-layout, and no stale boundaries after the data drifts.
  *
  * Same exactness spine as [[StreamingSampler]] (the bottom-k snapshot
  * ledger over [[SnapshotLedger]]): bottom-256 by (h, value)
  * decomposes, so the carried state is ≤ 256 rows and the maintained
  * sample — hence every boundary cut from it — EQUALS the batch z2
  * planner run over the full ingested history. Replays byte-identical,
  * no ordering crash window, as-of boundaries for free (what would the
  * layout have been as of batch N).
  */
object StreamingPlanner {

  val sampleN = 256
  val buckets = 32

  /** Score a batch into the planner's `(cents, h)` shape: `value` is the
    * BIGINT range key, `idCols` the row's id tuple (the md5 tiebreak that
    * makes LIMIT deterministic — z2's (h, cents) total-order rule).
    * `idCols` need NOT be row-unique: both this face and the batch
    * planner ([[graft.queries.ScaleOps.plannerBounds]]) dedup on
    * (h, cents) before the bottom-k — the ONE shared sample rule, so a
    * duplicate id tuple with the same value is one sample vote on both
    * sides and the maintained-≡-batch contract survives duplicate data
    * (the synthetic lineitem's non-unique (orderkey, linenumber) key
    * included).
    */
  def scored(batch: DataFrame, value: Column, idCols: Seq[Column]): DataFrame =
    batch.select(value.cast("long").as("cents"),
      md5(concat_ws(":", idCols: _*)).as("h"))

  /** The merged snapshot for one batch: predecessor sample ∪ scored
    * batch, deduped on (h, cents) — an at-least-once redelivery is the
    * same logical row — then the global bottom-256 by (h, cents).
    */
  def mergeBatch(spark: SparkSession, scoredBatch: DataFrame, batchId: Long,
      planDir: String): DataFrame =
    SnapshotLedger.before(spark, planDir, batchId)
      .map(_.unionByName(scoredBatch)).getOrElse(scoredBatch)
      .dropDuplicates("h", "cents")
      .orderBy(col("h"), col("cents"))
      .limit(sampleN)

  /** One micro-batch (rows already in the (cents, h) shape). */
  def processBatch(spark: SparkSession, scoredBatch: DataFrame, batchId: Long,
      planDir: String): Unit =
    SnapshotLedger.write(
      mergeBatch(spark, scoredBatch, batchId, planDir).localCheckpoint(true),
      planDir, batchId)

  private def cutsOf(sample: Seq[(Long, String)]): Seq[Long] = {
    val step = sampleN / buckets
    val sorted = sample.sortBy { case (c, h) => (c, h) }
    (1 until buckets).map(j => j * step - 1)
      .filter(_ < sorted.length).map(i => sorted(i)._1)
  }

  /** CURRENT boundaries: the z2 cut rule (order-statistics at every
    * `sampleN/buckets`-th rank of the (cents, h)-sorted sample) over the
    * latest snapshot. Equal to `ScaleOps.plannerBounds` run over the
    * full ingested history.
    */
  def boundaries(spark: SparkSession, planDir: String): Seq[Long] =
    SnapshotLedger.latest(spark, planDir) match {
      case None => Nil
      case Some(s) => cutsOf(s.select(col("cents"), col("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
    }

  /** Time travel: the boundaries as of batch `asOf` — what the layout
    * plan WOULD have been at that point of the stream.
    */
  def boundariesAsOf(spark: SparkSession, planDir: String, asOf: Long): Seq[Long] =
    SnapshotLedger.asOf(spark, planDir, asOf) match {
      case None => Nil
      case Some(s) => cutsOf(s.select(col("cents"), col("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
    }

  def vacuum(spark: SparkSession, planDir: String, keepFrom: Long): Int =
    SnapshotLedger.vacuum(spark, planDir, keepFrom)

  /** Streaming sink: `value`/`idCols` are resolved against the stream. */
  def sink(rows: DataFrame, value: Column, idCols: Seq[Column],
      planDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession,
          scored(batch, value, idCols), batchId, planDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
}
