package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for SNAPSHOT-LEDGER state (the [[StreamingSampler]] /
  * [[StreamingPlanner]] pattern): batch N writes its full (bounded)
  * state snapshot under `batch_id=N`, derived from the partition with
  * the largest id strictly below N. Consequences carried by the layout
  * alone: byte-identical replays (the merge reads only strictly-earlier
  * state), no pin-ordering crash window (one artifact, torn writes
  * healed by the replay's overwrite), free as-of time travel, vacuum
  * that never touches the latest snapshot.
  */
private[streaming] object SnapshotLedger {

  def partIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toIndexedSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
  }

  /** The predecessor snapshot for `batchId` (largest id strictly below —
    * replays never see their own or later state), or None.
    */
  def before(spark: SparkSession, dir: String, batchId: Long): Option[DataFrame] =
    partIds(spark, dir).filter(_ < batchId) match {
      case Nil => None
      case ids => Some(spark.read.parquet(s"$dir/batch_id=${ids.max}"))
    }

  def latest(spark: SparkSession, dir: String): Option[DataFrame] =
    partIds(spark, dir) match {
      case Nil => None
      case ids => Some(spark.read.parquet(s"$dir/batch_id=${ids.max}"))
    }

  def asOf(spark: SparkSession, dir: String, asOfId: Long): Option[DataFrame] =
    partIds(spark, dir).filter(_ <= asOfId) match {
      case Nil => None
      case ids => Some(spark.read.parquet(s"$dir/batch_id=${ids.max}"))
    }

  /** Land batch `batchId`'s snapshot (plain overwrite of its own
    * partition — replay-idempotent). The caller must have materialized
    * `snapshot` (localCheckpoint) if it derives from the predecessor
    * partition this write may replace on a batch-id reuse.
    */
  def write(snapshot: DataFrame, dir: String, batchId: Long): Unit =
    snapshot.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")

  /** Batch `batchId`'s OWN snapshot, honored only if its write COMMITTED
    * (`_SUCCESS` marker present) — a torn write reads as absent, so a
    * replayer rewrites instead of trusting partial state. This is the
    * per-batch PIN shape ([[StreamingDrift]]'s reference version):
    * resolution must see exactly its own batch's commit, never fall back
    * to a neighbor's the way [[before]]/[[asOf]] deliberately do.
    */
  def committed(spark: SparkSession, dir: String, batchId: Long): Option[DataFrame] = {
    val part = new org.apache.hadoop.fs.Path(s"$dir/batch_id=$batchId")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(part, "_SUCCESS")))
      Some(spark.read.parquet(part.toString))
    else None
  }

  /** Delete snapshots strictly below `keepFrom`, never the latest. */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long): Int = {
    val ids = partIds(spark, dir)
    if (ids.isEmpty) return 0
    val latestId = ids.max
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = ids.filter(id => id < keepFrom && id != latestId)
    victims.foreach(id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batch_id=$id"), true))
    victims.size
  }
}
