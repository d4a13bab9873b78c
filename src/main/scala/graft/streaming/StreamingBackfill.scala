package graft.streaming

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** BATCH-BACKFILL → STREAMING HANDOFF — the migration seam every real
  * pipeline crosses exactly once: historical data loaded by a batch job,
  * live data appended by a stream, and a single cutoff timestamp that
  * partitions responsibility so no event is double-counted or lost at
  * the boundary. The reference has the two halves (bulk CSV loads in
  * `load_fashion_data.py`, live Kafka consumers) but no seam contract at
  * all — restarting its consumer after a bulk load double-ingests
  * whatever overlapped.
  *
  * The contract, enforced not documented:
  *
  *  1. `backfill` writes `ts < cutoff` rows (the filter is applied
  *     INSIDE, so callers hand it the raw full extract) into
  *     `root/data/segment=backfill`, then publishes the cutoff as a
  *     one-time seam manifest via temp-file + atomic rename. Crash
  *     before the manifest lands → no seam exists, the live side refuses
  *     to start, and the backfill retry overwrites cleanly.
  *  2. The live sink reads the seam once per batch and keeps only
  *     `ts >= cutoff` rows — so at-least-once delivery that REPLAYS
  *     pre-cutoff events (the overlap every migration produces) drops
  *     them instead of double-counting. Batches land in
  *     `root/data/segment=live/batch_id=N` batch-scoped overwrites: an
  *     at-least-once replay of a completed batch rewrites the same
  *     directory (the StreamingGold idempotence shape).
  *  3. A second `backfill` under a DIFFERENT cutoff fails loudly — the
  *     seam is immutable once live data depends on it; retrying the same
  *     cutoff is allowed (idempotent recovery).
  *
  * Serve side: one partitioned read over `root/data` — the seam is
  * invisible to consumers, and `segment` partition pruning lets an
  * auditor query either side alone.
  *
  * Scale: the backfill is one partitioned batch write (linear, no
  * shuffle beyond what the caller's extract already has); the live gate
  * adds one pushdown-able comparison per batch; nothing ever re-reads
  * history. The seam manifest is O(1) metadata.
  */
object StreamingBackfill {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def seamPath(root: String) = new Path(s"$root/_seam/cutoff")

  /** The published cutoff, if the seam exists. Micros since epoch keeps
    * the manifest timezone-free.
    */
  def readSeam(spark: SparkSession, root: String): Option[Timestamp] = {
    val p = seamPath(root)
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val micros = new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
        val t = new Timestamp(micros / 1000000 * 1000) // whole seconds, in millis
        t.setNanos(((micros % 1000000) * 1000).toInt)
        Some(t)
      } finally in.close()
    }
  }

  private def writeSeam(spark: SparkSession, root: String, cutoff: Timestamp): Unit = {
    val micros = cutoff.getTime / 1000 * 1000000 + cutoff.getNanos / 1000
    readSeam(spark, root) match {
      case Some(existing) if existing.equals(cutoff) => // idempotent retry
      case Some(existing) =>
        throw new IllegalStateException(
          s"seam already published at $existing; refusing to move it to $cutoff — " +
            "live batches admitted under the old cutoff would be mis-partitioned")
      case None =>
        val p = seamPath(root)
        val f = fs(spark, p)
        val tmp = new Path(p.getParent, s".cutoff.tmp.${System.nanoTime()}")
        f.mkdirs(p.getParent)
        val out = f.create(tmp, true)
        try out.write(micros.toString.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        if (!f.rename(tmp, p)) {
          // a concurrent publisher won the rename — accept only an equal cutoff
          val now = readSeam(spark, root)
          if (!now.contains(cutoff))
            throw new IllegalStateException(s"lost seam publish race to $now")
        }
    }
  }

  /** One-time historical load: `ts < cutoff` rows land under
    * `segment=backfill`, then the seam is published. Idempotent under
    * retry with the same cutoff; loud under a moved cutoff.
    */
  def backfill(historical: DataFrame, tsCol: String, cutoff: Timestamp,
      root: String): Unit = {
    val spark = historical.sparkSession
    // refuse a moved cutoff BEFORE touching data
    readSeam(spark, root).foreach { existing =>
      if (!existing.equals(cutoff))
        throw new IllegalStateException(
          s"seam already published at $existing; refusing backfill at $cutoff")
    }
    // batch_id=-1 keeps the partition depth uniform with the live side
    // (mixed-depth directories fail Spark's partition discovery)
    historical.filter(col(tsCol) < lit(cutoff))
      .write.mode("overwrite").parquet(s"$root/data/segment=backfill/batch_id=-1")
    writeSeam(spark, root, cutoff)
  }

  /** The live half of the seam for one micro-batch: gate to
    * `ts >= cutoff`, write batch-scoped. Public for replay tests and
    * foreachBatch wiring.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      tsCol: String, root: String): Unit = {
    val cutoff = readSeam(spark, root).getOrElse(throw new IllegalStateException(
      s"no seam published under $root — run backfill before starting the live sink"))
    batch.filter(col(tsCol) >= lit(cutoff))
      .write.mode("overwrite").parquet(s"$root/data/segment=live/batch_id=$batchId")
  }

  /** The live sink: one AvailableNow pass per start() (the container's
    * micro-batch driver), exactly-once via checkpoint + batch-scoped
    * overwrite.
    */
  def liveSink(stream: DataFrame, tsCol: String, root: String,
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, tsCol, root)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())

  /** Consumer view over both segments, seam-invisible. */
  def serve(spark: SparkSession, root: String): DataFrame = {
    val df = spark.read.option("basePath", s"$root/data").parquet(s"$root/data")
    df.drop("segment", "batch_id")
  }
}
