package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** CHANGE DATA FEED producer — the store→feed direction closing the CDC
  * loop (cdc1 diffs two batch snapshots; `StreamingMv` CONSUMES a feed;
  * this EMITS one from the live upsert store, the Delta
  * `readChangeFeed` shape): per micro-batch, before the Type-1 merge
  * applies, the batch winners are classified against the standing
  * snapshot into
  *
  *  - `insert`  — key not in the snapshot (old image all-null);
  *  - `update`  — key present, the incoming row WINS the merge's seq
  *    rule AND at least one column actually changes (no-op updates and
  *    stale redeliveries the merge would ignore are SUPPRESSED — a CDF
  *    that emits rows its own store discards poisons every consumer);
  *
  * and written to `cdfDir/batch_id=N` (dynamic overwrite — a replayed
  * batch rewrites its own feed dir, never appends). Old and new images
  * ride as structs so a consumer (an mv3-style maintained view, an
  * audit trail) needs no join back to any snapshot. Deletes don't exist
  * in a Type-1 upsert stream; [[StreamingTombstone]] is the
  * tombstone-column extension that adds them as a third branch with the
  * same envelope.
  *
  * The classification reuses the EXACT winner rule of
  * [[StreamingIngest.mergeIntoSnapshot]] (shared `batchWinners` +
  * mirrored seq comparison), so the feed describes precisely the rows
  * the merge will change — spec-pinned by driving the feed into a
  * downstream view and landing on the snapshot's own aggregate.
  *
  * Scale: one bucket-pruned join of the batch's keys against the
  * snapshot per batch — O(touched-bucket bytes), the merge's own cost
  * shape; the feed is |changes| rows.
  */
object StreamingCdf {

  /** One micro-batch: emit the feed for `batch`, then merge it into the
    * snapshot. Also the spec's replay entry point.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      keyCol: String, seqCol: String, snapshotDir: String, cdfDir: String,
      nBuckets: Int = 16): Unit = {
    val latest = StreamingIngest.batchWinners(batch, keyCol, seqCol)
    if (latest.isEmpty) return
    val dataCols = batch.columns
    val fs = new Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // "first batch" means the snapshot holds no data yet — an existing
    // but EMPTY directory (a pre-created temp/workspace dir) must not
    // route us into a schemaless read
    val snapHasData = fs.exists(new Path(snapshotDir)) &&
      fs.listStatus(new Path(snapshotDir))
        .exists(_.getPath.getName.startsWith("__bucket="))
    val feed: DataFrame =
      if (!snapHasData) {
        // first batch: everything is an insert
        latest.select(col(keyCol).as("key"), lit("insert").as("change_type"),
          lit(null).cast(structType(latest, dataCols)).as("old_image"),
          struct(dataCols.map(col): _*).as("new_image"))
      } else {
        val bucketOf = pmod(xxhash64(col(keyCol)), lit(nBuckets))
        val touched = latest.withColumn("__bucket", bucketOf)
          .select(col("__bucket")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq // ≤ nBuckets rows
        val cur = spark.read.parquet(snapshotDir)
          .filter(col("__bucket").isin(touched: _*)) // partition-pruned
          .drop("__bucket")
        val sSeq = col(s"s.`$seqCol`"); val tSeq = col(s"t.`$seqCol`")
        val restCols = dataCols.filterNot(_ == seqCol)
        val sRest = struct(restCols.map(c => col(s"s.`$c`")): _*)
        val tRest = struct(restCols.map(c => col(s"t.`$c`")): _*)
        // the merge's srcWins rule, restricted to matched keys
        val srcWins = (tSeq.isNull && sSeq.isNotNull) || sSeq > tSeq ||
          (sSeq <=> tSeq) && sRest <= tRest
        val sAll = struct(dataCols.map(c => col(s"s.`$c`")): _*)
        val tAll = struct(dataCols.map(c => col(s"t.`$c`")): _*)
        latest.alias("s")
          .join(cur.alias("t"), col(s"s.`$keyCol`") === col(s"t.`$keyCol`"), "left")
          .select(col(s"s.`$keyCol`").as("key"),
            when(col(s"t.`$keyCol`").isNull, "insert")
              .when(srcWins && !(sAll <=> tAll), "update")
              .otherwise("noop").as("change_type"),
            when(col(s"t.`$keyCol`").isNull, lit(null).cast(structType(latest, dataCols)))
              .otherwise(tAll).as("old_image"),
            sAll.as("new_image"))
          .filter(col("change_type") =!= "noop")
      }

    feed.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(cdfDir)

    StreamingIngest.mergeIntoSnapshot(batch, keyCol, seqCol, snapshotDir, nBuckets)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /** The accumulated feed (partition column back to long). */
  def feed(spark: SparkSession, cdfDir: String): DataFrame =
    spark.read.parquet(cdfDir)
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** TIME TRAVEL: the snapshot as it stood after batch `version` merged,
    * reconstructed by REVERSE-APPLYING the change feed (the Delta
    * `versionAsOf` read, built from the feed instead of kept file
    * manifests — the store itself stays a plain Type-1 snapshot with no
    * retained history):
    *
    *  - for every key whose FIRST change after `version` is an `update`,
    *    that change's `old_image` IS the key's value at `version`;
    *  - a key whose first later change is an `insert` did not exist at
    *    `version` — dropped;
    *  - keys with no later change read straight from the live snapshot.
    *
    * Correct because the feed is complete and minimal by contract: one
    * row per (key, batch), no-ops and stale redeliveries suppressed, so
    * "first change after version" is exactly the transition out of the
    * version-k state. A `delete` first change (emitted by the
    * [[StreamingTombstone]] store) is symmetrical to insert: the key
    * EXISTED at `version` with that change's old image — resurrected.
    * Type-1 feeds simply never contain the branch.
    *
    * Scale: one window over the post-`version` slice of the feed
    * (partition-pruned by `batch_id`, |changes| rows — not corpus rows)
    * + one anti-join against the snapshot. Cost follows the amount of
    * CHANGE since the version, not store size.
    */
  def asOf(spark: SparkSession, snapshotDir: String, cdfDir: String,
      keyCol: String, version: Long): DataFrame =
    asOfFrom(spark.read.parquet(snapshotDir).drop("__bucket"),
      feed(spark, cdfDir), keyCol)(version)

  /** [[asOf]]'s reconstruction over an already-resolved live snapshot and
    * feed — shared with [[StreamingTombstone.asOf]], whose snapshot side
    * needs the tombstone filter applied first.
    */
  private[streaming] def asOfFrom(snap: DataFrame, fullFeed: DataFrame,
      keyCol: String)(version: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val later = fullFeed.filter(col("batch_id") > version)
    val first = later
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("batch_id"))))
      .filter(col("rn") === 1)
    val restored = first.filter(col("change_type").isin("update", "delete"))
      .select(col("old_image.*"))
    // the feed's envelope column is renamed before meeting the snapshot:
    // a data column named "key" must not capture the join predicate
    val touched = first.select(col("key").as("__tt_key"))
    snap.join(touched, snap(keyCol) === col("__tt_key"), "left_anti")
      .unionByName(restored)
  }

  /** The streaming sink wrapper: upsert stream → snapshot + change feed. */
  def sink(updates: DataFrame, keyCol: String, seqCol: String,
      snapshotDir: String, cdfDir: String, checkpointDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, keyCol, seqCol,
          snapshotDir, cdfDir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("update")
}
