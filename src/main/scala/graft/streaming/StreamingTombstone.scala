package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** DELETES for the upsert store + change feed — the tombstone extension
  * both [[StreamingCdf]] and [[StreamingIngest.upsertSink]] scaladocs
  * sketch as "the third branch" (the Delta `MERGE ... WHEN MATCHED THEN
  * DELETE` / Kafka-compacted-topic null-value shape): incoming rows
  * carry a boolean tombstone column; a tombstone that WINS the seq rule
  * deletes its key from the live view.
  *
  * The load-bearing decision is that a delete is a ROW, not a removal:
  * the snapshot RETAINS the winning tombstone `(key, seq, del=true)` and
  * the public reader filters it out. Physically removing the row would
  * throw away the key's seq high-water mark, so a stale redelivery of an
  * OLD insert (at-least-once delivery reorders across batches) would
  * silently resurrect a deleted key. With the tombstone retained, the
  * existing merge's seq-winner rule makes deletion exactly as
  * redelivery-proof as updates already are — and the merge itself is
  * [[StreamingIngest.mergeIntoSnapshot]] VERBATIM (a tombstone is just a
  * row whose `delCol` is true; the winner rule neither knows nor cares).
  * Tombstones are reclaimed by [[vacuum]] once the redelivery horizon
  * has passed — the Delta `VACUUM` / Cassandra `gc_grace_seconds`
  * contract.
  *
  * The change feed gains the `delete` type (old image = the live row,
  * new image all-null) and its mirror: a key re-inserted after deletion
  * is an `insert` with an all-null OLD image — change types describe the
  * LIVE VIEW's transitions, not the physical rows, so a feed consumer
  * (an mv3-style view, [[StreamingCdf.asOf]] time travel) needs no
  * knowledge of tombstones at all. Suppression tightens accordingly: a
  * tombstone for an absent or already-deleted key is a no-op, as is any
  * arrival that loses the seq rule.
  *
  * Scale: identical to the Type-1 path — one bucket-pruned join per
  * batch, feed rows = |live-view changes|. Vacuum rewrites only buckets
  * that actually hold expired tombstones.
  */
object StreamingTombstone {

  /** The LIVE view of a tombstone snapshot: winning rows whose tombstone
    * flag is false, envelope columns (bucket AND the flag itself) dropped
    * — the reader sees the same shape a Type-1 snapshot would.
    */
  def snapshot(spark: SparkSession, snapshotDir: String, delCol: String): DataFrame =
    spark.read.parquet(snapshotDir)
      .filter(!col(delCol))
      .drop("__bucket", delCol)

  /** One micro-batch: emit the live-view change feed for `batch`, then
    * merge it (tombstones included, as rows) into the snapshot. Replay
    * rewrites the same `batch_id=N` feed dir and re-merges idempotently
    * — the [[StreamingCdf.processBatch]] contract with the delete branch.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      keyCol: String, seqCol: String, delCol: String,
      snapshotDir: String, cdfDir: String, nBuckets: Int = 16): Unit = {
    val latest = StreamingIngest.batchWinners(batch, keyCol, seqCol)
    if (latest.isEmpty) return
    // feed images carry the DATA columns — the tombstone flag is
    // envelope, not payload; consumers see live-view transitions only
    val imageCols = batch.columns.filterNot(_ == delCol)
    val imageType = org.apache.spark.sql.types.StructType(
      imageCols.map(c => batch.schema(c)))
    val fs = new Path(snapshotDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapHasData = fs.exists(new Path(snapshotDir)) &&
      fs.listStatus(new Path(snapshotDir))
        .exists(_.getPath.getName.startsWith("__bucket="))

    val feed: DataFrame =
      if (!snapHasData) {
        // first batch: live rows are inserts; tombstones for keys that
        // never existed are no-ops
        latest.filter(!col(delCol))
          .select(col(keyCol).as("key"), lit("insert").as("change_type"),
            lit(null).cast(imageType).as("old_image"),
            struct(imageCols.map(col): _*).as("new_image"))
      } else {
        val bucketOf = pmod(xxhash64(col(keyCol)), lit(nBuckets))
        val touched = latest.withColumn("__bucket", bucketOf)
          .select(col("__bucket")).distinct()
          .collect().map(_.getLong(0)).toIndexedSeq // ≤ nBuckets rows
        val cur = spark.read.parquet(snapshotDir)
          .filter(col("__bucket").isin(touched: _*)) // partition-pruned
          .drop("__bucket")
        val dataCols = batch.columns
        val sSeq = col(s"s.`$seqCol`"); val tSeq = col(s"t.`$seqCol`")
        val restCols = dataCols.filterNot(_ == seqCol)
        val sRest = struct(restCols.map(c => col(s"s.`$c`")): _*)
        val tRest = struct(restCols.map(c => col(s"t.`$c`")): _*)
        // the merge's winner rule, verbatim (StreamingIngest.mergeIntoSnapshot)
        val srcWins = (tSeq.isNull && sSeq.isNotNull) || sSeq > tSeq ||
          (sSeq <=> tSeq) && sRest <= tRest
        val tAbsent = col(s"t.`$keyCol`").isNull
        val tLive = !tAbsent && !col(s"t.`$delCol`")
        val sDel = col(s"s.`$delCol`")
        val sImg = struct(imageCols.map(c => col(s"s.`$c`")): _*)
        val tImg = struct(imageCols.map(c => col(s"t.`$c`")): _*)
        // tAbsent wins unconditionally (mirrors the merge's leading
        // t-null clause — a null-seq first arrival still lands); the
        // seq rule applies only on contact. Live-view classification:
        //   insert — live row lands where the view had nothing (key
        //            absent OR only a tombstone);
        //   update — live row beats a live row and an image column
        //            actually changes;
        //   delete — tombstone beats a live row;
        //   noop   — everything else (loses the seq rule, image-
        //            identical, tombstone onto absent/already-deleted).
        latest.alias("s")
          .join(cur.alias("t"), col(s"s.`$keyCol`") === col(s"t.`$keyCol`"), "left")
          .select(col(s"s.`$keyCol`").as("key"),
            when(!sDel && (tAbsent || srcWins && !tLive), "insert")
              .when(!sDel && !tAbsent && srcWins && tLive && !(sImg <=> tImg), "update")
              .when(sDel && srcWins && tLive, "delete")
              .otherwise("noop").as("change_type"),
            when(tLive, tImg).otherwise(lit(null).cast(imageType)).as("old_image"),
            when(sDel, lit(null).cast(imageType)).otherwise(sImg).as("new_image"))
          .filter(col("change_type") =!= "noop")
      }

    feed.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(cdfDir)

    // a tombstone is just a row: the Type-1 merge's winner rule keeps it
    // sticky against anything older, which IS the delete semantics
    StreamingIngest.mergeIntoSnapshot(batch, keyCol, seqCol, snapshotDir, nBuckets)
  }

  /** TIME TRAVEL over a tombstone store: [[StreamingCdf.asOf]]'s
    * reconstruction with the delete branch — a key whose first change
    * after `version` is a `delete` existed at `version` with that
    * change's old image (resurrect), symmetric to insert (drop). The
    * snapshot side reads the LIVE view, so retained tombstones never
    * surface.
    */
  def asOf(spark: SparkSession, snapshotDir: String, cdfDir: String,
      keyCol: String, delCol: String, version: Long): DataFrame =
    StreamingCdf.asOfFrom(snapshot(spark, snapshotDir, delCol),
      StreamingCdf.feed(spark, cdfDir), keyCol)(version)

  /** Reclaim tombstones whose seq is at or below `seqHorizon` — safe
    * once no redelivery older than the horizon can still arrive (the
    * caller's retention contract: horizon ≤ oldest in-flight seq). Only
    * buckets actually holding expired tombstones are rewritten (dynamic
    * overwrite); live rows and younger tombstones are untouched. Returns
    * the number of tombstones removed. Idempotent — a second call finds
    * nothing to reclaim.
    */
  def vacuum(spark: SparkSession, snapshotDir: String, seqCol: String,
      delCol: String, seqHorizon: Long): Long = {
    val all = spark.read.parquet(snapshotDir)
    val expired = col(delCol) && col(seqCol) <= lit(seqHorizon)
    // the Hive partition column reads back as INT — pin long for collect
    val doomed = all.filter(expired)
      .groupBy(col("__bucket").cast("long").as("__bucket"))
      .agg(count(lit(1)).as("n"))
      .collect() // ≤ nBuckets rows
    if (doomed.isEmpty) return 0L
    val buckets = doomed.map(_.getAs[Long]("__bucket")).toIndexedSeq
    val removed = doomed.map(_.getAs[Long]("n")).sum
    val stage = new Path(snapshotDir + ".vacuum.stage")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stage, true)
    // same staged-rewrite discipline as the merge: the overwrite's source
    // must not sit inside its own read path
    all.filter(col("__bucket").isin(buckets: _*)).filter(!expired)
      .write.partitionBy("__bucket").mode("overwrite").parquet(stage.toString)
    // a bucket whose every row expired stages NOTHING — dynamic overwrite
    // can't emit an empty partition, so those buckets are deleted outright
    val staged = buckets.filter(b => fs.exists(new Path(s"$stage/__bucket=$b")))
    if (staged.nonEmpty)
      spark.read.option("basePath", stage.toString)
        .parquet(staged.map(b => s"$stage/__bucket=$b"): _*)
        .write.partitionBy("__bucket").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(snapshotDir)
    // an emptied bucket keeps a zero-row schema-carrying file: deleting
    // the dir outright could leave the whole store schema-less (every
    // reader and the next merge's snapshot probe need SOME footer), and
    // the next merge touching the bucket dynamic-overwrites it anyway
    val dataSchema = org.apache.spark.sql.types.StructType(
      all.schema.filterNot(_.name == "__bucket"))
    buckets.diff(staged).foreach { b =>
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dataSchema)
        .repartition(1)
        .write.mode("overwrite").parquet(s"$snapshotDir/__bucket=$b")
    }
    fs.delete(stage, true)
    removed
  }

  /** The streaming sink: upsert-with-deletes stream → retained-tombstone
    * snapshot + live-view change feed.
    */
  def sink(updates: DataFrame, keyCol: String, seqCol: String, delCol: String,
      snapshotDir: String, cdfDir: String, checkpointDir: String,
      nBuckets: Int = 16,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    updates.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, keyCol, seqCol,
          delCol, snapshotDir, cdfDir, nBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("update")
}
