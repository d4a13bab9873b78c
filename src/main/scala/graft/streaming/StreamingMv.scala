package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** STREAMING RETRACTABLE MV — the streaming face of `mv3_retractable_mv`:
  * a grouped count/sum/min/max view maintained from a live row-level
  * change feed (the cdc1 shape: insert / update / delete with old and new
  * images), i.e. the Flink-style retraction stream applied to a parquet-
  * backed view.
  *
  * Layout under `dir`:
  *
  *  - `log/grp=G/batch_id=N` — the SIGNED DELTA LOG: each feed row
  *    becomes a retract of its old image and/or an add of its new image,
  *    partitioned by group then batch. A replayed batch dynamically
  *    overwrites exactly its own `batch_id=N` dirs — idempotent by
  *    construction.
  *  - `view/grp=G` — the maintained view, one partition per group, each
  *    row carrying `__last_batch` (the replay fence for the merge path).
  *
  * Per micro-batch, groups split by the mv3 algebra:
  *
  *  - ADD-ONLY groups (no retract in this batch, not a replay): count and
  *    sum merge as signed deltas and min/max as least/greatest against
  *    the standing view row — O(|batch|), no log read. This is the path
  *    ~all batches take on an append-mostly feed.
  *  - groups with ANY RETRACT (min/max have no inverse), and any group
  *    hit by a REPLAYED batch (`batchId ≤ __last_batch` — merging twice
  *    would double-count): BOUNDED RECOMPUTE — re-derive the group's
  *    current rows from its partition-pruned log and re-aggregate.
  *    O(|group's log|), never O(view) or O(feed history).
  *
  * Log derivation is LAST-WRITER-WINS per (group, key): the row with the
  * highest (batch_id, add-over-retract) wins, current iff it is an add.
  * LWW — not add/retract netting — is what makes the log COMPACTABLE:
  * `compactLog` folds a group's history into pure adds at the fold
  * horizon, and late entries below the horizon lose the LWW race. A group
  * whose recompute comes back empty has its view partition deleted
  * outright (dynamic overwrite cannot retract a partition it emits zero
  * rows for — the StreamingGold eviction discipline).
  *
  * Exactly-once is TWO fences, each covering the hole in the other:
  *
  *  - the GLOBAL fence (`_fence`, advanced after publish) skips any
  *    batch that fully completed once. The per-row fence cannot do this
  *    job: it dies with a deleted partition (a dead group's replayed
  *    insert would resurrect it), and a replayed log rewrite after
  *    compaction would re-materialize folded adds without their later
  *    retracts.
  *  - the PER-ROW fence (`__last_batch`) covers the crash-retry window
  *    the global fence cannot see: a crash after a partial view publish
  *    but before the fence write re-runs the batch, and any group the
  *    crashed attempt already published is routed to the idempotent
  *    recompute path instead of merging twice.
  *
  * Scale: every step is partition-pruned to the groups the batch touches;
  * state is |view| + |log|, log bounded by compaction. At 100 TB grain,
  * `grp` would be the view's partition column exactly as here.
  */
object StreamingMv {

  /** Feed contract (the cdc1/cdc2 envelope): one row per key per batch.
    * `old_grp`/`old_cents` null on insert; `new_grp`/`new_cents` null on
    * delete.
    */
  def deltasOf(feed: DataFrame): DataFrame = {
    val retracts = feed
      .filter(col("change_type").isin("delete", "update"))
      .select(col("key"), col("old_grp").as("grp"), lit("retract").as("kind"),
        col("old_cents").as("cents"))
    val adds = feed
      .filter(col("change_type").isin("insert", "update"))
      .select(col("key"), col("new_grp").as("grp"), lit("add").as("kind"),
        col("new_cents").as("cents"))
    retracts.unionByName(adds)
  }

  /** LWW current rows of the given groups from the delta log: per
    * (grp, key) the highest (batch_id, add>retract) entry wins and the
    * key is live iff that entry is an add. Replay- and compaction-safe
    * (see object scaladoc).
    */
  private def currentRows(log: DataFrame): DataFrame =
    log
      .withColumn("__rank", when(col("kind") === "add", 1).otherwise(0))
      .groupBy(col("grp"), col("key"))
      .agg(max(struct(col("batch_id"), col("__rank"), col("cents"))).as("__w"))
      .filter(col("__w.__rank") === 1)
      .select(col("grp"), col("key"), col("__w.cents").as("cents"))

  private def aggregate(rows: DataFrame): DataFrame =
    rows.groupBy(col("grp")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("cents")).as("sum_cents"),
      min(col("cents")).as("min_cents"),
      max(col("cents")).as("max_cents"))

  /** Store reads cast the partition-derived columns back to long —
    * partition-value inference would otherwise type `grp=10` as int and
    * break unions/collects against the feed's bigint columns.
    */
  private def readStore(spark: SparkSession, path: String, cols: String*): DataFrame =
    cols.foldLeft(spark.read.parquet(path)) { (df, c) =>
      df.withColumn(c, col(c).cast("long"))
    }

  /** One micro-batch of view maintenance (also the spec's replay entry
    * point). `feed` carries the [[deltasOf]] contract columns.
    */
  def processBatch(spark: SparkSession, feed: DataFrame, batchId: Long,
      dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // GLOBAL replay fence: batchId ≤ fence means this batch fully
    // completed once (the fence advances only after publish) — skip it
    // outright. This is what keeps a replay from re-writing a log dir
    // that compaction may have FOLDED (re-materializing the batch's adds
    // without the later retracts would resurrect deleted keys — the LWW
    // race only protects entries that are still in the log).
    if (batchId <= readFence(fs, dir)) return
    val deltas = deltasOf(feed).withColumn("batch_id", lit(batchId))
    if (deltas.isEmpty) return
    val logDir = s"$dir/log"
    val viewDir = s"$dir/view"

    // 1. idempotent log write: exactly this batch's (grp, batch_id) dirs
    deltas.write
      .partitionBy("grp", "batch_id")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(logDir)

    // 2. touched groups + whether any retract hit them (≤ |batch| groups)
    val touched = deltas.groupBy(col("grp"))
      .agg(max(when(col("kind") === "retract", 1).otherwise(0)).as("has_retract"))
      .collect().map(r => r.getAs[Long]("grp") -> (r.getAs[Int]("has_retract") == 1))
      .toMap
    val touchedKeys = touched.keys.toSeq

    val standing =
      if (fs.exists(new Path(viewDir)))
        readStore(spark, viewDir, "grp").filter(col("grp").isin(touchedKeys: _*))
      else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "grp BIGINT, n_rows BIGINT, sum_cents BIGINT, " +
              "min_cents BIGINT, max_cents BIGINT, __last_batch BIGINT"))
    // replay fence: a group already at or past this batch MUST NOT merge
    // again — route it to the recompute path, which is idempotent
    val replayed = standing
      .filter(col("__last_batch") >= batchId)
      .select(col("grp")).collect().map(_.getAs[Long]("grp")).toSet

    val (recomputeGrps, mergeGrps) =
      touchedKeys.partition(g => touched(g) || replayed.contains(g))

    // 3a. merge path: signed deltas onto the standing row, min/max by
    //     least/greatest — valid because nothing was retracted
    val merged = {
      val adds = deltas.filter(col("grp").isin(mergeGrps: _*))
        .groupBy(col("grp")).agg(
          count(lit(1)).as("d_n"), sum(col("cents")).as("d_sum"),
          min(col("cents")).as("d_min"), max(col("cents")).as("d_max"))
      adds.join(standing, Seq("grp"), "left")
        .select(col("grp"),
          (coalesce(col("n_rows"), lit(0L)) + col("d_n")).as("n_rows"),
          (coalesce(col("sum_cents"), lit(0L)) + col("d_sum")).as("sum_cents"),
          least(coalesce(col("min_cents"), col("d_min")), col("d_min")).as("min_cents"),
          greatest(coalesce(col("max_cents"), col("d_max")), col("d_max")).as("max_cents"),
          lit(batchId).as("__last_batch"))
    }

    // 3b. bounded recompute from the partition-pruned log; the fence
    //     advances to the group's max logged batch (≥ batchId except on
    //     replay, where the log already holds later batches)
    val recomputed = {
      val glog = readStore(spark, logDir, "grp", "batch_id")
        .filter(col("grp").isin(recomputeGrps: _*))
      val lastB = glog.groupBy(col("grp")).agg(max(col("batch_id")).as("__last_batch"))
      aggregate(currentRows(glog)).join(lastB, "grp")
    }

    // 4. publish: dynamic overwrite of exactly the touched groups' rows;
    //    a recompute that came back EMPTY means the group died — retract
    //    its partition by hand (decided from the PRE-write recompute
    //    result: the stale partition would otherwise survive and lie).
    //    Only group IDS ever reach the driver (bounded by the batch's
    //    touched-group count), never view rows.
    val alive = recomputed.select(col("grp")).collect()
      .map(_.getAs[Long]("grp")).toSet
    val out = merged.select(standing.columns.map(col): _*)
      .unionByName(recomputed.select(standing.columns.map(col): _*))
    if (mergeGrps.nonEmpty || alive.nonEmpty)
      out.write.partitionBy("grp").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(viewDir)
    recomputeGrps.filterNot(alive).foreach { g =>
      fs.delete(new Path(s"$viewDir/grp=$g"), true)
    }
    // 5. advance the fence LAST: a crash before this line re-runs the
    //    batch as batchId = fence+1 — the log rewrite is idempotent and
    //    any group the crashed attempt already published is routed to
    //    the recompute path by its row's __last_batch (the second fence)
    writeFence(fs, dir, batchId)
  }

  /** The global applied-batch fence: a one-line file advanced after each
    * publish. Written via temp-file + rename so readers never see a torn
    * write.
    */
  private def readFence(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long = {
    val p = new Path(s"$dir/_fence")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private[streaming] def writeFence(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, batchId: Long): Unit = {
    val tmp = new Path(s"$dir/_fence.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    val live = new Path(s"$dir/_fence")
    fs.delete(live, false)
    fs.rename(tmp, live)
  }

  /** Fold a group's log history into pure adds at the fold horizon (its
    * max logged batch): the maintained view is identical before and after
    * (spec-pinned). Safe against replays of folded batches because the
    * global fence skips them before they can re-write a folded log dir.
    */
  def compactLog(spark: SparkSession, dir: String): Unit = {
    val logDir = s"$dir/log"
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(logDir))) return
    val log = readStore(spark, logDir, "grp", "batch_id")
    val horizon = log.groupBy(col("grp")).agg(max(col("batch_id")).as("__h"))
    val folded = currentRows(log).join(horizon, "grp")
      .select(col("key"), lit("add").as("kind"), col("cents"),
        col("grp"), col("__h").as("batch_id"))
    val stage = new Path(logDir + ".stage")
    fs.delete(stage, true)
    folded.write.partitionBy("grp", "batch_id").parquet(stage.toString)
    val live = new Path(logDir)
    fs.delete(live, true)
    fs.rename(stage, live)
  }

  /** The maintained view (internal fence column dropped). */
  def view(spark: SparkSession, dir: String): DataFrame =
    readStore(spark, s"$dir/view", "grp").drop("__last_batch")

  /** The streaming sink wrapper: change-feed stream → maintained view. */
  def mvSink(feed: DataFrame, dir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    feed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, dir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("update")
}
