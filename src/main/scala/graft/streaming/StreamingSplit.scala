package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** SPLIT-AT-ADMISSION — the streaming face of the c5 leakage-safe
  * train/val/test split: every admitted document receives its split
  * label AT INGESTION TIME, consistent with the near-dup cluster it
  * joins, so a doc that near-duplicates anything already held can never
  * land on the other side of the train/eval boundary from its
  * antecedent.
  *
  * Rule (shared with batch c5, `TrainingPrep.leakageSafeSplit`): split =
  * hex-threshold cut of `md5(root_id)` where `root_id` is the cluster
  * head. Streaming assigns roots FIRST-ASSIGNMENT-WINS:
  *
  *  - a doc matching nothing becomes its own root (split = md5(own id));
  *  - a doc matching history inherits the stored root of its antecedent
  *    component — history labels are NEVER rewritten (released training
  *    data cannot be re-split retroactively);
  *  - a doc whose matches BRIDGE two previously separate components gets
  *    the smallest stored root, and — iff the bridged components had
  *    been assigned DIFFERENT splits — `split_conflict = true`, the
  *    quarantine signal (batch c5 would have merged them; a stream
  *    cannot relabel what it already released, so it flags instead).
  *
  * When document ids are arrival-monotone (the ingestion contract: ids
  * assigned at intake), the streaming assignment over any batch slicing
  * EQUALS the one-shot batch recompute on every bridge-free component —
  * pinned by StreamingSplitSpec's stream-vs-one-batch equality.
  *
  * Scale: per batch, the component step runs over the batch's VERDICT
  * EDGES (near-dup matches only — orders of magnitude smaller than the
  * batch), via the adaptive [[graft.operators.DupClusters]] machinery;
  * the root lookup is one equi-join against the label store (per-batch
  * partitioned parquet, same replay-idempotent dynamic-overwrite
  * contract as the band index). Nothing is broadcast or rescanned:
  * history label partitions are read only on the matched doc ids.
  */
object StreamingSplit {

  /** The c5 hex-threshold cut: ≈ 89.8 / 5.1 / 5.1 train/val/test. */
  def splitOf(rootId: Column): Column =
    when(md5(rootId.cast("string")) < "e6", "train")
      .when(md5(rootId.cast("string")) < "f3", "val")
      .otherwise("test")

  private def emptyLabels(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id bigint, root_id bigint, split string, " +
          "split_conflict boolean, __batch bigint"))

  /** Every label row published by earlier batches (skips pending-delete
    * partitions, same as the band index's history scan).
    */
  def labelScan(spark: SparkSession, labelDir: String): DataFrame =
    PartitionedIndex.scan(spark, labelDir).getOrElse(emptyLabels(spark))

  /** Assign split labels to one batch given its FULL verified match
    * pairs (`StreamingNearDup.screenBatchWithPairs` second output —
    * the un-collapsed list, because a doc matching members of TWO
    * previously separate components is exactly the bridge this must
    * flag, and the min-match verdict loses that), publish them
    * idempotently under `labelDir/__batch=N`, and return
    * `(doc_id, root_id, split, split_conflict)` for every batch doc.
    */
  def assignBatch(batch: DataFrame, matchPairs: DataFrame, labelDir: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession

    // the batch's match graph: batch docs + their matched antecedents
    // (history doc ids appear as plain nodes; components over this graph
    // connect batch docs that share an antecedent or chain to one)
    val edges = matchPairs.select(col("doc_a"), col("doc_b"))
    val comp = graft.operators.DupClusters.clusters(spark, edges)

    // replay contract: a re-run of batch N must not read its own
    // half-published labels (same `< batchId` rule as the band index)
    val hist = labelScan(spark, labelDir).filter(col("__batch") < batchId)
      .select(col("doc_id"), col("root_id"), col("split"))

    // per component: the stored labels of its HISTORY members.
    // min_by ties are impossible across roots (a root determines one
    // split); countDistinct(split) > 1 is the bridge-with-leakage signal.
    val histMembers = comp.join(hist, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(min(col("root_id")).as("hist_root"),
        min_by(col("split"), col("root_id")).as("hist_split"),
        countDistinct(col("split")).as("n_hist_splits"))

    val labeled = comp.join(histMembers, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("hist_root"), col("cluster_id")).as("root_id"),
        coalesce(col("hist_split"), splitOf(col("cluster_id"))).as("split"),
        coalesce(col("n_hist_splits") > 1, lit(false)).as("split_conflict"))

    // every batch doc gets a label; docs in no match edge are their own
    // root. The left join also DROPS the history nodes comp carried.
    val batchLabels = batch.select(col("doc_id")).distinct()
      .join(labeled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("root_id"), col("doc_id")).as("root_id"),
        coalesce(col("split"), splitOf(col("doc_id"))).as("split"),
        coalesce(col("split_conflict"), lit(false)).as("split_conflict"))

    batchLabels.withColumn("__batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__batch")
      .parquet(labelDir)

    batchLabels
  }

  /** Streaming sink: near-dup screen each micro-batch of
    * `(doc_id, text)` rows, assign split labels, and write the combined
    * verdict `(doc_id, is_near_dup, matched_doc, est_jaccard, root_id,
    * split, split_conflict)` idempotently.
    */
  def sink(docs: DataFrame, indexDir: String, labelDir: String,
      verdictDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (v, pairs) = StreamingNearDup.screenBatchWithPairs(batch, indexDir, batchId)
        val labels = assignBatch(batch, pairs, labelDir, batchId)
        v.join(labels, Seq("doc_id"))
          .withColumn("__batch", lit(batchId))
          .write
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .partitionBy("__batch")
          .parquet(verdictDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
}
