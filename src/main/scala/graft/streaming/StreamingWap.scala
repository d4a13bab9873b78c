package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** WRITE-AUDIT-PUBLISH gate for streaming loads — the production pattern
  * that keeps a bad micro-batch OUT of the serving table instead of
  * detecting it afterwards (dq1/dq4 are the after-the-fact audits; this
  * is the load-time gate the reference pipeline's quality checks imply
  * but never enforce — `silver_to_gold.py` computes its marts from
  * whatever landed).
  *
  * Per micro-batch:
  *  1. **Write** the batch to `table/.staging/batch_id=N` — a
  *     dot-prefixed directory, which Spark's file index treats as hidden,
  *     so readers of `table/` can NEVER see half-written or unaudited
  *     data;
  *  2. **Audit** the staged files (read BACK from parquet, not the
  *     in-memory batch — the audit covers the write path too, so file
  *     corruption or schema drift at write time fails the gate, not a
  *     downstream reader);
  *  3. **Publish**: zero violations → one atomic rename
  *     `.staging/batch_id=N` → `table/batch_id=N` (readers see the whole
  *     batch or nothing); any violation → rename into
  *     `quarantine/batch_id=N` instead, and the serving table is
  *     untouched. Either way the per-expectation violation counts and
  *     the decision land in `audit/batch_id=N`.
  *
  * Replay idempotence: every step is batch-scoped — a replayed batch
  * deletes its own previous outcome (published, quarantined, staged
  * leftovers), re-stages, re-audits, and republishes; expectations are
  * pure predicates, so the decision is deterministic and the replay
  * converges to an identical table/quarantine/audit state. A crash
  * between stage and publish leaves only hidden staging files, which the
  * replay clears — at-least-once execution, exactly-once effect.
  *
  * Scale: the audit is one aggregate pass over the staged batch (all
  * expectations evaluated in a single job via conditional sums — no
  * per-check scans), the publish is one metadata rename. Nothing scales
  * with table size; history never re-audits.
  */
object StreamingWap {

  /** One audit rule: rows where `predicate` is false (or null) count as
    * violations. Names must be unique within a gate.
    */
  final case class Expectation(name: String, predicate: Column)

  /** All expectations in ONE aggregate pass: a violation row for check c
    * is one where the predicate is not true (null-hostile: an unexpected
    * NULL fails the check, the conservative gate).
    */
  def audit(staged: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "a WAP gate needs at least one expectation")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "expectation names must be unique")
    val counts = staged.agg(
      count(lit(1)).as("n_rows"),
      expectations.map(e =>
        sum(when(e.predicate, 0L).otherwise(1L)).as(s"v_${e.name}")): _*)
    counts.select(col("n_rows"),
      array(expectations.map(e =>
        struct(lit(e.name).as("check_name"),
          coalesce(col(s"v_${e.name}"), lit(0L)).as("n_violations"))): _*).as("checks"))
      .select(col("n_rows"), explode(col("checks")).as("c"))
      .select(col("c.check_name"), col("c.n_violations"), col("n_rows"))
  }

  private def fs(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The per-batch gate (also the replay entry point the spec drives).
    * Returns true iff the batch was published.
    */
  def processBatch(batch: DataFrame, batchId: Long, expectations: Seq[Expectation],
      tableDir: String, quarantineDir: String, auditDir: String): Boolean = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return false
    val staging = s"$tableDir/.staging/batch_id=$batchId"
    val published = s"$tableDir/batch_id=$batchId"
    val quarantined = s"$quarantineDir/batch_id=$batchId"
    val (hfs, _) = fs(spark, tableDir)
    // a replay owns its batch id: clear every previous outcome of THIS
    // batch (and nothing else) before re-staging
    Seq(staging, published, quarantined).foreach(d => hfs.delete(new Path(d), true))

    // 1. write (hidden from readers of tableDir)
    batch.write.mode("overwrite").parquet(staging)

    // 2. audit the staged FILES
    val verdicts = audit(spark.read.parquet(staging), expectations)
      .select(col("check_name"), col("n_violations"), col("n_rows")).cache()
    val ok = verdicts.agg(sum(col("n_violations"))).collect()(0).getLong(0) == 0L

    // 3. publish or quarantine: one atomic rename either way
    val target = if (ok) published else quarantined
    val (tfs, tpath) = fs(spark, target)
    tfs.mkdirs(tpath.getParent)
    if (!tfs.rename(new Path(staging), tpath))
      throw new IllegalStateException(
        s"WAP: could not ${if (ok) "publish" else "quarantine"} batch $batchId to $target")
    verdicts.withColumn("published", lit(ok))
      .write.mode("overwrite").parquet(s"$auditDir/batch_id=$batchId")
    verdicts.unpersist()
    ok
  }

  /** The published table: only batches that passed their audit. */
  def table(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.option("basePath", tableDir).parquet(tableDir)

  /** Streaming sink: gate each micro-batch through write-audit-publish. */
  def sink(rows: DataFrame, expectations: Seq[Expectation], tableDir: String,
      quarantineDir: String, auditDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, expectations, tableDir, quarantineDir, auditDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .outputMode("append")
}
