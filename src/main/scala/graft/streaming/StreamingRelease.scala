package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.CorpusManifest

/** Incremental corpus-release maintenance — the streaming face of the c4
  * release cut: as the composed intake admits documents batch by batch,
  * maintain the per-language release fingerprint of EVERYTHING admitted
  * so far, without ever rescanning the corpus.
  *
  * This works because the [[CorpusManifest]] fingerprint is MERGEABLE by
  * construction: counts and char totals add, the bit_xor content hash
  * folds associatively/commutatively, and watermarks max — so a
  * per-batch release row is a partial aggregate, and the current release
  * is a |langs|·|batches|-row rollup (metadata-sized, never
  * corpus-sized). The same property is what lets the fingerprint run as
  * a map-side-combinable aggregate in batch; here it buys incremental
  * maintenance: per batch, one narrow aggregate over the batch's
  * admitted docs and one tiny partition write.
  *
  * Storage rides the intake conventions: one `__batch=N` partition per
  * micro-batch, dynamic overwrite ⇒ replay-idempotent (an admitted doc
  * belongs to exactly one batch, so the fold never double-counts).
  * StreamingReleaseSpec proves N batches ≡ the one-shot cut over the
  * union and replay convergence.
  */
object StreamingRelease {

  /** Per-language release rows for ONE batch of admitted docs
    * `(doc_id, lang, text)` — the c4 arithmetic with n_chars = length(text).
    */
  def releaseBatch(admitted: DataFrame): DataFrame = {
    val withChars = admitted.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars"))
    val h = CorpusManifest.rowHash(
      CorpusManifest.canonical(Seq(col("doc_id"), col("lang"), col("n_chars"))))
    withChars.select(col("lang"), col("doc_id"), col("n_chars"), h.as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        coalesce(expr("bit_xor(h)"), lit(0L)).as("xor_hash"),
        max(col("doc_id")).as("watermark"))
  }

  /** Append one batch's release rows idempotently. */
  def appendBatch(admitted: DataFrame, releaseDir: String, batchId: Long): Unit =
    releaseBatch(admitted)
      .withColumn("__batch", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__batch")
      .parquet(releaseDir)

  /** RETRACT documents from the release — the takedown path (GDPR
    * erasure, court order, post-hoc contamination finding): append the
    * NEGATED partial for the taken-down docs. Exact because every
    * fingerprint component is a GROUP under the fold: counts and char
    * totals negate, and bit_xor is its own inverse — after the
    * retraction lands, [[currentRelease]] equals the fingerprint of the
    * SURVIVING docs computed from scratch (spec-pinned), with one
    * documented exception: `watermark` is deliberately HIGH-WATER
    * (monotone max of every doc_id ever admitted — an audit cursor, not
    * a survivor statistic), so retracting the max doc does not lower it.
    *
    * Retraction partitions live in their own id namespace
    * (`__batch = −(batchId)−1`): takedowns arrive on their own stream
    * with their own batch sequence, and a shared namespace would let a
    * retraction dynamic-overwrite an admission partition. Replays
    * rewrite the same negative partition — idempotent like admission.
    *
    * Caller contract: retract only docs previously admitted, exactly
    * once each. The natural source honoring that automatically is a
    * [[StreamingTombstone]] store of the admitted corpus: its delete
    * feed suppresses double-deletes and deletes-of-absent-keys by
    * construction, and each delete's `old_image` carries exactly the
    * columns this fingerprint needs (spec-pinned composition).
    */
  def retractBatch(takedowns: DataFrame, releaseDir: String, batchId: Long): Unit =
    releaseBatch(takedowns)
      .select(col("lang"),
        (-col("n_docs")).as("n_docs"),
        (-col("n_chars")).as("n_chars"),
        col("xor_hash"), col("watermark"))
      .withColumn("__batch", lit(-batchId - 1))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("__batch")
      .parquet(releaseDir)

  /** The current release: fold every batch's partial fingerprints
    * (admissions and retractions alike — the fold can't tell them apart,
    * which is the point).
    */
  def currentRelease(spark: SparkSession, releaseDir: String): DataFrame =
    spark.read.option("basePath", releaseDir).parquet(releaseDir)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(xor_hash)").as("xor_hash"),
        max(col("watermark")).as("watermark"))
}
