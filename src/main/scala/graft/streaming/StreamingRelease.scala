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

  /** The current release: fold every batch's partial fingerprints. */
  def currentRelease(spark: SparkSession, releaseDir: String): DataFrame =
    spark.read.option("basePath", releaseDir).parquet(releaseDir)
      .groupBy(col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(xor_hash)").as("xor_hash"),
        max(col("watermark")).as("watermark"))
}
