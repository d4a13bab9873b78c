package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming curriculum/quota ADMISSION — the intake face of the batch
  * curation stack: t21's temperature-smoothed language quotas enforced
  * over a live document stream, with t24's quality ranking deciding WHO
  * fills the remaining quota inside each micro-batch.
  *
  * Why this exists: a training-data pipeline does not get its corpus at
  * rest — crawl shards arrive continuously, and the language mix must be
  * controlled AT INTAKE (admitting everything and downsampling later
  * pays storage + compute for documents that were never going to be
  * trained on). The standard recipe (XLM/mT5): language l receives a
  * budget share ∝ n_l^α with α = 0.5 over a frozen reference profile.
  *
  * Topology per micro-batch:
  *  1. quality = |distinct words| / |words| per doc (t24's metric);
  *  2. per language, rank batch docs (quality DESC, doc_id) — ties are
  *     impossible past doc_id, so admission is deterministic under ANY
  *     partitioning of the batch;
  *  3. admit while prior_admitted(lang) + rank ≤ quota(lang), where
  *     prior_admitted is the LEDGER sum over earlier batches — a
  *     first-come-first-served quota across batches, quality-ordered
  *     within a batch (a doc that arrives after the quota closed is
  *     dropped no matter how good — that is the intake contract; the
  *     batch curation pack re-balances at training time);
  *  4. admitted docs land in `admitted/batch_id=N`, the per-language
  *     state in `ledger/batch_id=N` — a [[SnapshotLedger]] partition
  *     carrying both this batch's increments and the running totals —
  *     both `overwrite` into the batch-scoped directory, so an
  *     at-least-once replay rewrites the same files (idempotent), and
  *     replaying batch k derives only from the snapshot strictly before
  *     k, which a replay never touches.
  *
  * Scale: the per-batch work is one window over the batch (shuffled by
  * lang — bounded by batch size, not corpus size) plus a ≤|langs|-row
  * broadcast of quotas and prior counts. The prior read is ONE bounded
  * snapshot partition (≤ |langs| rows) regardless of how many batches
  * have run. Nothing here holds state proportional to the corpus.
  */
object StreamingAdmission {

  /** t21's temperature quota table over a frozen reference profile:
    * quota_l = floor(budget · √n_l / Σ√n). Deterministic: the denominator
    * folds in lang order (the t21 discipline), and floor keeps the total
    * ≤ budget.
    */
  def quotas(profile: DataFrame, budget: Long): DataFrame = {
    val counts = profile
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), sqrt(col("n_docs")).as("weight"))
    counts
      .agg(sort_array(collect_list(struct(col("lang"), col("weight")))).as("xs"))
      .select(explode(col("xs")).as("x"),
        expr("aggregate(xs, 0D, (acc, e) -> acc + e.weight)").as("denom"))
      .select(col("x.lang").as("lang"),
        floor(lit(budget.toDouble) * col("x.weight") / col("denom")).as("quota"))
  }

  /** t24's quality metric. */
  private def quality = {
    val words = split(col("text"), " ")
    (size(array_distinct(words)).cast("double") / size(words)).as("quality")
  }

  /** The core admission decision over one batch of (doc_id, lang, text …)
    * given the frozen quotas and the prior per-language counts: ranks the
    * batch per language by (quality DESC, doc_id) and keeps rows while
    * prior + rank ≤ quota. Pure — shared by the standalone screen and
    * the composed-intake quota stage.
    */
  def admitWithin(batch: DataFrame, quotaDf: DataFrame, prior: DataFrame): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
    batch
      .withColumn("quality", quality)
      .withColumn("batch_rank", row_number().over(byLang))
      .join(broadcast(quotaDf), Seq("lang"), "left")
      .join(broadcast(prior), col("lang") === col("prior_lang"), "left")
      // a language absent from the frozen profile has no quota: drop it
      .filter(col("quota").isNotNull &&
        coalesce(col("prior"), lit(0L)) + col("batch_rank") <= col("quota"))
  }

  /** TOKEN-budget variant of [[quotas]]: language l's share of a TOKEN
    * budget ∝ √(tokens_l) over the frozen profile — the unit training
    * mixes are actually planned in (a 100-word doc and a 10k-word doc are
    * not the same spend). Same t21 determinism discipline.
    */
  def quotasTokens(profile: DataFrame, budgetTokens: Long): DataFrame = {
    val counts = profile
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " "))).as("n_tokens"))
      .select(col("lang"), sqrt(col("n_tokens")).as("weight"))
    counts
      .agg(sort_array(collect_list(struct(col("lang"), col("weight")))).as("xs"))
      .select(explode(col("xs")).as("x"),
        expr("aggregate(xs, 0D, (acc, e) -> acc + e.weight)").as("denom"))
      .select(col("x.lang").as("lang"),
        floor(lit(budgetTokens.toDouble) * col("x.weight") / col("denom"))
          .as("token_quota"))
  }

  /** Token-budget admission: each doc consumes its whitespace token count
    * (t1's metric) against the language's token quota. Per language the
    * batch is ranked (quality DESC, doc_id) and a doc is admitted iff the
    * PREFIX through it fits: `prior_tokens + cum_tokens(rank ≤ mine) ≤
    * token_quota`. Prefix admission is deliberate: the first doc that
    * overflows closes the language for the batch (no knapsack
    * backfilling with later smaller docs) — that keeps the decision a
    * single running-sum window, deterministic under any partitioning,
    * and means a doc's admission never depends on LOWER-ranked docs.
    * Same ledger/replay contract as [[admitWithin]], with the ledger
    * additionally carrying `n_tokens_admitted`.
    */
  def admitWithinTokens(batch: DataFrame, quotaDf: DataFrame,
      prior: DataFrame): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
    batch
      .withColumn("quality", quality)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(byLang.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(quotaDf), Seq("lang"), "left")
      .join(broadcast(prior), col("lang") === col("prior_lang"), "left")
      .filter(col("token_quota").isNotNull &&
        coalesce(col("prior_tokens"), lit(0L)) + col("cum_tokens") <= col("token_quota"))
  }

  // ---------------------------------------------------------------------
  // LEDGER = SNAPSHOT LEDGER (r11 verdict #4): each `batch_id=N`
  // partition carries the FULL per-language state — this batch's
  // increments (`n_admitted`, 0 for languages carried but untouched)
  // PLUS the running totals (`n_total` / `n_tokens_total`) merged from
  // the predecessor snapshot. Consequences:
  //  - the prior-counts read is ONE bounded partition
  //    ([[SnapshotLedger.before]]) instead of a scan-and-sum over every
  //    historical partition — the "fold the ledger past 1000 batches"
  //    lever the old layout deferred, now structural;
  //  - the increments FEED view is preserved: summing `n_admitted`
  //    across partitions still totals exactly as before (carried rows
  //    contribute 0), so audit consumers (CorpusManifest, the intake
  //    specs) read the same numbers;
  //  - replay/crash contract inherited from the substrate: the merge
  //    reads strictly-earlier state only, so a replayed batch rewrites
  //    byte-identical content, and there is no pin-ordering window.
  // ---------------------------------------------------------------------

  private[streaming] def tokenLedgerBefore(spark: SparkSession, ledgerDir: String,
      batchId: Long): DataFrame = {
    import spark.implicits._
    SnapshotLedger.before(spark, ledgerDir, batchId)
      .map(_.select(col("lang").as("prior_lang"),
        col("n_tokens_total").as("prior_tokens")))
      .getOrElse(Seq.empty[(String, Long)].toDF("prior_lang", "prior_tokens"))
  }

  /** Merge this batch's per-language token increments with the
    * predecessor snapshot and land `batch_id=N`.
    */
  private[streaming] def writeTokenLedger(spark: SparkSession,
      increments: DataFrame, ledgerDir: String, batchId: Long): Unit = {
    import spark.implicits._
    val prev = SnapshotLedger.before(spark, ledgerDir, batchId)
      .map(_.select(col("lang"), col("n_total").as("prev_n"),
        col("n_tokens_total").as("prev_tok")))
      .getOrElse(Seq.empty[(String, Long, Long)].toDF("lang", "prev_n", "prev_tok"))
    val snap = prev.join(increments, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("n_tokens_admitted"), lit(0L)).as("n_tokens_admitted"),
        (coalesce(col("prev_n"), lit(0L)) + coalesce(col("n_admitted"), lit(0L)))
          .as("n_total"),
        (coalesce(col("prev_tok"), lit(0L)) +
          coalesce(col("n_tokens_admitted"), lit(0L))).as("n_tokens_total"))
    SnapshotLedger.write(snap, ledgerDir, batchId)
  }

  /** One micro-batch of token-budget admission (replay entry point). */
  def processBatchTokens(spark: SparkSession, batch: DataFrame, batchId: Long,
      quotaDf: DataFrame, admittedDir: String, ledgerDir: String): Unit = {
    if (batch.isEmpty) return
    val prior = tokenLedgerBefore(spark, ledgerDir, batchId)
    val admitted = admitWithinTokens(batch, quotaDf, prior)
      .select(col("doc_id"), col("lang"), col("quality"), col("n_tokens"),
        col("cum_tokens"))
    admitted.write.mode("overwrite").parquet(s"$admittedDir/batch_id=$batchId")
    writeTokenLedger(spark, admitted
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_admitted"), sum(col("n_tokens")).as("n_tokens_admitted")),
      ledgerDir, batchId)
  }

  /** The streaming sink for token-budget admission. */
  def tokenAdmissionScreen(docs: DataFrame, quotaDf: DataFrame,
      admittedDir: String, ledgerDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchTokens(batch.sparkSession, batch, batchId,
          quotaDf, admittedDir, ledgerDir)
      }

  private[streaming] def ledgerBefore(spark: SparkSession, ledgerDir: String,
      batchId: Long): DataFrame = {
    import spark.implicits._
    SnapshotLedger.before(spark, ledgerDir, batchId)
      .map(_.select(col("lang").as("prior_lang"), col("n_total").as("prior")))
      .getOrElse(Seq.empty[(String, Long)].toDF("prior_lang", "prior"))
  }

  /** Merge this batch's per-language increments `(lang, n_admitted)` with
    * the predecessor snapshot and land `batch_id=N`. Shared with the
    * composed intake's quota stage, so there is exactly ONE ledger format.
    */
  private[streaming] def writeLedger(spark: SparkSession, increments: DataFrame,
      ledgerDir: String, batchId: Long): Unit = {
    import spark.implicits._
    val prev = SnapshotLedger.before(spark, ledgerDir, batchId)
      .map(_.select(col("lang"), col("n_total").as("prev_n")))
      .getOrElse(Seq.empty[(String, Long)].toDF("lang", "prev_n"))
    val snap = prev.join(increments, Seq("lang"), "full_outer")
      .select(col("lang"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        (coalesce(col("prev_n"), lit(0L)) + coalesce(col("n_admitted"), lit(0L)))
          .as("n_total"))
    SnapshotLedger.write(snap, ledgerDir, batchId)
  }

  /** One micro-batch of admission (also the replay entry point the spec
    * drives directly to prove idempotence and stream≡sequential-batch).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      quotaDf: DataFrame, admittedDir: String, ledgerDir: String): Unit = {
    if (batch.isEmpty) return
    val prior = ledgerBefore(spark, ledgerDir, batchId)
    val admitted = admitWithin(batch, quotaDf, prior)
      .select(col("doc_id"), col("lang"), col("source"), col("quality"),
        col("batch_rank"))
    admitted.write.mode("overwrite").parquet(s"$admittedDir/batch_id=$batchId")
    writeLedger(spark, admitted
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_admitted")), ledgerDir, batchId)
  }

  /** The streaming sink: document stream → quota-admitted store. */
  def admissionScreen(docs: DataFrame, quotaDf: DataFrame,
      admittedDir: String, ledgerDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId,
          quotaDf, admittedDir, ledgerDir)
      }

  /** Everything admitted so far (batch_id recovered from the layout). */
  def admitted(spark: SparkSession, admittedDir: String): DataFrame =
    spark.read.option("basePath", admittedDir).parquet(admittedDir)
}
