package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The armed advisors WIRED into production paths (VERDICT r12 next #1):
  * [[PlannedJoin]] and the z4 partition-sizing arithmetic exist as gated
  * queries (`j15`, `z4`), but until now nothing consumed their verdicts —
  * the domain freight join hard-hinted broadcast, the heavy TPC-H fact
  * joins picked strategies by hand, and the gold writer sized partitions
  * implicitly. This facade routes those sites through the pricers behind
  * one flag:
  *
  *   `spark.graft.advisor.arm = true`   (default false)
  *
  * Off (the default), every wired site runs its hand-picked plan
  * unchanged — zero pricing actions, zero bench impact. Armed, a wired
  * join runs `price → choose → execute` (multiset-identical by
  * [[PlannedJoin]]'s contract) and a wired write repartitions to the
  * 64 MiB operating point from the z4 byte model — and every verdict is
  * recorded in a session-scoped ledger next to the strategy the hand
  * plan had picked, so "does the advisor ever disagree with the human?"
  * is an inspectable fact (AdvisorSpec pins agreement on the real
  * tables; NOTES carries the analysis).
  *
  * Scale shape: arming costs the documented pre-flight price (a few
  * scalar aggregates per wired join, one per wired write) — the toll a
  * 100 TB pipeline pays before committing a fleet to the wrong shuffle.
  * The flag exists precisely so the toll is a choice, not a tax on every
  * sf0.001 test run.
  */
object Advisor {

  /** The arming flag — read per call, so a session can arm/disarm live. */
  val armFlag = "spark.graft.advisor.arm"

  def armed(spark: SparkSession): Boolean =
    spark.conf.getOption(armFlag).exists(_.toBoolean)

  /** One wired-site verdict: what the advisor chose, what the hand plan
    * had picked, and the priced facts behind the choice.
    */
  final case class Decision(
      site: String,
      chosen: String,        // PlannedJoin Strategy label, or "write_partitions_N"
      handPicked: String,    // the strategy the unarmed path hard-codes
      agreed: Boolean,
      outRows: BigInt, topKeyPpm: Long, bytesA: Long, bytesB: Long)

  private val ledger =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, Decision)]()

  /** Verdicts recorded by this session's armed calls, in call order. */
  def decisions(spark: SparkSession): Seq[Decision] = {
    val out = Seq.newBuilder[Decision]
    ledger.forEach { case (s, d) => if (s eq spark) out += d }
    out.result()
  }

  def clear(spark: SparkSession): Unit =
    ledger.removeIf { case (s, _) => s eq spark }

  private def record(spark: SparkSession, d: Decision): Unit =
    ledger.add((spark, d))

  /** Strategy-family agreement: `broadcast_b` vs `broadcast_b` agree;
    * a hand plan that defers to Spark ("auto") agrees with broadcast and
    * shuffle (those are the plans Spark's own stats pick between) but
    * NOT with salted or a cap refusal — the advisor reaching for either
    * is exactly the disagreement worth surfacing.
    */
  private def agrees(chosen: PlannedJoin.Strategy, handPicked: String): Boolean =
    handPicked match {
      case "auto" => chosen match {
        case PlannedJoin.Broadcast(_) | PlannedJoin.Shuffle => true
        case _ => false
      }
      case h => chosen.label == h
    }

  /** A wired equi-join site. `handPlan` is the existing hand-picked plan
    * (run verbatim when disarmed); armed, the advisor prices `a ⋈ b` on
    * `keys` and executes its own verdict. Both paths return the same
    * multiset — [[PlannedJoin]]'s contract — but possibly different
    * column SETS (usingColumns vs expression joins), so callers select
    * their needed columns downstream of this call.
    */
  def join(site: String, handPicked: String,
      a: DataFrame, b: DataFrame, keys: Seq[String],
      joinType: String = "inner")(handPlan: => DataFrame): DataFrame = {
    val spark = a.sparkSession
    if (!armed(spark)) handPlan
    else {
      val (joined, s, p) = PlannedJoin.join(a, b, keys, joinType)
      record(spark, Decision(site, s.label, handPicked,
        agrees(s, handPicked), p.outRows, p.topKeyPpm, p.bytesA, p.bytesB))
      joined
    }
  }

  /** z4's post-shuffle sizing applied to one output frame: partitions =
    * ⌈est_bytes / 64 MiB⌉ (≥ 1) over the same payload model z4 reports.
    */
  def advisedWritePartitions(df: DataFrame): Int =
    partitionsForBytes(PlannedJoin.estimateBytes(df))

  private def partitionsForBytes(bytes: Long): Int = {
    val t = graft.queries.ScaleOps.targetShuffleBytes
    math.max(1L, (bytes + t - 1) / t).toInt
  }

  /** A wired write site: disarmed, the frame passes through (the
    * writer's implicit sizing — whatever upstream shuffles left);
    * armed, repartition to z4's advised count ON the partition columns
    * when given (so a `partitionBy` write emits ≤ advised files per
    * table partition instead of one file per task per partition — the
    * small-files guard), else a plain round-robin repartition.
    *
    * NOTE: the armed estimate pass evaluates `df` once before the write
    * evaluates it again — callers whose frame carries real lineage
    * should use [[writeSized]], which persists across both.
    */
  def sizedForWrite(site: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val spark = df.sparkSession
    if (!armed(spark)) df
    else {
      val bytes = PlannedJoin.estimateBytes(df)
      val n = partitionsForBytes(bytes)
      record(spark, Decision(site, s"write_partitions_$n", "implicit",
        agreed = true, outRows = BigInt(0), topKeyPpm = 0L,
        bytesA = bytes, bytesB = 0L))
      if (partitionCols.nonEmpty) df.repartition(n, partitionCols.map(col): _*)
      else df.repartition(n)
    }
  }

  /** [[sizedForWrite]] with the persist discipline a LINEAGE-CARRYING
    * frame needs: armed, the frame is persisted so the z4 estimate pass
    * and the write share one evaluation (the first wiring re-derived
    * each gold mart TWICE per armed write — AdvisorProbe read the armed
    * pipeline at 4× disarmed at sf0.1, almost all of it recomputation,
    * not pricing); disarmed, the write runs on the raw frame untouched.
    * The persist is scoped to the call — unpersisted before return.
    */
  def writeSized(site: String, df: DataFrame,
      partitionCols: Seq[String] = Nil)(write: DataFrame => Unit): Unit = {
    val spark = df.sparkSession
    if (!armed(spark)) write(df)
    else {
      val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try write(sizedForWrite(site, cached, partitionCols))
      finally { cached.unpersist(); () }
    }
  }
}
