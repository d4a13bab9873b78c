package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingCusum — the live small-shift monitor. Contracts:
  *  - the ledger recurrence equals the TEXTBOOK recursive CUSUM
  *    C_t = max(0, C_{t-1} + x_t − μ − k) computed independently in
  *    plain Scala (the closed form and the recursion must agree
  *    batch-for-batch, exactly, in integers);
  *  - a sustained small shift alarms after a bounded delay and stays in
  *    alarm; the stationary prefix never alarms; warm-up never alarms;
  *  - replaying any batch is idempotent (same ledger bytes, same
  *    verdict) because the score reads strictly-earlier rows only.
  */
class StreamingCusumSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // deterministic per-batch KPIs: 8 reference batches at ~1000, then a
  // +8% sustained shift with ±2% hash noise
  private def kpiOf(i: Int): Long = {
    val base = if (i < 8) 1000L else 1080L
    base + (math.abs((i * 2654435761L) % 41) - 20)
  }
  private def batchOf(i: Int): DataFrame =
    Seq.tabulate(4)(j => kpiOf(i) / 4 + (if (j == 0) kpiOf(i) % 4 else 0L))
      .toDF("v")

  private def drive(n: Int, ledger: String, verdict: String): Unit =
    (0 until n).foreach { i =>
      StreamingCusum.processBatch(spark, batchOf(i), i.toLong, "v",
        ledger, verdict, refBatches = 8)
    }

  private def verdicts(dir: String): Seq[(Long, Option[Long], Boolean)] =
    spark.read.parquet(dir)
      .select($"batch_id", $"cusum_scaled", $"is_alarm")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .sortBy(_._1).toSeq

  test("ledger recurrence == textbook recursive CUSUM, exactly") {
    val ledger = tmp("cusum-l"); val verdict = tmp("cusum-v") + "/v"
    drive(40, ledger, verdict)
    val got = verdicts(verdict)

    // independent reference implementation: the plain recursion over the
    // same integer arithmetic (dev scaled by n_ref, slack = tr/20)
    val tr = (0 until 8).map(kpiOf).sum // reference total
    val nr = 8L
    val slack = tr / 20
    var c = 0L
    val want = (0 until 40).map { i =>
      if (i < 8) (i.toLong, None, false)
      else {
        c = math.max(0L, c + (nr * kpiOf(i) - tr - slack))
        (i.toLong, Some(c), c > tr)
      }
    }
    assert(got == want,
      s"closed form diverged from the recursion: ${got.zip(want).filter(p => p._1 != p._2).take(3)}")
  }

  test("sustained small shift: no alarm in warm-up, bounded delay, then sustained") {
    val ledger = tmp("cusum-l2"); val verdict = tmp("cusum-v2") + "/v"
    drive(60, ledger, verdict)
    val vs = verdicts(verdict)
    assert(vs.takeWhile(_._1 < 8).forall(v => !v._3 && v._2.isEmpty),
      "warm-up batches must carry NULL cusum and never alarm")
    val firstAlarm = vs.collectFirst { case (id, _, true) => id }
    assert(firstAlarm.isDefined, "a sustained +8% shift must alarm")
    // dev−slack ≈ 8·(80−50) = 240/batch scaled; the alarm line tr ≈ 8000
    // → ~34 batches of accrual after the shift at batch 8
    assert(firstAlarm.get >= 8 && firstAlarm.get <= 55,
      s"detection delay out of bounds: ${firstAlarm.get}")
    assert(vs.dropWhile(!_._3).forall(_._3),
      "alarm must be sustained while the shift persists")
  }

  test("replaying a batch is idempotent (ledger bytes and verdict)") {
    val ledger = tmp("cusum-l3"); val verdict = tmp("cusum-v3") + "/v"
    drive(20, ledger, verdict)
    val before = verdicts(verdict)
    val ledgerBefore = spark.read.parquet(ledger)
      .collect().map(_.toString).sorted.toSeq
    // crash-replay of a mid-stream batch and of a warm-up batch
    StreamingCusum.processBatch(spark, batchOf(12), 12L, "v", ledger, verdict,
      refBatches = 8)
    StreamingCusum.processBatch(spark, batchOf(3), 3L, "v", ledger, verdict,
      refBatches = 8)
    assert(verdicts(verdict) == before)
    assert(spark.read.parquet(ledger)
      .collect().map(_.toString).sorted.toSeq == ledgerBefore)
  }
}
