package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingCusum — the live two-sided small-shift monitor. Contracts:
  *  - BOTH ledger recurrences equal the textbook recursive CUSUM
  *    C_t = max(0, C_{t-1} ± (x_t − μ) − k) computed independently in
  *    plain Scala (closed form and recursion must agree batch-for-batch,
  *    exactly, in integers);
  *  - a sustained small UP shift alarms the up side, a sustained DOWN
  *    shift (the scraper-truncation shape) alarms the down side, each
  *    after a bounded delay and sustained; warm-up never alarms;
  *  - replaying any batch is idempotent (same ledger bytes, same
  *    verdict) because the score reads strictly-earlier rows only.
  */
class StreamingCusumSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // deterministic per-batch KPIs: 8 reference batches at ~1000, then a
  // sustained ±8% shift with ±2% hash noise
  private def kpiOf(i: Int, dir: Int): Long = {
    val base = if (i < 8) 1000L else 1000L + dir * 80L
    base + (math.abs((i * 2654435761L) % 41) - 20)
  }
  private def batchOf(i: Int, dir: Int): DataFrame = {
    val k = kpiOf(i, dir)
    Seq.tabulate(4)(j => k / 4 + (if (j == 0) k % 4 else 0L)).toDF("v")
  }

  private def drive(n: Int, dir: Int, ledger: String, verdict: String): Unit =
    (0 until n).foreach { i =>
      StreamingCusum.processBatch(spark, batchOf(i, dir), i.toLong, "v",
        ledger, verdict, refBatches = 8)
    }

  private def verdicts(dir: String): Seq[(Long, Option[Long], Option[Long], Boolean)] =
    spark.read.parquet(dir)
      .select($"batch_id", $"cusum_up_scaled", $"cusum_dn_scaled", $"is_alarm")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3)))
      .sortBy(_._1).toSeq

  /** Independent reference: the plain two-sided recursion over the same
    * integer arithmetic (dev scaled by n_ref, slack = tr/20).
    */
  private def textbook(n: Int, dir: Int): Seq[(Long, Option[Long], Option[Long], Boolean)] = {
    val tr = (0 until 8).map(kpiOf(_, dir)).sum
    val slack = tr / 20
    var cUp = 0L; var cDn = 0L
    (0 until n).map { i =>
      if (i < 8) (i.toLong, None, None, false)
      else {
        val dev = 8L * kpiOf(i, dir) - tr
        cUp = math.max(0L, cUp + (dev - slack))
        cDn = math.max(0L, cDn + (-dev - slack))
        (i.toLong, Some(cUp), Some(cDn), cUp > tr || cDn > tr)
      }
    }
  }

  for ((dirName, dir) <- Seq("up" -> 1, "down" -> -1)) {
    test(s"ledger recurrence == textbook two-sided recursion, exactly ($dirName shift)") {
      val ledger = tmp(s"cusum-l-$dirName"); val verdict = tmp(s"cusum-v-$dirName") + "/v"
      drive(60, dir, ledger, verdict)
      val got = verdicts(verdict)
      val want = textbook(60, dir)
      assert(got == want,
        s"closed form diverged: ${got.zip(want).filter(p => p._1 != p._2).take(3)}")
    }

    test(s"sustained $dirName shift: silent warm-up, bounded delay, sustained alarm on the $dirName side") {
      val ledger = tmp(s"cusum-l2-$dirName"); val verdict = tmp(s"cusum-v2-$dirName") + "/v"
      drive(60, dir, ledger, verdict)
      val vs = verdicts(verdict)
      assert(vs.takeWhile(_._1 < 8).forall(v => !v._4 && v._2.isEmpty && v._3.isEmpty),
        "warm-up batches must carry NULL cusums and never alarm")
      val firstAlarm = vs.collectFirst { case (id, _, _, true) => id }
      assert(firstAlarm.isDefined, s"a sustained 8% $dirName shift must alarm")
      assert(firstAlarm.get >= 8 && firstAlarm.get <= 55,
        s"detection delay out of bounds: ${firstAlarm.get}")
      assert(vs.dropWhile(!_._4).forall(_._4),
        "alarm must be sustained while the shift persists")
      // the alarm comes from the MATCHING side
      val atAlarm = vs.find(_._1 == firstAlarm.get).get
      val tr = (0 until 8).map(kpiOf(_, dir)).sum
      if (dir > 0) assert(atAlarm._2.exists(_ > tr) && atAlarm._3.forall(_ <= tr))
      else assert(atAlarm._3.exists(_ > tr) && atAlarm._2.forall(_ <= tr))
    }
  }

  test("replaying a batch is idempotent (ledger bytes and verdict)") {
    val ledger = tmp("cusum-l3"); val verdict = tmp("cusum-v3") + "/v"
    drive(20, 1, ledger, verdict)
    val before = verdicts(verdict)
    val ledgerRows = spark.read.parquet(ledger)
      .collect().map(_.toString).sorted.toSeq
    // crash-replay of a mid-stream batch and of a warm-up batch
    StreamingCusum.processBatch(spark, batchOf(12, 1), 12L, "v", ledger, verdict,
      refBatches = 8)
    StreamingCusum.processBatch(spark, batchOf(3, 1), 3L, "v", ledger, verdict,
      refBatches = 8)
    assert(verdicts(verdict) == before)
    assert(spark.read.parquet(ledger)
      .collect().map(_.toString).sorted.toSeq == ledgerRows)
  }
}
