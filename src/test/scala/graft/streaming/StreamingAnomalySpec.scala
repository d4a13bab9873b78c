package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Streaming KPI-anomaly gates: warm-up batches never alert, a steady
  * feed stays quiet, an injected spike alerts with the hand-computed z,
  * the checkpointed sink matches sequential processBatch calls, and a
  * direct batch replay converges (batch-scoped ledger + verdicts).
  */
class StreamingAnomalySpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** A batch of n rows whose cents sum to exactly `total`. */
  private def rows(n: Int, total: Long) = {
    val base = total / n
    (0 until n).map(i => (i.toLong, base + (if (i == 0) total - base * n else 0L)))
      .toDF("id", "cents")
  }

  private def process(ledger: String, verd: String, b: Long, total: Long): Unit =
    StreamingAnomaly.processBatch(spark, rows(10, total), b, "cents",
      ledger, verd, window = 28, minHistory = 4)

  private def verdictsOf(dir: String): Map[Long, (Long, Option[Double], Boolean)] =
    spark.read.parquet(dir)
      .select($"batch_id", $"kpi", $"z", $"is_alert")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          r.getBoolean(3)))).toMap

  private val kpis = Seq(1000L, 1040L, 980L, 1020L, 960L, 5000L)

  test("warm-up never alerts; steady feed quiet; spike alerts with the exact z") {
    val ledger = tmp("an-ledger"); val verd = tmp("an-verd") + "/v"
    kpis.zipWithIndex.foreach { case (t, i) => process(ledger, verd, i.toLong, t) }
    val v = verdictsOf(verd)
    assert(v.keySet == (0L to 5L).toSet)
    // batches 0..3: fewer than minHistory predecessors → NULL z, no alert
    (0L to 3L).foreach { b =>
      assert(v(b)._2.isEmpty && !v(b)._3, s"warm-up batch $b must not score: ${v(b)}")
    }
    // batch 4: history {1000,1040,980,1020}, kpi 960 — in-family, no alert
    assert(v(4L)._2.isDefined && !v(4L)._3, s"steady batch alerted: ${v(4L)}")
    // batch 5: history = batches 0..4; hand-computed z must match exactly
    val hist = kpis.take(5)
    val mean = hist.sum.toDouble / hist.size
    val varr = hist.map(k => k.toDouble * k).sum / hist.size - mean * mean
    val zWant = (5000.0 - mean) / math.sqrt(varr)
    assert(v(5L)._2.contains(zWant) && v(5L)._3,
      s"spike z mismatch: got ${v(5L)}, want $zWant")
  }

  test("a collapsed feed (empty batch) is scored and alerts") {
    val ledger = tmp("an-eledger"); val verd = tmp("an-everd") + "/v"
    kpis.take(5).zipWithIndex.foreach { case (t, i) =>
      process(ledger, verd, i.toLong, t)
    }
    // batch 5 delivers ZERO rows — the broken-producer case; kpi = 0 must
    // be scored against the warm history, not skipped
    StreamingAnomaly.processBatch(spark, rows(10, 1000L).filter(lit(false)),
      5L, "cents", ledger, verd, window = 28, minHistory = 4)
    val v = verdictsOf(verd)
    assert(v.contains(5L), "empty batch wrote no ledger/verdict row")
    assert(v(5L)._1 == 0L)
    assert(v(5L)._3, s"collapsed feed must alert: ${v(5L)}")
    // and the zero-kpi batch joins the history for later scoring
    process(ledger, verd, 6L, 1000L)
    assert(v.size + 1 == verdictsOf(verd).size)
  }

  test("checkpointed sink matches sequential processBatch; replay converges") {
    // sink path: one checkpoint, one file per micro-batch
    val src = tmp("an-src"); val ledger = tmp("an-sledger")
    val verd = tmp("an-sverd") + "/v"; val ckpt = tmp("an-ckpt")
    kpis.foreach { t =>
      rows(10, t).write.mode("append").json(src)
      val q = StreamingAnomaly.sink(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL("id bigint, cents bigint"))
          .json(src),
        "cents", ledger, verd, ckpt, window = 28, minHistory = 4).start()
      q.awaitTermination()
    }
    val viaSink = verdictsOf(verd)
    // sequential reference
    val ledger2 = tmp("an-rledger"); val verd2 = tmp("an-rverd") + "/v"
    kpis.zipWithIndex.foreach { case (t, i) => process(ledger2, verd2, i.toLong, t) }
    assert(viaSink == verdictsOf(verd2), "sink drifted from sequential processBatch")
    // direct replay of a mid-stream batch: identical verdict, ledger intact
    val settled = verdictsOf(verd2)
    process(ledger2, verd2, 3L, kpis(3))
    assert(verdictsOf(verd2) == settled, "replaying batch 3 drifted state")
  }
}
