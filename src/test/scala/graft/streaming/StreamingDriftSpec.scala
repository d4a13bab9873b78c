package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Streaming drift-monitor gates: per-batch bins must equal a batch
  * dq5-style recompute of the same slice against the same frozen
  * reference (both alignment directions included), the alert fires on a
  * shifted batch and stays quiet on an in-distribution one, and replays
  * converge to identical state.
  */
class StreamingDriftSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val width = 100L

  /** Deterministic in-distribution values: bins 0..4, triangular mass. */
  private def inDist(ids: Range): Seq[(Long, Long)] =
    ids.map { i => (i.toLong, ((i % 15) match {
      case k if k < 5 => 0L; case k if k < 9 => 1L; case k if k < 12 => 2L
      case k if k < 14 => 3L; case _ => 4L
    }) * width + (i % width)) }

  /** The spec's own dq5-shape recompute (independent arithmetic path). */
  private def expectedBins(batch: Seq[(Long, Long)], ref: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long)] = {
    def hist(rows: Seq[(Long, Long)]): Map[Long, Long] =
      rows.groupBy(_._2 / width).view.mapValues(_.size.toLong).toMap
    def shares(h: Map[Long, Long]): Map[Long, Long] = {
      val t = h.values.sum
      h.view.mapValues(n => n * 1000000L / t).toMap
    }
    val (hb, hr) = (hist(batch), hist(ref))
    val (p, q) = (shares(hb), shares(hr))
    (hb.keySet ++ hr.keySet).map { b =>
      val (pb, qb) = (p.getOrElse(b, 0L), q.getOrElse(b, 0L))
      val d = if (pb + qb == 0) 0L else (pb - qb) * (pb - qb) / (pb + qb)
      b -> ((hb.getOrElse(b, 0L), pb, qb, d))
    }.toMap
  }

  private def readBins(dir: String, batch: Long): Map[Long, (Long, Long, Long, Long)] =
    spark.read.parquet(dir).filter($"__batch" === batch)
      .collect().map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_batch"), r.getAs[Long]("p_ppm"),
          r.getAs[Long]("q_ppm"), r.getAs[Long]("drift_contrib")))).toMap

  private def runStream(src: String, ref: StreamingDrift.Reference,
      binsDir: String, sumDir: String, ckpt: String): Unit = {
    val q = StreamingDrift.sink(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id bigint, cents bigint"))
        .json(src),
      ref, "cents", binsDir, sumDir, alertThreshold = 200000L, ckpt).start()
    q.awaitTermination()
  }

  test("per-batch bins equal the dq5 recompute; alert fires only on the shifted batch") {
    val refRows = inDist(0 until 3000)
    val ref = StreamingDrift.prepare(refRows.toDF("id", "cents"), "cents", width)
    val srcDir = tmp("drift-src")
    val binsDir = tmp("drift-bins") + "/b"
    val sumDir = tmp("drift-sum")
    val ckpt = tmp("drift-ckpt")

    // batch 0: in-distribution sample (same generator, different ids)
    val b0 = inDist(5000 until 6500)
    b0.toDF("id", "cents").write.mode("append").json(srcDir)
    runStream(srcDir, ref, binsDir, sumDir, ckpt)

    // batch 1: SHIFTED — all mass moved up 3 bins (novel bins appear,
    // reference bins empty out)
    val b1 = inDist(7000 until 8500).map { case (i, v) => (i, v + 3 * width) }
    b1.toDF("id", "cents").write.mode("append").json(srcDir)
    runStream(srcDir, ref, binsDir, sumDir, ckpt)

    assert(readBins(binsDir, 0L) == expectedBins(b0, refRows))
    assert(readBins(binsDir, 1L) == expectedBins(b1, refRows))

    def summary(b: Long) = spark.read.parquet(s"$sumDir/batch_id=$b")
      .select($"n_rows", $"total_drift", $"is_alert").head()
    val s0 = summary(0L); val s1 = summary(1L)
    assert(s0.getLong(0) == b0.size && !s0.getBoolean(2),
      s"in-distribution batch must not alert: $s0")
    assert(s1.getLong(0) == b1.size && s1.getBoolean(2),
      s"shifted batch must alert: $s1")
    // both alignment directions present in the shifted batch's bins:
    // reference-only bins (n_batch=0, q>0) and novel bins (q=0, p>0)
    val bins1 = readBins(binsDir, 1L)
    assert(bins1.exists { case (_, (n, _, q, _)) => n == 0L && q > 0L })
    assert(bins1.exists { case (_, (n, p, q, _)) => q == 0L && p > 0L && n > 0L })
  }

  test("replaying a batch converges to identical bins and summary") {
    val refRows = inDist(0 until 3000)
    val ref = StreamingDrift.prepare(refRows.toDF("id", "cents"), "cents", width)
    val srcDir = tmp("drift-src2")
    val binsDir = tmp("drift-bins2") + "/b"
    val sumDir = tmp("drift-sum2")

    val b0 = inDist(5000 until 6000)
    b0.toDF("id", "cents").write.mode("append").json(srcDir)
    runStream(srcDir, ref, binsDir, sumDir, tmp("drift-ckpt2a"))
    val first = readBins(binsDir, 0L)
    val firstSum = spark.read.parquet(s"$sumDir/batch_id=0")
      .collect().map(_.toString).sorted.toSeq
    // fresh checkpoint → batch 0 re-delivers (at-least-once replay)
    runStream(srcDir, ref, binsDir, sumDir, tmp("drift-ckpt2b"))
    assert(readBins(binsDir, 0L) == first)
    assert(spark.read.parquet(s"$sumDir/batch_id=0")
      .collect().map(_.toString).sorted.toSeq == firstSum)
  }

  test("refreshing sink re-freezes on a new published reference; replay keeps its pin") {
    val refStore = tmp("drift-refstore")
    val binsDir = tmp("drift-bins3") + "/b"
    val sumDir = tmp("drift-sum3")
    val shifted = inDist(0 until 3000).map { case (i, v) => (i, v + 3 * width) }
    // v0 = the original distribution
    StreamingDrift.publishReference(spark, refStore, 0L,
      inDist(0 until 3000).toDF("id", "cents"), "cents", width)

    def process(b: Long, rows: Seq[(Long, Long)]): Unit =
      StreamingDrift.processBatchRefreshing(spark, rows.toDF("id", "cents"),
        b, refStore, "cents", binsDir, sumDir, alertThreshold = 200000L)
    def summary(b: Long): (Long, Boolean, Long) = {
      val r = spark.read.parquet(s"$sumDir/batch_id=$b")
        .select($"total_drift", $"is_alert", $"ref_version").head()
      (r.getLong(0), r.getBoolean(1), r.getLong(2))
    }

    // batch 0: shifted traffic vs v0 → alert, pinned to version 0
    process(0L, shifted.slice(0, 1500))
    val s0 = summary(0L)
    assert(s0._2 && s0._3 == 0L, s"shifted batch vs v0 must alert: $s0")

    // the corpus re-releases around the shift: v1 = shifted distribution
    StreamingDrift.publishReference(spark, refStore, 1L,
      shifted.toDF("id", "cents"), "cents", width)

    // batch 1: same shifted traffic now scores vs v1 → quiet
    process(1L, shifted.slice(1500, 3000))
    val s1 = summary(1L)
    assert(!s1._2 && s1._3 == 1L,
      s"post-refresh batch must score against v1 and stay quiet: $s1")

    // REPLAY of batch 0 after the refresh: the pin holds — still scored
    // against v0, summary and bins byte-identical
    val bins0 = readBins(binsDir, 0L)
    process(0L, shifted.slice(0, 1500))
    assert(summary(0L) == s0, "replay must reuse the pinned reference version")
    assert(readBins(binsDir, 0L) == bins0)
  }

  test("pin survives a crash between bins and ledger; a torn ledger reads as no-pin") {
    // r10 advice: the old shape pinned ref_version only in the LEDGER
    // row (written after the bins), so a crash between the two writes
    // let the replay resolve a newer reference and rescore differently.
    // The pin file is now persisted BEFORE scoring — simulate the crash
    // by deleting the ledger dir and verify the replay still scores
    // against the pinned version.
    val refStore = tmp("drift-refstore4")
    val binsDir = tmp("drift-bins4") + "/b"
    val sumDir = tmp("drift-sum4")
    val shifted = inDist(0 until 3000).map { case (i, v) => (i, v + 3 * width) }
    StreamingDrift.publishReference(spark, refStore, 0L,
      inDist(0 until 3000).toDF("id", "cents"), "cents", width)
    def process(b: Long, rows: Seq[(Long, Long)]): Unit =
      StreamingDrift.processBatchRefreshing(spark, rows.toDF("id", "cents"),
        b, refStore, "cents", binsDir, sumDir, alertThreshold = 200000L)
    def summary(b: Long): (Long, Boolean, Long) = {
      val r = spark.read.parquet(s"$sumDir/batch_id=$b")
        .select($"total_drift", $"is_alert", $"ref_version").head()
      (r.getLong(0), r.getBoolean(1), r.getLong(2))
    }

    process(0L, shifted.slice(0, 1500))
    val s0 = summary(0L)
    assert(s0._2 && s0._3 == 0L)
    // crash window: bins + pin landed, ledger did not; then the corpus
    // re-releases around the shift before the replay arrives
    val fs = new org.apache.hadoop.fs.Path(sumDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sumDir/batch_id=0"), true)
    StreamingDrift.publishReference(spark, refStore, 1L,
      shifted.toDF("id", "cents"), "cents", width)
    process(0L, shifted.slice(0, 1500))
    assert(summary(0L) == s0,
      "replay after a bins-but-no-ledger crash must rescore against the " +
        "PINNED v0 (alerting), not the newly published v1")

    // a torn (unreadable) ledger dir with no pin must read as no-pin,
    // not throw: batch 1 with garbage pre-staged in its ledger path
    val torn = new org.apache.hadoop.fs.Path(s"$sumDir/batch_id=1")
    fs.mkdirs(torn)
    val out = fs.create(new org.apache.hadoop.fs.Path(torn, "part-garbage.parquet"), true)
    try out.write("not parquet".getBytes("UTF-8")) finally out.close()
    process(1L, shifted.slice(1500, 3000))
    val s1 = summary(1L)
    assert(!s1._2 && s1._3 == 1L,
      s"torn ledger must fall through to newest published version: $s1")
  }
}
