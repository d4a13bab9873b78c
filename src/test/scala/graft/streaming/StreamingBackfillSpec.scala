package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingBackfill: the batch-backfill → streaming handoff seam.
  *
  *  - backfill + live micro-batches ≡ the full batch dataset (no loss,
  *    no double-count at the boundary);
  *  - redelivered pre-cutoff events in the live feed are dropped;
  *  - replaying a completed live batch is idempotent;
  *  - the seam is immutable: same-cutoff retry ok, moved cutoff loud;
  *  - the live sink refuses to start before a seam exists.
  */
class StreamingBackfillSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 40 events across four days, exactly one ON the cutoff instant
    * (boundary row — must land on the live side, ts >= cutoff).
    */
  private def fixture: DataFrame =
    (0 until 40).map { i =>
      // id 20 sits exactly ON the cutoff instant (the boundary row —
      // must land on the live side, ts >= cutoff)
      val t = if (i == 20) "2025-06-03 00:00:00"
              else f"2025-06-${i / 10 + 1}%02d 0${i % 10}:30:00"
      (i.toLong, ts(t), s"v$i")
    }.toDF("id", "ts", "payload")

  private val cutoff = ts("2025-06-03 00:00:00")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("backfill + live batches reconstruct the full dataset exactly once") {
    val root = tmp("bf-root")
    val all = fixture
    StreamingBackfill.backfill(all, "ts", cutoff, root)

    // live feed: the post-cutoff remainder in two micro-batches
    val live = all.filter($"ts" >= lit(cutoff))
    StreamingBackfill.processBatch(spark, live.filter($"id" % 2 === 0), 0L, "ts", root)
    StreamingBackfill.processBatch(spark, live.filter($"id" % 2 === 1), 1L, "ts", root)

    val served = StreamingBackfill.serve(spark, root)
    assert(sortedRows(served.select($"id", $"ts", $"payload")) ==
      sortedRows(all))
    // the boundary instant itself went to the live side, not backfill
    val backfillOnly = spark.read.parquet(s"$root/data/segment=backfill")
    assert(backfillOnly.filter($"ts" >= lit(cutoff)).count() == 0)
    val liveOnly = spark.read
      .option("basePath", s"$root/data").parquet(s"$root/data/segment=live")
    assert(liveOnly.filter($"ts" === lit(cutoff)).count() == 1)
  }

  test("redelivered pre-cutoff events in a live batch are dropped at the seam") {
    val root = tmp("bf-redeliver")
    val all = fixture
    StreamingBackfill.backfill(all, "ts", cutoff, root)
    // at-least-once overlap: the live feed replays the whole extract
    StreamingBackfill.processBatch(spark, all, 0L, "ts", root)
    val served = StreamingBackfill.serve(spark, root)
    assert(served.count() == all.count(), "a boundary row was lost or duplicated")
    assert(sortedRows(served.select($"id", $"ts", $"payload")) == sortedRows(all))
  }

  test("replaying a completed live batch converges byte-identically") {
    val root = tmp("bf-replay")
    val all = fixture
    StreamingBackfill.backfill(all, "ts", cutoff, root)
    val live = all.filter($"ts" >= lit(cutoff))
    StreamingBackfill.processBatch(spark, live, 0L, "ts", root)
    val first = sortedRows(StreamingBackfill.serve(spark, root))
    StreamingBackfill.processBatch(spark, live, 0L, "ts", root) // crash-replay
    assert(sortedRows(StreamingBackfill.serve(spark, root)) == first)
  }

  test("the seam is immutable: same-cutoff retry ok, moved cutoff refused") {
    val root = tmp("bf-seam")
    StreamingBackfill.backfill(fixture, "ts", cutoff, root)
    // idempotent retry (e.g. backfill job restarted after the manifest landed)
    StreamingBackfill.backfill(fixture, "ts", cutoff, root)
    val moved = intercept[IllegalStateException] {
      StreamingBackfill.backfill(fixture, "ts", ts("2025-06-04 00:00:00"), root)
    }
    assert(moved.getMessage.contains("refusing"))
  }

  test("the live sink refuses to run before the seam exists") {
    val root = tmp("bf-noseam")
    val e = intercept[IllegalStateException] {
      StreamingBackfill.processBatch(spark, fixture, 0L, "ts", root)
    }
    assert(e.getMessage.contains("no seam"))
  }

  test("end-to-end through a real file-source stream with checkpointed batch ids") {
    val root = tmp("bf-e2e"); val feed = tmp("bf-feed"); val ckpt = tmp("bf-ckpt")
    val all = fixture
    StreamingBackfill.backfill(all, "ts", cutoff, root)
    val live = all.filter($"ts" >= lit(cutoff))
    live.write.mode("append").json(feed)
    val stream = spark.readStream
      .schema(live.schema).json(feed)
    StreamingBackfill.liveSink(stream, "ts", root, ckpt).start().awaitTermination()
    assert(sortedRows(StreamingBackfill.serve(spark, root)
      .select($"id", $"ts", $"payload")) == sortedRows(all))
    // restart with no new files: exactly-once no-op
    StreamingBackfill.liveSink(spark.readStream.schema(live.schema).json(feed),
      "ts", root, ckpt).start().awaitTermination()
    assert(StreamingBackfill.serve(spark, root).count() == all.count())
  }
}
