package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingSessionize: watermark-bounded session_window in append mode.
  *
  *  - finalized sessions ≡ the batch session_window over the same events;
  *  - a session spanning two micro-batches merges in state (one output
  *    row, not two);
  *  - an event later than the watermark is dropped, not mis-merged;
  *  - a restart from the checkpoint with no new data emits nothing new.
  */
class StreamingSessionizeSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  private val schema = "ts TIMESTAMP, user_id LONG, value DOUBLE"

  private def feedOnce(feed: String, out: String, ckpt: String,
      rows: Seq[(Timestamp, Long, Double)]): Unit = {
    rows.toDF("ts", "user_id", "value").write.mode("append").json(feed)
    StreamingSessionize.sink(
        spark.readStream.schema(schema).json(feed), out, ckpt)
      .start().awaitTermination()
  }

  private def emitted(out: String): Seq[String] =
    (try spark.read.parquet(out).collect() catch {
      case _: Throwable => Array.empty[org.apache.spark.sql.Row]
    }).map(_.mkString("|")).sorted.toSeq

  test("cross-batch session merges in state; finalized output equals batch recompute") {
    val feed = tmp("ss-feed"); val out = tmp("ss-out"); val ckpt = tmp("ss-ckpt")
    // batch 0: two events of user 1, 10 min apart (one session growing)
    feedOnce(feed, out, ckpt, Seq(
      (ts("2025-06-01 10:00:00"), 1L, 5.0),
      (ts("2025-06-01 10:10:00"), 1L, 7.0)))
    // batch 1: a third event extends the SAME session; user 2 opens one;
    // nothing finalizes yet (watermark still inside session+gap)
    feedOnce(feed, out, ckpt, Seq(
      (ts("2025-06-01 10:20:00"), 1L, 1.0),
      (ts("2025-06-01 10:21:00"), 2L, 2.0)))
    // batch 2: a far-future event pushes the watermark past both ends
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 20:00:00"), 9L, 0.0)))

    val got = emitted(out).filter(!_.startsWith("9|"))
    // batch recompute over the same (finalized) events
    val batch = Seq(
      (ts("2025-06-01 10:00:00"), 1L, 5.0),
      (ts("2025-06-01 10:10:00"), 1L, 7.0),
      (ts("2025-06-01 10:20:00"), 1L, 1.0),
      (ts("2025-06-01 10:21:00"), 2L, 2.0)).toDF("ts", "user_id", "value")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("session_value"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n_events", $"session_value")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got == batch)
    // the cross-batch session is ONE row with all three events
    assert(got.count(_.startsWith("1|")) == 1)
    assert(got.find(_.startsWith("1|")).get.contains("|3|"))
  }

  test("an event older than the watermark is dropped, not mis-merged") {
    val feed = tmp("sl-feed"); val out = tmp("sl-out"); val ckpt = tmp("sl-ckpt")
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 10:00:00"), 1L, 5.0)))
    // advance the watermark far past 10:00
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 20:00:00"), 9L, 0.0)))
    val before = emitted(out)
    // late straggler for the (already finalized) 10:00 session
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 10:05:00"), 1L, 99.0)))
    // flush again
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-02 08:00:00"), 9L, 0.0)))
    val after = emitted(out)
    // the finalized user-1 session is unchanged and no 99.0 session appeared
    assert(after.filter(_.startsWith("1|")) == before.filter(_.startsWith("1|")))
    assert(!after.exists(_.contains("99")))
  }

  test("restart from the checkpoint with no new data is a no-op") {
    val feed = tmp("sr-feed"); val out = tmp("sr-out"); val ckpt = tmp("sr-ckpt")
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 10:00:00"), 1L, 5.0)))
    feedOnce(feed, out, ckpt, Seq((ts("2025-06-01 20:00:00"), 9L, 0.0)))
    val before = emitted(out)
    StreamingSessionize.sink(
        spark.readStream.schema(schema).json(feed), out, ckpt)
      .start().awaitTermination()
    assert(emitted(out) == before)
  }
}
