package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingTombstone: deletes for the upsert store + change feed.
  *  - live view: a winning tombstone removes the key; the physical row
  *    is RETAINED so a stale redelivery can never resurrect the key —
  *    the reason deletes are rows, not removals;
  *  - feed classification: delete (old image, null new), re-insert
  *    after delete (null old image), tombstone onto absent /
  *    already-deleted key and losing arrivals all suppressed;
  *  - time travel: asOf(v) ≡ a brute-force recompute from the batch
  *    prefix at every version, across insert/update/delete/re-insert;
  *  - vacuum: reclaims only tombstones at/below the seq horizon, live
  *    rows and younger tombstones untouched; fresh re-insert still works;
  *  - replay: re-running a batch leaves feed and snapshot byte-identical.
  */
class StreamingTombstoneSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(p).toString + "/store" // writer-created path

  // rows: (id, seq, cents, deleted)
  private def updates(rows: (Long, Long, Long, Boolean)*): DataFrame =
    rows.toDF("id", "seq", "cents", "del")

  private def process(snap: String, cdf: String, b: Long,
      rows: (Long, Long, Long, Boolean)*): Unit =
    StreamingTombstone.processBatch(spark, updates(rows: _*), b,
      "id", "seq", "del", snap, cdf)

  private def live(snap: String): Set[(Long, Long, Long)] =
    StreamingTombstone.snapshot(spark, snap, "del")
      .select($"id", $"seq", $"cents")
      .as[(Long, Long, Long)].collect().toSet

  private def feedOf(cdf: String): Seq[(Long, String, Long)] =
    StreamingCdf.feed(spark, cdf)
      .select($"batch_id", $"change_type", $"key")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("live view: winning tombstone deletes; stale redelivery cannot resurrect") {
    val snap = tmp("ts-snap"); val cdf = tmp("ts-feed")
    process(snap, cdf, 0L, (1L, 10L, 100L, false), (2L, 10L, 200L, false))
    process(snap, cdf, 1L, (1L, 20L, 0L, true)) // delete key 1
    assert(live(snap) == Set((2L, 10L, 200L)))
    // the tombstone row is physically retained with its seq
    val raw = spark.read.parquet(snap).filter($"id" === 1L).collect()
    assert(raw.length == 1 && raw.head.getAs[Boolean]("del") &&
      raw.head.getAs[Long]("seq") == 20L,
      "winning tombstone must be retained as a row")
    // a stale redelivery of the ORIGINAL insert (seq 10 < 20) is a no-op:
    // this is the property physical removal would break
    process(snap, cdf, 2L, (1L, 10L, 100L, false))
    assert(live(snap) == Set((2L, 10L, 200L)), "stale insert resurrected a deleted key")
    assert(feedOf(cdf).count(_._1 == 2L) == 0, "stale insert leaked into the feed")
  }

  test("feed classification: delete, re-insert after delete, suppressed no-ops") {
    val snap = tmp("ts-csnap"); val cdf = tmp("ts-cfeed")
    process(snap, cdf, 0L,
      (1L, 10L, 100L, false), (2L, 10L, 200L, false),
      (9L, 10L, 0L, true)) // tombstone for a key that never existed: no-op
    process(snap, cdf, 1L,
      (1L, 20L, 0L, true),   // delete
      (2L, 20L, 250L, false), // update
      (3L, 20L, 300L, false)) // insert
    process(snap, cdf, 2L,
      (1L, 30L, 150L, false), // re-insert after delete
      (2L, 5L, 999L, false),  // stale — suppressed
      (3L, 40L, 0L, true),    // delete
      (9L, 40L, 0L, true))    // tombstone onto never-existed key — no-op
    process(snap, cdf, 3L,
      (3L, 50L, 0L, true))    // re-delete of already-deleted key — no-op
    assert(feedOf(cdf) == Seq(
      (0L, "insert", 1L), (0L, "insert", 2L),
      (1L, "delete", 1L), (1L, "update", 2L), (1L, "insert", 3L),
      (2L, "insert", 1L), (2L, "delete", 3L)))
    // delete rows carry the live old image and a null new image
    val del = StreamingCdf.feed(spark, cdf)
      .filter($"change_type" === "delete" && $"key" === 1L)
      .select($"old_image.cents", $"new_image").collect().head
    assert(del.getLong(0) == 100L && del.isNullAt(1))
    // the re-insert's OLD image is null: live-view semantics, the
    // retained tombstone never leaks into the envelope
    val reins = StreamingCdf.feed(spark, cdf)
      .filter($"batch_id" === 2L && $"key" === 1L)
      .select($"old_image", $"new_image.cents").collect().head
    assert(reins.isNullAt(0) && reins.getLong(1) == 150L)
    assert(live(snap) == Set((1L, 30L, 150L), (2L, 20L, 250L)))
  }

  test("asOf(v) equals a brute-force prefix recompute at every version") {
    val snap = tmp("ts-ttsnap"); val cdf = tmp("ts-ttfeed")
    val batches = Seq(
      Seq((1L, 10L, 100L, false), (2L, 10L, 200L, false), (3L, 10L, 300L, false)),
      Seq((1L, 20L, 0L, true), (2L, 20L, 250L, false)),
      Seq((1L, 30L, 150L, false), (3L, 30L, 0L, true)),
      Seq((2L, 40L, 0L, true)))
    batches.zipWithIndex.foreach { case (rows, b) =>
      process(snap, cdf, b.toLong, rows: _*)
    }
    def bruteAt(v: Int): Set[(Long, Long, Long)] = {
      // winner per key over the prefix = max seq (all distinct here)
      val prefix = batches.take(v + 1).flatten
      prefix.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
        .collect { case (id, seq, cents, false) => (id, seq, cents) }.toSet
    }
    def asOfAt(v: Long): Set[(Long, Long, Long)] =
      StreamingTombstone.asOf(spark, snap, cdf, "id", "del", v)
        .select($"id", $"seq", $"cents")
        .as[(Long, Long, Long)].collect().toSet
    (0 to 3).foreach { v =>
      assert(asOfAt(v.toLong) == bruteAt(v), s"asOf($v) diverged from prefix recompute")
    }
    assert(live(snap) == bruteAt(3))
  }

  test("vacuum reclaims only horizon-expired tombstones; store keeps working") {
    val snap = tmp("ts-vsnap"); val cdf = tmp("ts-vfeed")
    process(snap, cdf, 0L,
      (1L, 10L, 100L, false), (2L, 10L, 200L, false), (3L, 10L, 300L, false))
    process(snap, cdf, 1L, (1L, 20L, 0L, true), (3L, 90L, 0L, true))
    val removed = StreamingTombstone.vacuum(spark, snap, "seq", "del", seqHorizon = 50L)
    assert(removed == 1L, "exactly the seq<=50 tombstone should be reclaimed")
    val raw = spark.read.parquet(snap).select($"id", $"del")
      .as[(Long, Boolean)].collect().toSet
    assert(raw == Set((2L, false), (3L, true)),
      "live rows + younger tombstone must survive vacuum")
    assert(live(snap) == Set((2L, 10L, 200L)))
    // idempotent
    assert(StreamingTombstone.vacuum(spark, snap, "seq", "del", 50L) == 0L)
    // a fresh insert for the vacuumed key works and is classified insert
    process(snap, cdf, 2L, (1L, 60L, 111L, false))
    assert(live(snap) == Set((1L, 60L, 111L), (2L, 10L, 200L)))
    assert(feedOf(cdf).filter(_._1 == 2L) == Seq((2L, "insert", 1L)))
  }

  test("vacuum deletes a bucket that becomes entirely empty") {
    val snap = tmp("ts-ebsnap"); val cdf = tmp("ts-ebfeed")
    // 2 buckets, all keys deleted: every bucket ends all-tombstone
    StreamingTombstone.processBatch(spark,
      updates((1L, 10L, 100L, false), (2L, 10L, 200L, false)), 0L,
      "id", "seq", "del", snap, cdf, nBuckets = 2)
    StreamingTombstone.processBatch(spark,
      updates((1L, 20L, 0L, true), (2L, 20L, 0L, true)), 1L,
      "id", "seq", "del", snap, cdf, nBuckets = 2)
    val removed = StreamingTombstone.vacuum(spark, snap, "seq", "del", 99L)
    assert(removed == 2L)
    assert(live(snap).isEmpty)
    // the store accepts new data after total reclamation
    StreamingTombstone.processBatch(spark,
      updates((5L, 30L, 500L, false)), 2L, "id", "seq", "del", snap, cdf, nBuckets = 2)
    assert(live(snap) == Set((5L, 30L, 500L)))
  }

  test("replaying a batch leaves feed and snapshot identical") {
    val snap = tmp("ts-rsnap"); val cdf = tmp("ts-rfeed")
    process(snap, cdf, 0L, (1L, 10L, 100L, false), (2L, 10L, 200L, false))
    process(snap, cdf, 1L, (1L, 20L, 0L, true), (3L, 20L, 300L, false))
    val settledFeed = feedOf(cdf)
    val settledLive = live(snap)
    process(snap, cdf, 1L, (1L, 20L, 0L, true), (3L, 20L, 300L, false)) // replay
    assert(feedOf(cdf) == settledFeed, "replay rewrote or duplicated the feed")
    assert(live(snap) == settledLive, "replay changed the snapshot")
  }

  test("delete feed drives a retractable MV to the live snapshot's own aggregate") {
    // the tombstone store's feed is EXACTLY the cdc1 envelope StreamingMv
    // consumes — delete rows retract their old image, so the maintained
    // view tracks the LIVE view through deletions and re-inserts without
    // ever reading the snapshot (store → feed → view with deletes)
    val snap = tmp("ts-mvsnap"); val cdf = tmp("ts-mvfeed"); val mv = tmp("ts-mv")
    // rows: (id, seq, cents, del); grp = id % 2 for a 2-group view
    def withGrp(rows: Seq[(Long, Long, Long, Boolean)]) = rows
    val batches = Seq(
      Seq((1L, 10L, 100L, false), (2L, 10L, 200L, false), (3L, 10L, 300L, false),
        (4L, 10L, 400L, false)),
      Seq((1L, 20L, 0L, true), (2L, 20L, 250L, false)),   // delete + update
      Seq((1L, 30L, 150L, false), (3L, 30L, 0L, true)),    // re-insert + delete
      Seq((4L, 40L, 0L, true), (2L, 5L, 999L, false)))     // delete + stale noop
    batches.zipWithIndex.foreach { case (rows, b) =>
      StreamingTombstone.processBatch(spark, withGrp(rows).toDF("id", "seq", "cents", "del"),
        b.toLong, "id", "seq", "del", snap, cdf)
      val feed = StreamingCdf.feed(spark, cdf).filter($"batch_id" === b.toLong)
        .select($"key", $"change_type",
          ($"old_image.id" % 2).as("old_grp"), $"old_image.cents".as("old_cents"),
          ($"new_image.id" % 2).as("new_grp"), $"new_image.cents".as("new_cents"))
      StreamingMv.processBatch(spark, feed, b.toLong, mv)
    }
    val viewRows = StreamingMv.view(spark, mv)
      .select($"grp", $"n_rows", $"sum_cents", $"min_cents", $"max_cents")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val liveAgg = StreamingTombstone.snapshot(spark, snap, "del")
      .groupBy(($"id" % 2).as("grp"))
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(viewRows == liveAgg,
      s"MV over the delete feed diverged from the live view: $viewRows vs $liveAgg")
    // final live state sanity: 1 re-inserted, 2 updated, 3 and 4 deleted
    assert(live(snap) == Set((1L, 30L, 150L), (2L, 20L, 250L)))
  }

  test("streaming sink end-to-end: two AvailableNow drains") {
    val snap = tmp("ts-ssnap"); val cdf = tmp("ts-sfeed")
    val ckpt = Files.createTempDirectory("ts-ckpt").toString
    val src = Files.createTempDirectory("ts-src").toString
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(updates((0L, 0L, 0L, false)).schema)
        .parquet(src)
      val q = StreamingTombstone.sink(stream, "id", "seq", "del",
        snap, cdf, ckpt).start()
      q.awaitTermination()
    }
    updates((1L, 10L, 100L, false), (2L, 10L, 200L, false))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    updates((1L, 20L, 0L, true), (3L, 20L, 300L, false))
      .coalesce(1).write.mode("append").parquet(src)
    drain()
    assert(live(snap) == Set((2L, 10L, 200L), (3L, 20L, 300L)))
    val types = StreamingCdf.feed(spark, cdf)
      .select($"change_type").as[String].collect().sorted.toSeq
    assert(types == Seq("delete", "insert", "insert", "insert"))
  }
}
