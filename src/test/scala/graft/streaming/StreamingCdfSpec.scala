package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingCdf: the change-data-feed producer on the upsert store.
  *  - classification: inserts, winning updates with true old images,
  *    no-op updates and stale redeliveries suppressed;
  *  - a replayed batch leaves the original feed intact (the store
  *    already merged it — everything classifies no-op);
  *  - composition: the emitted feed drives a StreamingMv to exactly the
  *    aggregate of the final snapshot — store → feed → downstream view.
  */
class StreamingCdfSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) =
    Files.createTempDirectory(p).toString + "/store"  // writer-created path

  private def updates(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("id", "seq", "cents", "tier")

  private def process(snap: String, cdf: String, b: Long, rows: (Long, Long, Long, String)*): Unit =
    StreamingCdf.processBatch(spark, updates(rows: _*), b, "id", "seq", snap, cdf)

  private def feedOf(cdf: String): Seq[(Long, String, Long)] =
    StreamingCdf.feed(spark, cdf)
      .select($"batch_id", $"change_type", $"key")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("classification: insert, winning update with old image, no-op + stale suppressed") {
    val snap = tmp("cdf-snap"); val cdf = tmp("cdf-feed")
    process(snap, cdf, 0L, (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"))
    process(snap, cdf, 1L,
      (1L, 20L, 150L, "a"),  // winning update
      (2L, 10L, 200L, "b"),  // exact no-op redelivery — suppressed
      (3L, 11L, 300L, "c"))  // insert
    assert(feedOf(cdf) == Seq(
      (0L, "insert", 1L), (0L, "insert", 2L),
      (1L, "update", 1L), (1L, "insert", 3L)))
    // the update row carries the true old image
    val upd = StreamingCdf.feed(spark, cdf)
      .filter($"change_type" === "update").select($"old_image.cents", $"new_image.cents")
      .collect().head
    assert(upd.getLong(0) == 100L && upd.getLong(1) == 150L)
    // a STALE redelivery (lower seq) emits nothing and changes nothing
    process(snap, cdf, 2L, (1L, 5L, 999L, "z"))
    assert(feedOf(cdf).count(_._1 == 2L) == 0)
    val snapRow = spark.read.parquet(snap).filter($"id" === 1L).collect().head
    assert(snapRow.getAs[Long]("cents") == 150L)
  }

  test("replayed batch leaves the original feed intact") {
    val snap = tmp("cdf-rsnap"); val cdf = tmp("cdf-rfeed")
    process(snap, cdf, 0L, (1L, 10L, 100L, "a"))
    process(snap, cdf, 1L, (1L, 20L, 150L, "a"))
    val settled = feedOf(cdf)
    process(snap, cdf, 1L, (1L, 20L, 150L, "a")) // replay: already merged
    assert(feedOf(cdf) == settled, "replay rewrote or duplicated the feed")
  }

  test("store -> feed -> downstream MV lands on the snapshot's own aggregate") {
    val snap = tmp("cdf-csnap"); val cdf = tmp("cdf-cfeed"); val mv = tmp("cdf-mv")
    process(snap, cdf, 0L, (1L, 10L, 100L, "a"), (2L, 10L, 40L, "b"), (3L, 10L, 7L, "a"))
    process(snap, cdf, 1L, (1L, 20L, 120L, "a"), (4L, 11L, 60L, "b"))
    process(snap, cdf, 2L, (3L, 30L, 9L, "b"))   // tier move a -> b
    // adapt the CDF envelope to StreamingMv's contract (grp = tier code)
    def grpOf(c: org.apache.spark.sql.Column) =
      when(c === "a", 1L).otherwise(2L)
    (0L to 2L).foreach { b =>
      val f = StreamingCdf.feed(spark, cdf).filter($"batch_id" === b)
        .select($"key",
          when($"change_type" === "insert", "insert").otherwise("update").as("change_type"),
          when($"old_image".isNull, lit(null).cast("bigint"))
            .otherwise(grpOf($"old_image.tier")).as("old_grp"),
          $"old_image.cents".as("old_cents"),
          grpOf($"new_image.tier").as("new_grp"),
          $"new_image.cents".as("new_cents"))
      StreamingMv.processBatch(spark, f, b, mv)
    }
    val got = StreamingMv.view(spark, mv)
      .select($"grp", $"n_rows", $"sum_cents", $"min_cents", $"max_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = spark.read.parquet(snap)
      .groupBy(grpOf($"tier").as("grp"))
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        min($"cents").as("mn"), max($"cents").as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == want)
  }

  test("asOf reconstructs every historical version from the feed") {
    val snap = tmp("cdf-tt-snap"); val cdf = tmp("cdf-tt-feed")
    def snapshotNow(): Seq[(Long, Long, Long, String)] =
      spark.read.parquet(snap).drop("__bucket")
        .select($"id", $"seq", $"cents", $"tier")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
    def asOfRows(v: Long): Seq[(Long, Long, Long, String)] =
      StreamingCdf.asOf(spark, snap, cdf, "id", v)
        .select($"id", $"seq", $"cents", $"tier")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq

    // batch 0: 1, 2 inserted; batch 1: 1 updated, 3 inserted;
    // batch 2: 1 updated again, 2 updated, 4 inserted
    process(snap, cdf, 0L, (1L, 10L, 100L, "a"), (2L, 10L, 200L, "b"))
    val v0 = snapshotNow()
    process(snap, cdf, 1L, (1L, 20L, 150L, "a"), (3L, 10L, 300L, "c"))
    val v1 = snapshotNow()
    process(snap, cdf, 2L,
      (1L, 30L, 175L, "a"), (2L, 20L, 250L, "b"), (4L, 10L, 400L, "d"))
    val v2 = snapshotNow()

    // every historical version reconstructs exactly
    assert(asOfRows(0L) == v0, "version 0 drifted")
    assert(asOfRows(1L) == v1, "version 1 drifted")
    // the current version reads straight through (empty later-slice)
    assert(asOfRows(2L) == v2, "current version drifted")
    // point checks of the semantics: key 1 at v0 carries its first value
    // (twice-updated keys restore the FIRST later old image, not the
    // latest), and keys 3/4 don't exist yet at v0
    assert(asOfRows(0L).find(_._1 == 1L).map(_._3).contains(100L))
    assert(!asOfRows(0L).exists(r => r._1 == 3L || r._1 == 4L))
  }
}
