package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Incremental-profile gates: the cumulative profile over N micro-batches
  * must equal a direct one-shot recompute over the concatenated data
  * (including the EXACT distinct through the bitmap OR-fold — keys
  * repeated across batches must not double-count), and replays converge.
  */
class StreamingProfileSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // (id, cents, qty) rows; key = id over a domain of 10_000; nulls in qty
  private def rows(ids: Range, centsBase: Long): Seq[(Long, Long, Option[Long])] =
    ids.map { i =>
      (i.toLong % 10000L, centsBase + i % 97,
        if (i % 7 == 0) None else Some((i % 13).toLong))
    }

  private def runStream(src: String, statsDir: String, bmDir: String,
      ckpt: String): Unit = {
    val q = StreamingProfile.sink(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "id bigint, cents bigint, qty bigint"))
        .json(src),
      numCols = Seq("cents", "qty"), keyCol = "id", domain = 10000,
      statsDir = statsDir, bitmapDir = bmDir, checkpointDir = ckpt).start()
    q.awaitTermination()
  }

  test("cumulative profile over 2 batches equals a one-shot recompute; distinct is exact") {
    val srcDir = tmp("prof-src")
    val statsDir = tmp("prof-stats") + "/s"
    val bmDir = tmp("prof-bm") + "/b"

    val b0 = rows(0 until 3000, 1000L)
    val b1 = rows(1500 until 5000, 2000L) // ids 1500..2999 repeat across batches
    b0.toDF("id", "cents", "qty").write.mode("append").json(srcDir)
    runStream(srcDir, statsDir, bmDir, tmp("prof-ck1"))
    b1.toDF("id", "cents", "qty").write.mode("append").json(srcDir)
    runStream(srcDir, statsDir, bmDir, tmp("prof-ck2"))

    val cum = StreamingProfile.cumulative(spark, statsDir, bmDir)
      .collect().map(r => r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("min_num"), r.getAs[Long]("max_num"),
          r.getAs[Long]("n_distinct_keys")))).toMap

    val all = b0 ++ b1
    val expectedDistinct = all.map(_._1).distinct.size.toLong
    assert(cum.keySet == Set("cents", "qty"))
    val cents = all.map(_._2)
    assert(cum("cents") == ((all.size.toLong, 0L, cents.min, cents.max, expectedDistinct)))
    val qty = all.flatMap(_._3)
    assert(cum("qty") == ((all.size.toLong, (all.size - qty.size).toLong,
      qty.min, qty.max, expectedDistinct)))
    // the exactness point: 6500 rows, repeated ids — a per-batch recount
    // would sum to 6500-distinct; the bitmap OR must NOT double-count
    assert(expectedDistinct < all.size)
  }

  test("replaying a batch converges (partials are batch-scoped overwrites)") {
    val srcDir = tmp("prof-src2")
    val statsDir = tmp("prof-stats2") + "/s"
    val bmDir = tmp("prof-bm2") + "/b"
    rows(0 until 1000, 500L).toDF("id", "cents", "qty")
      .write.mode("append").json(srcDir)
    runStream(srcDir, statsDir, bmDir, tmp("prof-ck3"))
    val first = StreamingProfile.cumulative(spark, statsDir, bmDir)
      .collect().map(_.toString).sorted.toSeq
    runStream(srcDir, statsDir, bmDir, tmp("prof-ck4")) // fresh ckpt → replay
    val second = StreamingProfile.cumulative(spark, statsDir, bmDir)
      .collect().map(_.toString).sorted.toSeq
    assert(second == first)
  }

  test("out-of-domain key fails loudly (a26's exactness contract)") {
    val (_, bitmap) = StreamingProfile.profileBatch(
      Seq((20000L, 1L, 1L)).toDF("id", "cents", "qty"),
      Seq("cents"), "id", domain = 10000)
    val e = intercept[org.apache.spark.SparkException] { bitmap.collect() }
    assert(e.getMessage.contains("bitmap_bytes") ||
      e.getCause != null && e.getCause.getMessage.contains("bitmap_bytes"),
      s"expected the loud bitmap_bytes domain failure, got: ${e.getMessage}")
  }
}
