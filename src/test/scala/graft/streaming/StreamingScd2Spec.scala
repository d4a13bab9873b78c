package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** StreamingScd2: incremental Type-2 history maintenance.
  *  - dim after N micro-batches ≡ one-shot derivation over all updates;
  *  - at-least-once replay converges (same batch re-processed);
  *  - out-of-order + duplicate cross-batch delivery converges;
  *  - no-op updates are suppressed; interval/current invariants hold.
  */
class StreamingScd2Spec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val ddl = "cust STRING, seq LONG, tier STRING"

  private def updatesDf(rows: (String, Long, String)*): DataFrame =
    rows.toDF("cust", "seq", "tier")

  private def dimOf(dir: String): Seq[(String, Long, String, Int, Long, Any, Int)] =
    StreamingScd2.dim(spark, dir)
      .select($"cust", $"seq", $"tier", $"version", $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getLong(4), if (r.isNullAt(5)) null else r.getLong(5), r.getInt(6)))
      .sortBy(t => (t._1, t._4)).toSeq

  private def oneShot(all: DataFrame): Seq[(String, Long, String, Int, Long, Any, Int)] =
    StreamingScd2.deriveHistory(all, "cust", "seq", Seq("tier"))
      .select($"cust", $"seq", $"tier", $"version", $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3),
        r.getLong(4), if (r.isNullAt(5)) null else r.getLong(5), r.getInt(6)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("file-source stream over two micro-batch runs == one-shot derivation") {
    val srcDir = tmp("scd2-src"); val dir = tmp("scd2-store"); val ckpt = tmp("scd2-ckpt")
    val b1 = updatesDf(("alice", 10L, "bronze"), ("bob", 12L, "silver"),
      ("alice", 20L, "silver"))
    b1.write.mode("append").json(srcDir)
    def run(): Unit = {
      val q = StreamingScd2.scd2Sink(
        spark.readStream.schema(StructType.fromDDL(ddl)).json(srcDir),
        "cust", "seq", Seq("tier"), dir, ckpt).start()
      q.awaitTermination()
    }
    run()
    val b2 = updatesDf(("alice", 30L, "gold"), ("carol", 31L, "bronze"))
    b2.write.mode("append").json(srcDir)
    run()

    assert(dimOf(dir) == oneShot(b1.unionByName(b2)))
    // invariants: exactly one current row per key; intervals chain
    val dim = StreamingScd2.dim(spark, dir)
    val cur = dim.groupBy($"cust").agg(sum($"is_current").as("n"))
    assert(cur.filter($"n" =!= 1).isEmpty)
    val alice = dimOf(dir).filter(_._1 == "alice")
    assert(alice.map(_._4) == Seq(1, 2, 3))
    assert(alice.init.zip(alice.tail).forall { case (a, b) => a._6 == b._5 })
  }

  test("replaying a completed batch is idempotent") {
    val dir = tmp("scd2-replay")
    val b = updatesDf(("k1", 1L, "a"), ("k1", 2L, "b"), ("k2", 5L, "x"))
    StreamingScd2.processBatch(spark, b, "cust", "seq", Seq("tier"), dir)
    val first = dimOf(dir)
    val firstLog = spark.read.parquet(s"$dir/updates").count()
    StreamingScd2.processBatch(spark, b, "cust", "seq", Seq("tier"), dir)
    assert(dimOf(dir) == first)
    assert(spark.read.parquet(s"$dir/updates").count() == firstLog)
  }

  test("out-of-order and duplicate cross-batch delivery converges") {
    val dir = tmp("scd2-ooo")
    val b1 = updatesDf(("k", 1L, "a"), ("k", 5L, "c"))
    val b2 = updatesDf(("k", 3L, "b"), ("k", 5L, "c")) // late seq-3 + dup seq-5
    StreamingScd2.processBatch(spark, b1, "cust", "seq", Seq("tier"), dir)
    StreamingScd2.processBatch(spark, b2, "cust", "seq", Seq("tier"), dir)
    val expect = oneShot(updatesDf(("k", 1L, "a"), ("k", 3L, "b"), ("k", 5L, "c")))
    assert(dimOf(dir) == expect)
    // the late row re-opened the middle of the history: 3 versions, seq-3's
    // interval closes at 5
    val mid = dimOf(dir).find(_._2 == 3L).get
    assert(mid._6 == 5L && mid._7 == 0)
  }

  test("no-op updates are suppressed; conflicting same-(key,seq) resolves deterministically") {
    val dir = tmp("scd2-noop")
    val b = updatesDf(("k", 1L, "a"), ("k", 2L, "a"), ("k", 3L, "b"),
      ("k", 4L, "b"), ("k", 9L, "zz"), ("k", 9L, "aa")) // 9 conflicts
    StreamingScd2.processBatch(spark, b, "cust", "seq", Seq("tier"), dir)
    val rows = dimOf(dir)
    // seq 2 and 4 suppressed (no tier change); seq-9 winner is 'aa' (asc rule)
    assert(rows.map(_._2) == Seq(1L, 3L, 9L))
    assert(rows.last._3 == "aa" && rows.last._7 == 1)
  }
}
