package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-timestamp golden fixtures for the order-sensitive event
  * queries (w4 sessionize, j5 as-of join, j6 range join).
  *
  * These are the queries most sensitive to tie semantics: two events in
  * the same microsecond must sessionize/match identically in Spark and in
  * the DuckDB oracle, which means every window and every as-of pick needs
  * an explicit deterministic tiebreak — these tests pin the agreed
  * behavior on hand-checked rows so an engine upgrade or a refactor that
  * silently changes tie handling fails here, not in the driver gate.
  */
class TieBreakSpec extends AnyFunSuite with SparkTestKit {

  private def us(x: Long) = Timestamp.from(java.time.Instant.EPOCH.plusNanos(x * 1000L))

  /** Writes an events.parquet fixture with the full Tables.events shape. */
  private def writeEvents(dir: String, rows: Seq[(Long, Long, Long, String)]): Unit =
    spark.createDataFrame(rows.map { case (id, tUs, user, typ) =>
      (id, us(tUs), user, typ, 1.0, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def writeOrders(dir: String, rows: Seq[(Long, Long, Long)]): Unit =
    spark.createDataFrame(rows.map { case (key, cust, tUs) =>
      (key, cust, "F", 100.0, us(tUs), "1-URGENT")
    }).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")

  private val t0 = 1706140800000000L // 2024-01-25T00:00:00Z in epoch-µs

  test("w4: same-timestamp events land in one session, split deterministically") {
    val dir = Files.createTempDirectory("graft-tie-w4").toString
    // user 1: A alone, then B and C in the SAME microsecond 40 min later.
    // Both windows order by (ts, event_id): B opens session 2, C rides it.
    // A ts-only ordering could process C (new_session=0) before B inside
    // the tie and put C into session 1 — the r6-era hazard this pins.
    writeEvents(dir, Seq(
      (1L, t0, 1L, "view"),
      (2L, t0 + 40L * 60 * 1000000, 1L, "click"),
      (3L, t0 + 40L * 60 * 1000000, 1L, "purchase")))
    val got = graft.queries.AdvancedOps.sessionize.run(spark, dir)
      .select(col("user_id"), col("session_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq((1L, 1L, 1L, 0L), (1L, 2L, 2L, 0L)), got.toString)
  }

  test("j5: an event at exactly the order timestamp sees that order; simultaneous orders resolve to the max key") {
    val dir = Files.createTempDirectory("graft-tie-j5").toString
    val day = 86400000000L
    writeOrders(dir, Seq(
      (5L, 1L, t0 - day),  // earlier order
      (10L, 1L, t0),       // two orders in the same microsecond:
      (20L, 1L, t0)))      //   as-of must pick max(o_orderkey) = 20
    writeEvents(dir, Seq(
      (100L, t0, 1L, "view"),            // exactly at order time → 20
      (101L, t0 - 3600000000L, 1L, "view"), // between the two order times → 5
      (102L, t0 - 2 * day, 1L, "view")))    // before any order → null
    val got = graft.queries.AdvancedOps.asofJoin.run(spark, dir)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((100L, 20L), (101L, 5L), (102L, -1L)), got.toString)
  }

  test("j6: the 10-minute window is closed at the old edge, open at the event") {
    val dir = Files.createTempDirectory("graft-tie-j6").toString
    val win = 600000000L
    writeEvents(dir, Seq(
      (1L, t0, 1L, "purchase"),          // counts errors in [t0-win, t0)
      (2L, t0 - win, 2L, "error"),       // exactly window-old → included
      (3L, t0 - 1L, 3L, "error"),        // just before → included
      (4L, t0, 4L, "error"),             // simultaneous with purchase → excluded
      (5L, t0 - win - 1L, 5L, "error"),  // just too old → excluded
      (6L, t0 + day10, 6L, "purchase"))) // far away → 0 errors
    val got = graft.queries.AdvancedOps.rangeJoin.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L), (6L, 0L)), got.toString)
  }

  private val day10 = 10L * 86400000000L
}
