package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.AdvancedOps

/** Semantic gates for the advanced operators, beyond oracle parity. */
class AdvancedOpsSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("sessionize: sessions partition events; gaps within a session ≤ 30min") {
    val out = AdvancedOps.sessionize.run(spark, sfDir)
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(out.agg(sum($"n_events")).first.getLong(0) == totalEvents)
    assert(out.filter($"duration_us" < 0).count() == 0)
    // session ids are 1..k contiguous per user
    val bad = out.groupBy($"user_id")
      .agg(max($"session_id").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad == 0)
  }

  test("rollup: grand total equals detail sum; level flags consistent") {
    val out = AdvancedOps.rollupAgg.run(spark, sfDir).cache()
    val grand = out.filter($"is_region_total" === 1 && $"is_nation_total" === 1)
    assert(grand.count() == 1)
    val detailSum = out.filter($"is_region_total" === 0 && $"is_nation_total" === 0)
      .agg(sum($"total_balance")).first.getDouble(0)
    assert(math.abs(grand.first.getAs[Double]("total_balance") - detailSum) < 1e-6)
    // region subtotals likewise reconcile
    val regionSubs = out.filter($"is_region_total" === 0 && $"is_nation_total" === 1)
      .agg(sum($"total_balance")).first.getDouble(0)
    assert(math.abs(regionSubs - detailSum) < 1e-6)
  }

  test("asof join golden: picks the latest order at-or-before each event") {
    // handcrafted timeline for one user:
    //   orders at t=100, t=200 (two orders: keys 7 and 9 — tie on time), t=500
    //   events at t=150, t=200, t=400, t=50
    val orders = Seq((1L, 100L, 3L), (1L, 200L, 7L), (1L, 200L, 9L), (1L, 500L, 11L))
      .toDF("o_custkey", "t", "o_orderkey")
      .select($"o_custkey", timestamp_micros($"t").as("o_orderdate"), $"o_orderkey")
    val events = Seq((1L, 150L, 101L), (1L, 200L, 102L), (1L, 400L, 103L), (1L, 50L, 104L))
      .toDF("user_id", "t", "event_id")

    import org.apache.spark.sql.expressions.Window
    val o = orders.groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"))
      .select($"o_custkey".as("k"), unix_micros($"o_orderdate").as("t_us"),
        lit(null).cast("long").as("event_id"), $"o_orderkey", lit(0).as("is_event"))
    val e = events.select($"user_id".as("k"), $"t".as("t_us"), $"event_id",
      lit(null).cast("long").as("o_orderkey"), lit(1).as("is_event"))
    val w = Window.partitionBy($"k")
      .orderBy($"t_us", $"is_event", desc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = o.unionByName(e)
      .withColumn("last_order_key", last($"o_orderkey", ignoreNulls = true).over(w))
      .filter($"is_event" === 1)
      .select($"event_id", $"last_order_key")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got == Map(
      104L -> -1L,  // before any order → null
      101L -> 3L,   // after t=100 order
      102L -> 9L,   // AT t=200: sees the tied orders, max key wins
      103L -> 9L))  // between 200 and 500
  }

  test("pivot columns carry per-segment sums that reconcile with the total") {
    val out = AdvancedOps.pivotRevenue.run(spark, sfDir)
    val pivotTotal = out.select(
      AdvancedOps.segments.map(s => coalesce(col(s), lit(0.0))).reduce(_ + _).as("t"))
      .agg(sum($"t")).first.getDouble(0)
    val direct = Tables.orders(spark, sfDir)
      .agg(sum(queries.Exact.dec2($"o_totalprice")).cast("double")).first.getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-4)
  }
}
