package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Joins

/** j9 semantic gates beyond oracle parity: the point-in-time join is
  * LOSSLESS and FANOUT-FREE (every lineitem matches exactly one dimension
  * version), and it genuinely differs from the naive is-current join
  * (which backdates today's attribute onto historical facts).
  */
class TemporalJoinSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("lossless and fanout-free: every lineitem lands in exactly one bucket") {
    val out = Joins.temporalJoin.run(spark, sfDir).cache()
    val matched = out.agg(sum($"n_items")).as[Long].head()
    val items = Tables.lineitem(spark, sfDir).count()
    assert(matched == items, s"temporal join matched $matched of $items lineitems")
    // the early-arriving facts (ship before the customer's first order
    // date — before any dimension history) land in the UNKNOWN member,
    // and that bucket is exactly the pre-history probe count
    val unknown = out.filter($"priority_at_ship".startsWith("UNKNOWN"))
      .agg(coalesce(sum($"n_items"), lit(0L))).as[Long].head()
    val orders = Tables.orders(spark, sfDir)
    val firstOrder = orders.groupBy($"o_custkey".as("custkey"))
      .agg(min($"o_orderdate").as("first_dt"))
    val preHistory = Tables.lineitem(spark, sfDir)
      .join(orders.select($"o_orderkey", $"o_custkey".as("custkey")),
        $"l_orderkey" === $"o_orderkey")
      .join(firstOrder, "custkey")
      .filter($"l_shipdate" < $"first_dt").count()
    assert(unknown == preHistory,
      s"UNKNOWN bucket $unknown != pre-history probes $preHistory")
  }

  test("point-in-time result differs from the naive is-current join") {
    val out = Joins.temporalJoin.run(spark, sfDir)
      .select($"priority_at_ship", $"n_items")
    // naive: stamp every lineitem with the customer's CURRENT priority
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    val current = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"o_custkey".as("custkey"), $"o_orderpriority".as("cur_priority"))
    val naive = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey".as("custkey")),
        $"l_orderkey" === $"o_orderkey")
      .join(current, "custkey")
      .groupBy($"cur_priority".as("priority_at_ship"))
      .agg(count(lit(1)).as("n_items"))
    val diff = out.join(naive, "priority_at_ship")
      .filter(out("n_items") =!= naive("n_items")).count()
    assert(diff > 0,
      "is-current join gave identical counts — the fixture has no priority history " +
        "and the temporal join is untestable against it")
  }

  test("j10 candidate-cap pricer: fails loud past the cap, names j12 as the lever") {
    // the decade rehearsal proved keyless interval overlap is
    // output-quadratic under population densification (SCALE.md r10);
    // the priced plan must refuse to start a run whose projected
    // bucket-join candidates exceed the cap — BEFORE paying for the join
    val e = intercept[IllegalArgumentException] {
      Joins.intervalOverlapPlanPriced(spark, sfDir,
        bucketUs = 3600000000L, candCap = 0L).count()
    }
    assert(e.getMessage.contains("j12_keyed_interval_overlap"),
      s"cap message must point at the keyed production shape: ${e.getMessage}")
    // under the cap, the priced plan is exactly the unpriced plan
    val priced = Joins.intervalOverlapPlanPriced(spark, sfDir,
      bucketUs = 3600000000L, candCap = Long.MaxValue)
      .collect().map(_.mkString("|")).sorted.toSeq
    val plain = Joins.intervalOverlapPlan(spark, sfDir, bucketUs = 3600000000L)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(priced == plain)
  }
}
