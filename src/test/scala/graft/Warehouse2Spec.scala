package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Warehouse2

/** Plan shapes + semantic invariants for the TPC-H completion pack
  * (q2/q8/q9/q10/q11/q13/q15/q16/q17/q20/q21/q22). Values are
  * oracle-gated by the driver; these pin the properties that matter at
  * 100 TB: predicate pushdown to the fact scan, broadcast dims, no
  * cartesian products outside the deliberate 1-row global-scalar joins,
  * and — for q21 — that the exists/not-exists pair costs ZERO fact
  * self-joins (it folds into per-order aggregates).
  */
class Warehouse2Spec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  private def simplePlanOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("q10: date filter pushed, returnflag pushed, top-20 is TakeOrdered") {
    val df = Warehouse2.q10Returned.run(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"), p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val sp = simplePlanOf(df)
    assert(!sp.contains("CartesianProduct") && !sp.contains("BroadcastNestedLoopJoin"), sp)
  }

  test("q13: zero-order customers appear in the distribution (left-join filter placement)") {
    val rows = Warehouse2.q13CustDist.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    val nCust = Tables.customer(spark, sfDir).count()
    assert(rows.values.sum == nCust, "every customer lands in exactly one bucket")
    // moving the priority filter to WHERE would make this impossible: a
    // customer whose every order is 1-URGENT must land in bucket 0
    val urgentOnly = Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.when($"o_orderpriority" =!= "1-URGENT", 1)
          .otherwise(0)).as("has_other"))
      .filter($"has_other" === 0).count()
    val noOrders = nCust - Tables.orders(spark, sfDir)
      .select($"o_custkey").distinct().count()
    assert(rows.getOrElse(0L, 0L) == urgentOnly + noOrders)
  }

  test("q15: ties would all surface (exact-decimal max equality), supplier broadcast") {
    val df = Warehouse2.q15TopSupplier.run(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val top = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(top.length == 1, "all returned suppliers share the max revenue")
    assert(simplePlanOf(df).contains("BroadcastHashJoin"), simplePlanOf(df))
  }

  test("q11: threshold is a 1-row broadcast, not a re-aggregation of the fact") {
    val df = Warehouse2.q11ImportantParts.run(spark, sfDir)
    // the part_value sub-aggregate is cached: both consumers (rows +
    // global sum) must read the InMemoryTableScan, not re-derive the
    // aggregate from the fact
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("InMemoryTableScan")) >= 2, sp)
    val rows = df.collect()
    assert(rows.nonEmpty)
  }

  test("q17: per-part avg is decorrelated (grouped agg), threshold semantics hold") {
    val row = Warehouse2.q17SmallQuantity.run(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_lines") > 0)
    // independent recount through the raw tables
    val pa = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey".as("pk"))
      .agg(org.apache.spark.sql.functions.avg($"l_quantity").as("aq"))
    val brand = Tables.part(spark, sfDir).filter($"p_brand" === "Brand#13")
      .select($"p_partkey")
    val n = Tables.lineitem(spark, sfDir)
      .join(brand, $"l_partkey" === $"p_partkey")
      .join(pa, $"l_partkey" === $"pk")
      .filter($"l_quantity" < $"aq" * 0.2)
      .count()
    assert(row.getAs[Long]("n_lines") == n)
  }

  test("q2: every returned supplier holds the per-part min balance") {
    val rows = Warehouse2.q2MinSupplier.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("partkey"))
    for ((_, rs) <- byPart) {
      val bals = rs.map(_.getAs[Double]("acctbal")).distinct
      assert(bals.length == 1, "ties on the min all share one balance")
    }
  }

  test("q8: market share is within [0,1] and the fact scans once") {
    val df = Warehouse2.q8MarketShare.run(spark, sfDir)
    // explain BEFORE collecting: post-execution AQE explain prints the
    // initial plan too, double-counting the scan
    val sp = simplePlanOf(df)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, r.toString)
    }
    assert(sp.linesIterator.count(_.contains("lineitem.parquet")) == 1, sp)
    assert(!sp.contains("CartesianProduct"), sp)
  }

  test("q9: all dims broadcast around a single fact scan") {
    val df = Warehouse2.q9Profit.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("lineitem.parquet")) == 1, sp)
    assert(sp.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2, sp)
  }

  test("q16: deny-list runs as a broadcast anti join") {
    val df = Warehouse2.q16SupplierCnt.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.contains("LeftAnti"), sp)
    assert(!sp.contains("CartesianProduct"), sp)
  }

  test("q20: nested-IN chain is two semi joins, quantity HAVING after partial agg") {
    val df = Warehouse2.q20ExcessSuppliers.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("LeftSemi")) >= 2, sp)
    val p = planOf(df)
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"), p)
  }

  test("q21: exists/not-exists folds to aggregates — fact scans once, no self-join") {
    val df = Warehouse2.q21SoleReturner.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("lineitem.parquet")) == 1, sp)
    // semantic spot check against a literal three-scan formulation
    val f = Tables.orders(spark, sfDir).filter($"o_orderstatus" === "F")
      .select($"o_orderkey")
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", $"l_returnflag")
    val l1 = l.filter($"l_returnflag" === "R")
      .join(f, $"l_orderkey" === $"o_orderkey", "left_semi")
    val l2 = l.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
    val l3 = l.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
    val literal = l1
      .join(l2, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
      .join(l3, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3", "left_anti")
      .groupBy($"l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sup = Tables.supplier(spark, sfDir)
      .select($"s_suppkey", $"s_name").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    val got = Warehouse2.q21SoleReturner.run(spark, sfDir).collect()
      .map(r => sup(r.getAs[String]("supplier_name")) -> r.getAs[Long]("numwait")).toMap
    assert(got == literal, s"aggregate fold disagrees with the literal exists/not-exists")
  }

  test("q22: global average stays in exact decimal (cross-multiply), anti join for inactivity") {
    val df = Warehouse2.q22GlobalBalance.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.contains("LeftAnti"), sp)
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("numcust")).sum > 0)
  }

  test("dq5: shares conserve (floor loss < |bins| ppm), contributions nonneg, counts conserve") {
    import org.apache.spark.sql.functions._
    val rows = Warehouse2.dq5DistributionDrift.run(spark, sfDir).collect()
    val nBins = rows.length
    val pSum = rows.map(_.getAs[Long]("p_ppm")).sum
    val qSum = rows.map(_.getAs[Long]("q_ppm")).sum
    // each bin's floor drops < 1 ppm, so totals land in (1e6 - nBins, 1e6]
    assert(pSum > 1000000L - nBins && pSum <= 1000000L, s"p shares sum $pSum over $nBins bins")
    assert(qSum > 1000000L - nBins && qSum <= 1000000L, s"q shares sum $qSum over $nBins bins")
    assert(rows.forall(_.getAs[Long]("drift_contrib") >= 0L))
    val totalRows = rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum
    val orders = Tables.orders(spark, sfDir).count()
    assert(totalRows == orders, "every order lands in exactly one bin and period")
  }
}
