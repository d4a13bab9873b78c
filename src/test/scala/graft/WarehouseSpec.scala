package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Warehouse

/** Invariants + plan shapes for the warehouse pack (a11–a13, w9, q3/q5,
  * p10 SCD2, dq1). Values are oracle-gated by the driver; these tests pin
  * the semantic invariants that hold at ANY scale factor and the physical
  * properties that matter at 100 TB.
  */
class WarehouseSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  private def simplePlanOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("simple"))

  test("a11: grouping sets partition correctly (leaf counts sum to totals)") {
    val rows = Warehouse.groupingSetsAgg.run(spark, sfDir).collect()
    val leaves = rows.filter(r => r.getAs[Int]("is_s_total") == 0)
    val pTotals = rows.filter(r =>
      r.getAs[Int]("is_s_total") == 1 && r.getAs[Int]("is_p_total") == 0)
    val grand = rows.filter(r => r.getAs[Int]("is_p_total") == 1)
    assert(grand.length == 1)
    assert(leaves.map(_.getAs[Long]("n_orders")).sum
      == grand.head.getAs[Long]("n_orders"))
    for (t <- pTotals) {
      val p = t.getAs[String]("priority")
      assert(leaves.filter(_.getAs[String]("priority") == p)
        .map(_.getAs[Long]("n_orders")).sum == t.getAs[Long]("n_orders"),
        s"priority $p leaf counts don't sum to its subtotal")
    }
  }

  test("w9: trailing range frame always includes the current order") {
    val bad = Warehouse.rangeWindow.run(spark, sfDir)
      .filter($"n_orders_7d" < 1 || $"spend_7d" <= 0)
      .count()
    assert(bad == 0)
  }

  test("a12: quartiles are ordered and are actual data values") {
    val rows = Warehouse.exactPercentiles.run(spark, sfDir).collect()
    assert(rows.length == 5)
    val prices = graft.Tables.orders(spark, sfDir)
      .select($"o_totalprice").as[Double].collect().toSet
    for (r <- rows) {
      val (mn, p25, p50, p75, mx) = (r.getAs[Double]("min_price"),
        r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p75"), r.getAs[Double]("max_price"))
      assert(mn <= p25 && p25 <= p50 && p50 <= p75 && p75 <= mx, r.toString)
      // DISC percentiles return members of the data, not interpolations
      assert(prices.contains(p25) && prices.contains(p50) && prices.contains(p75))
    }
  }

  test("a13: mode matches a direct recount; ties break to smallest status") {
    val rows = Warehouse.modeStatus.run(spark, sfDir).collect()
    val counts = graft.Tables.orders(spark, sfDir)
      .groupBy($"o_orderpriority", $"o_orderstatus").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- rows) {
      val p = r.getAs[String]("priority")
      val best = counts.filter(_._1._1 == p).toSeq
        .sortBy { case ((_, s), n) => (-n, s) }.head
      assert(r.getAs[String]("modal_status") == best._1._2, s"priority $p")
      assert(r.getAs[Long]("n_orders") == best._2, s"priority $p")
    }
  }

  test("q3: filters push to scans, top-k is TakeOrdered, no cartesian") {
    val df = Warehouse.q3ShippingPriority.run(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    val sp = simplePlanOf(df)
    assert(!sp.contains("CartesianProduct") && !sp.contains("BroadcastNestedLoopJoin"), sp)
  }

  test("q5: dims broadcast, fact scanned once, date filter pushed") {
    val df = Warehouse.q5LocalSupplier.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, sp)
    assert(sp.linesIterator.count(_.contains("lineitem.parquet")) == 1, sp)
    val p = planOf(df)
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"), p)
  }

  test("q4: EXISTS runs as a semi join with both filters pushed, no fanout") {
    val df = Warehouse.q4OrderPriority.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.contains("LeftSemi"), sp)
    val p = planOf(df)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
    assert(p.contains("o_orderdate"), p)
  }

  test("q12: fact-side predicates reach the lineitem scan, one group shuffle") {
    val df = Warehouse.q12PriorityShipping.run(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("EqualTo(l_returnflag,N)"), p)
    assert(p.contains("l_shipdate"), p)
    val sp = simplePlanOf(df)
    assert(sp.linesIterator.count(_.contains("lineitem.parquet")) == 1, sp)
  }

  test("q14: part broadcasts, month window pushed, share recomputes from parts") {
    val df = Warehouse.q14PromoRevenue.run(spark, sfDir)
    val sp = simplePlanOf(df)
    assert(sp.contains("BroadcastHashJoin"), sp)
    val p = planOf(df)
    assert(p.contains("l_shipdate"), p)
    val row = df.head
    val (pct, promo, total) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    assert(pct == 100.0 * promo / total)
    assert(promo <= total && pct >= 0.0 && pct <= 100.0)
  }

  test("q19: per-side envelopes reach both scans despite the cross-table OR") {
    val df = Warehouse.q19Disjunctive.run(spark, sfDir)
    val p = planOf(df)
    // the hand-pushed envelopes appear as scan-level pushed filters
    assert(p.contains("In(p_brand"), p)
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)")
      && p.contains("LessThanOrEqual(l_quantity,30.0)"), p)
    val sp = simplePlanOf(df)
    assert(sp.contains("BroadcastHashJoin"), sp)
    // every surviving line satisfies its OWN brand's clause, not just the envelope
    import org.apache.spark.sql.functions._
    val viol = Warehouse.q19Disjunctive.run(spark, sfDir)
      .filter(col("brand") === "Brand#13" && col("n_lines") <= 0)
    assert(viol.isEmpty)
  }

  test("p10 SCD2: one current version per key, contiguous half-open intervals") {
    val v = Warehouse.scd2.run(spark, sfDir).cache()
    try {
      val perKeyCurrent = v.groupBy($"custkey")
        .agg(org.apache.spark.sql.functions.sum($"is_current").as("n_current"))
        .filter($"n_current" =!= 1).count()
      assert(perKeyCurrent == 0, "every business key needs exactly one current row")
      // each non-current version's valid_to equals the next version's valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"custkey").orderBy($"version")
      val broken = v
        .withColumn("next_from", org.apache.spark.sql.functions.lead($"valid_from_us", 1).over(w))
        .filter($"valid_to_us".isNotNull && $"valid_to_us" =!= $"next_from")
        .count()
      assert(broken == 0, "SCD2 intervals must chain contiguously")
    } finally v.unpersist()
  }

  test("q18: every selected order genuinely clears the HAVING threshold") {
    val viaQuery = Warehouse.q18BigOrders.run(spark, sfDir)
    assert(viaQuery.filter($"total_qty" <= 90).count() == 0)
    // membership equals a direct recount over the fact table
    val direct = graft.Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(org.apache.spark.sql.functions.sum($"l_quantity").as("q"))
      .filter($"q" > 90).count()
    assert(viaQuery.count() == direct)
  }

  test("w10: shares are positive and sum to exactly the whole") {
    val rows = Warehouse.pctOfTotal.run(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("share") > 0))
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"shares sum to $total")
  }

  test("a14: argmax tie-break is deterministic (max user among max-value ties)") {
    val rows = Warehouse.aggPack.run(spark, sfDir).collect()
    val events = graft.Tables.events(spark, sfDir)
      .select($"event_type", $"value", $"user_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    for (r <- rows) {
      val et = r.getAs[String]("event_type")
      val best = events.filter(_._1 == et).maxBy(e => (e._2, e._3))
      assert(r.getAs[Long]("top_user") == best._3, s"event_type $et")
    }
  }

  test("t17: weighted budgets bind per source and selection is maximal") {
    val sel = Warehouse.weightedMix.run(spark, sfDir).collect()
    assert(sel.forall(r => r.getAs[Long]("cum_tokens") <= r.getAs[Long]("budget")))
    // weighted sources may take more rows than unweighted ones
    val bySource = sel.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(bySource.getOrElse("src0", 0) >= bySource.getOrElse("src5", 0))
  }

  test("t21: temperature smoothing upsamples low-resource languages, conserves the budget") {
    val rows = Warehouse.temperatureMix.run(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    // q_l / p_l > 1 for the smallest language, < 1 for the largest —
    // the entire point of α < 1 smoothing
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
    def boost(r: org.apache.spark.sql.Row) =
      r.getAs[Double]("sample_prob") / (r.getAs[Long]("n_docs") / total)
    assert(boost(byN.head) > 1.0, s"low-resource lang not upsampled: ${byN.head}")
    assert(boost(byN.last) < 1.0, s"high-resource lang not downsampled: ${byN.last}")
    // sample_probs form a distribution and the expected docs spend the budget
    assert(math.abs(rows.map(_.getAs[Double]("sample_prob")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getAs[Double]("expected_docs")).sum - 100000.0) < 1e-6)
    // weight ordering follows count ordering (sqrt is monotone)
    assert(byN.map(_.getAs[Double]("weight")).toSeq == byN.map(_.getAs[Double]("weight")).sortBy(identity).toSeq)
  }

  test("t22: clipping binds to the exact band and z-scores center per source") {
    val rows = Warehouse.winsorize.run(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val clipped = rs.map(_.getAs[Long]("clipped"))
      // the band edges are actual member values and every row is inside
      assert(clipped.forall(v => v >= clipped.min && v <= clipped.max))
      rs.foreach { r =>
        assert(r.getAs[Boolean]("was_clipped") ==
          (r.getAs[Long]("n_chars") != r.getAs[Long]("clipped")), s"$src flag")
      }
      // standardization: z has mean ~0 and unit sample variance per source
      val zs = rs.map(_.getAs[Double]("z"))
      assert(math.abs(zs.sum / zs.length) < 1e-9, s"$src z-mean")
      val varZ = zs.map(z => z * z).sum / (zs.length - 1)
      assert(math.abs(varZ - 1.0) < 1e-9, s"$src z-variance $varZ")
    }
    // clipping actually fires on the shipped data, but only on the tails
    val frac = rows.count(_.getAs[Boolean]("was_clipped")).toDouble / rows.length
    assert(frac > 0.0 && frac < 0.15, s"clip fraction $frac")
  }

  test("a18: weighted median equals a local brute-force recompute") {
    val got = graft.queries.Aggregations.a18WeightedMedian.run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity".cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val total = rs.map(_._3).sum
      val sorted = rs.sortBy(_._2)
      var cum = 0L
      val median = sorted.find { r => cum += r._3; 2 * cum >= total }.get._2
      assert(got(flag) == ((total, median)), s"flag $flag: ${got(flag)} vs ($total, $median)")
    }
  }

  test("dq1: the shipped testdata passes every expectation") {
    val rows = Warehouse.dqExpectations.run(spark, sfDir).collect()
    assert(rows.length == 4)
    for (r <- rows)
      assert(r.getAs[Long]("n_violations") == 0L, r.getAs[String]("check_name"))
  }

  test("a32: CUSUM fires on a sustained small shift and only after it") {
    // 200 stationary days at 1000 cents, then a +8% level shift — small
    // enough that dq3's 3σ single-day z-score never fires (each day is
    // within the noise), but the cumulative excess must cross the alarm
    // line a bounded time after day 200 and STAY in alarm. Deterministic
    // ±2% hash noise, no Random.
    def noise(i: Int): Long = (math.abs((i * 2654435761L) % 41) - 20) // ±20 = ±2%
    val series = (1 to 300).map { i =>
      val base = if (i <= 200) 1000L else 1080L
      (java.sql.Date.valueOf(f"2024-01-01").toLocalDate.plusDays(i.toLong).toString,
        base + noise(i))
    }.toDF("day", "rev_c").selectExpr("CAST(day AS DATE) AS day", "rev_c")
    val out = Warehouse.cusumOver(series)
      .select($"day", $"is_alarm").collect()
      .map(r => r.getDate(0).toLocalDate.toString -> r.getInt(1)).sortBy(_._1)
    val firstAlarm = out.collectFirst { case (d, 1) => d }
    assert(firstAlarm.isDefined, "a sustained +8% shift must eventually alarm")
    val shiftDay = java.time.LocalDate.of(2024, 1, 1).plusDays(201).toString
    assert(firstAlarm.get >= shiftDay,
      s"alarm at ${firstAlarm.get} precedes the shift at $shiftDay")
    // detection delay bounded: slack is ~5% of mean, the shift is 8%, so
    // excess accrues ~3%/day scaled — one average day's worth (the alarm
    // line) within ~40 days
    assert(firstAlarm.get <= java.time.LocalDate.of(2024, 1, 1)
      .plusDays(245).toString, s"detection too slow: ${firstAlarm.get}")
    // and once in alarm under a sustained shift, it stays in alarm
    val afterFirst = out.dropWhile(_._2 == 0)
    assert(afterFirst.forall(_._2 == 1),
      "alarm must be sustained while the shift persists")
    // pre-shift: no alarm anywhere in the stationary prefix
    assert(out.takeWhile(_._1 < shiftDay).forall(_._2 == 0))
  }
}
