package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Exact, Funnels}

/** Semantic gates for the LTV cohort triangle beyond oracle parity:
  * revenue conservation against the raw fact, cumulative monotonicity,
  * and the offset-0 anchor (a cohort's size is its own first cell).
  */
class LtvSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val tri = Funnels.ltvCohort.run(spark, sfDir).cache()

  test("triangle revenue sums to the raw order total") {
    val t = tri.agg(sum($"rev_cents")).as[Long].head()
    val raw = Tables.orders(spark, sfDir)
      .agg(sum((Exact.dec2($"o_totalprice") * 100).cast("long"))).as[Long].head()
    assert(t == raw)
  }

  test("cum_cents is the running sum of rev_cents and never decreases") {
    val rows = tri.select($"cohort_month", $"month_offset", $"rev_cents", $"cum_cents")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    rows.foreach { case (_, cells) =>
      val sorted = cells.sortBy(_._2)
      val running = sorted.scanLeft(0L)(_ + _._3).drop(1)
      assert(sorted.map(_._4).toSeq == running.toSeq)
    }
  }

  test("offset 0 anchors every cohort: n_active == cohort_size there") {
    val bad = tri.filter($"month_offset" === 0 && $"n_active" =!= $"cohort_size").count()
    assert(bad == 0L)
    // and every cohort HAS an offset-0 cell (min month is an order month)
    val cohorts = tri.select($"cohort_month").distinct().count()
    val zeros = tri.filter($"month_offset" === 0).count()
    assert(cohorts == zeros)
  }
}
