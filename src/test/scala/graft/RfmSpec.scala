package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Aggregations, Exact}

/** Semantic gates for RFM segmentation beyond the oracle parity:
  * population and revenue conservation against the raw fact, score
  * domain, and the quintile-ladder contract (each score band's customer
  * share is ≤ the tie-mass-adjusted bound — ties land on one side).
  */
class RfmSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val grid = Aggregations.a23RfmSegments.run(spark, sfDir).cache()

  test("conservation: segment grid sums to the raw customer/revenue totals") {
    val g = grid.agg(sum($"n_customers").as("n"), sum($"total_cents").as("c"))
      .collect().head
    val raw = Tables.orders(spark, sfDir).agg(
      countDistinct($"o_custkey").as("n"),
      sum((Exact.dec2($"o_totalprice") * 100).cast("long")).as("c"))
      .collect().head
    assert(g.getAs[Long]("n") == raw.getAs[Long]("n"))
    assert(g.getAs[Long]("c") == raw.getAs[Long]("c"))
  }

  test("scores stay in the 1-5 domain on every populated cell") {
    val bad = grid.filter(
      $"r_score" < 1 || $"r_score" > 5 ||
      $"f_score" < 1 || $"f_score" > 5 ||
      $"m_score" < 1 || $"m_score" > 5).count()
    assert(bad == 0L)
  }

  test("monetary quintile ladder: at least 20% of customers sit at or below m-score 1's ceiling") {
    // percentile_disc(0.2) is a member with cumulative share >= 0.2, and
    // the > ladder keeps everything at or below it in score 1 — so the
    // m_score=1 band can never hold LESS than 20% of customers (ties can
    // only inflate it). Same holds per dimension; m is the least tied.
    val n = grid.agg(sum($"n_customers")).as[Long].head()
    val band1 = grid.filter($"m_score" === 1).agg(sum($"n_customers")).as[Long].head()
    assert(band1 * 5 >= n, s"m_score=1 band $band1 of $n undercuts the 20% floor")
  }
}
