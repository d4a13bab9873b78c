package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Exact, Funnels}

/** Semantic gates for last-touch attribution beyond the oracle parity:
  * revenue conservation (every purchase attributed exactly once) on the
  * real data, and the window-boundary contract on synthetic frames —
  * strict-before, 7-day inclusive lower bound, recency winner, and the
  * (t_us, tid) tie-break.
  */
class AttributionSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private val DAY_US = 86400000000L

  private def touches(rows: (Long, Long, Long, String)*) =
    rows.toDF("user_id", "t_us", "tid", "channel")

  private def purchases(rows: (Long, Long, Long, Long)*) =
    rows.toDF("pid", "user_id", "p_us", "cents")

  private def winners(t: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): Map[Long, String] =
    Funnels.lastTouch(t, p).collect()
      .map(r => r.getAs[Long]("pid") -> r.getAs[String]("channel")).toMap

  test("conservation: channel rollup sums to the raw purchase totals") {
    val rolled = Funnels.attribution.run(spark, sfDir)
      .agg(sum($"n_purchases").as("n"), sum($"attributed_cents").as("c"))
      .collect().head
    val raw = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
      .agg(count(lit(1)).as("n"),
        sum((Exact.dec2($"value") * 100).cast("long")).as("c"))
      .collect().head
    assert(rolled.getAs[Long]("n") == raw.getAs[Long]("n"))
    assert(rolled.getAs[Long]("c") == raw.getAs[Long]("c"))
  }

  test("boundary contract: strict-before, 7-day inclusive floor, recency, direct") {
    val p = purchases((1L, 10L, 100L * DAY_US, 500L))
    // touch exactly AT the purchase instant: excluded (strict before)
    assert(winners(touches((10L, 100L * DAY_US, 1L, "ads")), p) == Map(1L -> "direct"))
    // touch exactly 7 days before: included (inclusive floor)
    assert(winners(touches((10L, 93L * DAY_US, 1L, "ads")), p) == Map(1L -> "ads"))
    // touch 7 days + 1 µs before: excluded
    assert(winners(touches((10L, 93L * DAY_US - 1L, 1L, "ads")), p) == Map(1L -> "direct"))
    // most recent in-window touch wins over an earlier one
    assert(winners(touches(
      (10L, 95L * DAY_US, 1L, "email"), (10L, 99L * DAY_US, 2L, "search")), p)
      == Map(1L -> "search"))
    // same-µs touches: higher tid wins (the pinned tie-break)
    assert(winners(touches(
      (10L, 99L * DAY_US, 7L, "email"), (10L, 99L * DAY_US, 9L, "social")), p)
      == Map(1L -> "social"))
    // another user's touch never attributes
    assert(winners(touches((11L, 99L * DAY_US, 1L, "ads")), p) == Map(1L -> "direct"))
  }

  private def credits(t: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): Map[(Long, String), Long] =
    Funnels.positionCredits(t, p).collect()
      .map(r => (r.getAs[Long]("pid"), r.getAs[String]("channel"))
        -> r.getAs[Long]("credit_cents")).toMap

  test("w24: U-shaped split is exact and conserves every purchase's cents") {
    val p = purchases((1L, 10L, 100L * DAY_US, 1003L))
    // no touch → direct gets everything
    assert(credits(touches(), p) == Map((1L, "direct") -> 1003L))
    // single touch → full credit (last-touch degenerate case)
    assert(credits(touches((10L, 99L * DAY_US, 1L, "ads")), p)
      == Map((1L, "ads") -> 1003L))
    // two touches → 40% to first, remainder (60%) to last
    assert(credits(touches(
      (10L, 95L * DAY_US, 1L, "email"), (10L, 99L * DAY_US, 2L, "search")), p)
      == Map((1L, "email") -> 401L, (1L, "search") -> 602L))
    // four touches → first 401, middles floor(200/2)=100 each, last absorbs
    // the remainder: 1003 − 401 − 200 = 402; exact conservation
    val four = credits(touches(
      (10L, 95L * DAY_US, 1L, "email"), (10L, 96L * DAY_US, 2L, "social"),
      (10L, 97L * DAY_US, 3L, "ads"), (10L, 99L * DAY_US, 4L, "search")), p)
    assert(four == Map((1L, "email") -> 401L, (1L, "social") -> 100L,
      (1L, "ads") -> 100L, (1L, "search") -> 402L))
    assert(four.values.sum == 1003L)
  }

  test("w24 conservation: credit rollup sums to the raw purchase totals") {
    val rolled = Funnels.positionAttribution.run(spark, sfDir)
      .agg(sum($"credited_cents").as("c")).collect().head
    val raw = Tables.events(spark, sfDir).filter($"event_type" === "purchase")
      .agg(sum((Exact.dec2($"value") * 100).cast("long")).as("c"))
      .collect().head
    assert(rolled.getAs[Long]("c") == raw.getAs[Long]("c"))
  }
}
