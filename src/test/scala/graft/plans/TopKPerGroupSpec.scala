package graft.plans

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** The custom physical operator must (1) actually plan as the
  * partial/final exec pair with the Exchange between them, (2) compute
  * exactly what the window idiom computes, (3) be independent of the
  * input partitioning, and (4) shrink the shuffle the way partial
  * aggregation does.
  */
class TopKPerGroupSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def base = graft.Tables.orders(spark, sfDir)
    .select($"o_orderpriority".as("priority"), $"o_orderkey".as("order_no"),
      $"o_totalprice".as("totalprice"))

  private def viaOperator(df: org.apache.spark.sql.DataFrame) =
    TopKPerGroup.topK(df, Seq("priority"),
      Seq(("totalprice", false), ("order_no", true)), k = 3)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("plans as partial -> Exchange -> final, with no Window or Sort") {
    val p = viaOperator(base).queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TopKPerGroupFinal"), p)
    assert(p.contains("TopKPerGroupPartial"), p)
    assert(p.contains("Exchange"), p)
    assert(!p.contains("Window") && !p.contains("Sort "), p)
    // partial below the exchange, final above it
    val lines = p.linesIterator.toSeq
    val fi = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    val ei = lines.indexWhere(_.contains("Exchange"))
    val pi = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    assert(fi < ei && ei < pi, s"operator order wrong:\n$p")
  }

  test("equals the window idiom exactly") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"priority").orderBy($"totalprice".desc, $"order_no")
    val viaWindow = base
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3).drop("rn")
    assert(asSet(viaOperator(base)) == asSet(viaWindow))
  }

  test("result is invariant to input partitioning") {
    val expected = asSet(viaOperator(base))
    for (parts <- Seq(1, 7, 64)) {
      assert(asSet(viaOperator(base.repartition(parts))) == expected,
        s"differs at $parts input partitions")
    }
  }

  test("partial pass bounds what reaches the shuffle") {
    // execute the PARTIAL exec alone and count what it emits — per input
    // partition at most k rows per group survive, so over p partitions
    // and g groups ≤ g·k·p rows enter the Exchange, independent of input
    // size. (A proxy through the full operator can't catch a regression
    // that passes every row through the partial: results stay equal.)
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    val parts = 8
    val input = base.repartition(parts)
    val inPlan = input.queryExecution.executedPlan
    def attr(n: String) = inPlan.output.find(_.name == n).get
    val partial = TopKPerGroupExec(
      Seq(attr("priority")),
      Seq(SortOrder(attr("totalprice"), Descending),
        SortOrder(attr("order_no"), Ascending)),
      k = 3, partial = true, inPlan)
    val outRows = partial.execute().count()
    val inRows = input.count()
    val nGroups = base.select($"priority").distinct().count()
    assert(inRows > nGroups * 3 * parts,
      "test premise: input is larger than the partial bound")
    assert(outRows <= nGroups * 3 * parts,
      s"partial emitted $outRows rows — bound is ${nGroups * 3 * parts}")
    assert(outRows < inRows, "partial pass did not shrink the stream")
    assert(viaOperator(input).count() == nGroups * 3)
  }

  test("global top-k (no group columns) is rejected at the API with guidance") {
    val e = intercept[IllegalArgumentException] {
      TopKPerGroup.topK(base, Seq(), Seq(("totalprice", false)), 3)
    }
    assert(e.getMessage.contains("orderBy"))
  }

  test("property: equals the window idiom on random data, any k / skew / partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      g <- Gen.chooseNum(0, 4)           // few groups → heavy per-group volume
      v <- Gen.chooseNum(-1000, 1000)    // dense value range → many ties
      id <- Gen.chooseNum(0L, 500L)      // tie-breaker (may itself collide → dedupe below)
    } yield (s"g$g", v, id)
    for (seed <- 1 to 5) {
      val rows = Gen.listOfN(400, rowGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .distinct // (group, value, id) must be unique for a total order
      val k = 1 + seed % 4
      val df = rows.toDF("grp", "value", "id").repartition(seed + 2)
      val viaOp = TopKPerGroup.topK(df, Seq("grp"),
        Seq(("value", false), ("id", true)), k)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"value".desc, $"id")
      val viaWin = df.withColumn("rn", row_number().over(w)).filter($"rn" <= k)
        .select($"grp", $"value", $"id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(viaOp == viaWin, s"seed=$seed k=$k")
    }
  }

  test("resolver rejects unknown columns with a useful message") {
    val e = intercept[IllegalArgumentException](
      TopKPerGroup.topK(base, Seq("nope"), Seq(("totalprice", false)), 1))
    assert(e.getMessage.contains("nope"))
  }

  test("t31 keyword extraction runs through the native operator, not a Window sort") {
    val p = graft.queries.TextAnalysis.keywordExtract.run(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(p.contains("TopKPerGroupFinal") && p.contains("TopKPerGroupPartial"), p)
    // the only Window is the rank stamp over the <=3 surviving rows per
    // doc, downstream of the operator — assert it sits ABOVE the final
    val lines = p.linesIterator.toSeq
    val wi = lines.indexWhere(_.contains("Window"))
    val fi = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    assert(wi >= 0 && fi > wi, s"rank window should be the only Window, above the operator:\n$p")
  }
}
