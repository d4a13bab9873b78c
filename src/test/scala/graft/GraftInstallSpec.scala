package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graft.install must wire every extension onto a plain session, and be
  * idempotent.
  */
class GraftInstallSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("install registers functions, rule, and strategy; calling twice is safe") {
    Graft.install(spark)
    Graft.install(spark)
    // functions resolve from SQL
    assert(spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").first.getDouble(0) == 11.0)
    assert(spark.sql(
      "SELECT bottom_k_sample(v, 2, 42) FROM VALUES ('a'), ('b'), ('c') t(v)")
      .first.getSeq[String](0).size == 2)
    assert(spark.sql(
      "SELECT freq_items(v, 4) FROM VALUES ('a'), ('a'), ('b') t(v)")
      .first.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap == Map("a" -> 2L, "b" -> 1L))
    // optimizer rule attached exactly once
    assert(spark.experimental.extraOptimizations
      .count(_ == plans.BoundedLevenshteinRule) == 1)
    // strategy attached exactly once and plans the custom operator
    assert(spark.experimental.extraStrategies.count(_ == plans.GraftStrategies) == 1)
    val df = Seq(("g", 1, 1L), ("g", 2, 2L)).toDF("grp", "value", "id")
    val p = plans.TopKPerGroup.topK(df, Seq("grp"), Seq(("value", false), ("id", true)), 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
  }
}
