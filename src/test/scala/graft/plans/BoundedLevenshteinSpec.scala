package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Gates for the bounded-levenshtein optimizer rule: the rewrite fires,
  * preserves results exactly (d7's blocked ER query as the workload), and
  * injects via the documented SparkSessionExtensions deployment path.
  */
class BoundedLevenshteinSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BoundedLevenshteinRule
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("rewrite fires: threshold levenshtein + length pre-filter in the optimized plan") {
    withRule {
      // parquet-backed (a LocalRelation would be constant-folded whole)
      val df = graft.Tables.customer(spark, sfDir)
        .filter(org.apache.spark.sql.functions.expr("levenshtein(c_name, c_mktsegment) <= 1"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(c_name"), opt)
      assert(opt.contains("Some(1)) >= 0"), s"no thresholded levenshtein:\n$opt")
      assert(opt.contains("abs("), s"no length pre-filter:\n$opt")
    }
  }

  test("strict bound lev < k rewrites to threshold k-1") {
    withRule {
      val opt = graft.Tables.customer(spark, sfDir)
        .filter(org.apache.spark.sql.functions.expr("levenshtein(c_name, c_mktsegment) < 2"))
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("Some(1)) >= 0"), s"strict-bound rewrite missing:\n$opt")
    }
  }

  test("rewrite preserves the d7 fuzzy-match result exactly (incl. nulls)") {
    val baseline = graft.queries.Dedup.fuzzyMatch.run(spark, sfDir).collect().toSet
    val optimized = withRule {
      graft.queries.Dedup.fuzzyMatch.run(spark, sfDir).collect().toSet
    }
    assert(optimized == baseline)
    assert(baseline.nonEmpty)

    // null operands: predicate stays null-rejecting under the rewrite
    val withNulls = Seq(("a", "a"), ("a", null), (null, null))
      .toDF("x", "y")
    def count(df: org.apache.spark.sql.DataFrame) = df
      .filter(org.apache.spark.sql.functions.expr("levenshtein(x, y) <= 1")).count()
    assert(withRule(count(withNulls)) == count(withNulls))
  }

  test("extensions path: a session built with GraftExtensions applies the rule") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-rule-test")
        .withExtensions(new graft.functions.GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val opt = graft.Tables.customer(s2, sfDir)
        .filter(org.apache.spark.sql.functions.expr("levenshtein(c_name, c_mktsegment) <= 1"))
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("Some(1)) >= 0"), s"extension-injected rule did not fire:\n$opt")
      // and the injected vec_dot function still resolves in the same session
      assert(s2.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
        .first.getDouble(0) == 2.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
