package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001, is deterministic, and respects
  * the registry contract (unique names, oracle keys ⊆ query keys).
  */
class RegistrySpec extends AnyFunSuite with SparkTestKit {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, s"duplicate names in $names")
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("bench JSON line stays inside the driver's log-tail window") {
    // the driver captures only the tail of the build output; round 2's
    // full-precision line outgrew it and BENCH_r02 recorded parsed: null.
    // Reconstruct the line exactly as Bench prints it, worst-case widths.
    // worst-case per-query width "99.99": Bench prints %.2f and no single
    // query can reach 100 s when the whole-bench budget is well under that
    val qs = SparkEntry.registry
      .map(q => "\"" + q.name + "\":" + "99.99").mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.999,"unit":"sec","queries":$qs,"errors":[],"sf":"/root/testdata/sf0.1"}"""
    // limit 2800: the driver tail window is ~2900 observed; worst-case
    // widths here already over-estimate the real line by ~450 chars
    // (actual BENCH_r03-era line ≈ 2.3 KB), so 100 chars of true margin
    // remain even at the bound. Next step past this: shorten names.
    assert(line.length < 2800,
      s"bench JSON line ${line.length} chars — approaching the ~2900-char tail window; " +
        "shorten names or split the payload before adding more queries")
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs and is deterministic at sf0.001") {
      val df1 = q.run(spark, sfDir)
      val n1 = df1.count()
      val n2 = q.run(spark, sfDir).count()
      assert(n1 == n2, s"${q.name} row count not stable: $n1 vs $n2")
      assert(df1.schema.nonEmpty)
    }
  }

  test("KPI revenue reconciles with the CM2 mart (U1/A5 invariant)") {
    import spark.implicits._
    val kpi = queries.CommerceKpi.execDailyKpi(spark, sfDir)
      .agg(sum($"total_revenue")).first.getDouble(0)
    val cm2 = queries.CommerceKpi.cm2(spark, sfDir)
      .agg(sum($"net_revenue")).first.getDouble(0)
    assert(math.abs(kpi - cm2) < 1e-4, s"kpi=$kpi cm2=$cm2")
  }

  test("CM2 margin waterfall: cm2_amount = net_revenue − commission − trx − freight") {
    import spark.implicits._
    val bad = queries.CommerceKpi.cm2(spark, sfDir)
      .filter(abs($"cm2_amount" -
        ($"net_revenue" - $"commission" - $"trx_fees" - $"freight_cost")) > lit(1e-9))
      .count()
    assert(bad == 0)
  }

  test("order rollup conserves quantity (A1 invariant)") {
    import spark.implicits._
    val total = Tables.lineitem(spark, sfDir).agg(sum($"l_quantity")).first.getDouble(0)
    val rolled = queries.Aggregations.a1Rollup.run(spark, sfDir)
      .agg(sum($"qty")).first.getDouble(0)
    assert(math.abs(total - rolled) < 1e-6)
  }
}
