package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** JDBC round-trip against embedded Derby (ships with Spark) — proves the
  * wrapper works end-to-end without an external database: write a gold
  * slice out, read it back whole and range-partitioned, check pushdown.
  */
class JdbcSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  private lazy val seeded: Unit = {
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("id", "name", "amount")
    Jdbc.write(df, url, "gold_kpi", SaveMode.Overwrite)
  }

  test("write then read round-trips rows and schema") {
    seeded
    val back = Jdbc.read(spark, url, "gold_kpi")
    assert(back.count() == 100)
    assert(back.columns.map(_.toLowerCase).toSet == Set("id", "name", "amount"))
    assert(back.filter($"id" === 7L).select($"amount").as[Double].head() == 10.5)
  }

  test("partitioned read splits into parallel range scans, same data") {
    seeded
    val part = Jdbc.readPartitioned(spark, url, "gold_kpi",
      partitionColumn = "id", lowerBound = 1L, upperBound = 101L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    // filters reach the generated per-partition SQL: the scan's external
    // engine query carries the pushed WHERE clause
    val plan = part.filter($"id" > 50L).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("\"id\" > 50"), plan)
  }

  test("append mode accumulates instead of replacing") {
    seeded
    val url2 = s"jdbc:derby:${Files.createTempDirectory("graft-derby2").resolve("db")};create=true"
    val df = Seq((1L, "a", 1.0)).toDF("id", "name", "amount")
    Jdbc.write(df, url2, "t", SaveMode.Overwrite)
    Jdbc.write(df, url2, "t", SaveMode.Append)
    assert(Jdbc.read(spark, url2, "t").count() == 2)
  }
}
