package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ScansProjections

/** s5/s6 layout-level scan semantics: schema evolution via footer merge,
  * and planning-time partition pruning (the oracle gates prove VALUES;
  * these pin the SCAN MECHANICS the values ride on).
  */
class ScanLayoutSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("s5: pre-evolution files surface the new column as NULL, none lost") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val out = ScansProjections.s5SchemaEvolution.run(spark, sfDir)
    assert(out.agg(sum($"n_docs")).head.getLong(0) == total, "rows lost in merge")
    val pre = out.filter($"lang_read" === "(pre-evolution)").head
    assert(pre.getAs[Long]("n_docs") == docs.filter($"doc_id" % 2 === 0).count())
    // evolved rows carry real langs only
    val langs = out.filter($"lang_read" =!= "(pre-evolution)")
      .select($"lang_read").collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "zh", "fr", "es")))
  }

  test("s6: the lang predicate prunes partitions at planning time") {
    val df = ScansProjections.s6PartitionPruning.run(spark, sfDir)
    val p = planOf(df)
    assert(p.contains("PartitionFilters"), p)
    assert(p.contains("lang"), p)
    // pruned scan reads exactly the one partition: every file path in the
    // scan's selected partitions is under lang=en
    // sparkPlan, not executedPlan: AQE wraps the latter and hides the leaves
    val scan = df.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty, "expected a FileSourceScanExec leaf")
    val files = scan.get.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath).toSeq
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"unpruned files: ${files.filterNot(_.contains("lang=en")).take(3).mkString(", ")}")
  }

  test("s7: a runtime-derived dim key still prunes the partitioned scan (DPP)") {
    val df = ScansProjections.s7DynamicPruning.run(spark, sfDir)
    // the partition filter is a DYNAMIC subquery, not a literal — the
    // predicate text nowhere mentions 'en'
    val p = planOf(df)
    assert(p.contains("dynamicpruning"), p)
    // semantics: identical to the unpartitioned self-join computation
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val maj = docs.groupBy($"lang").count()
      .filter($"count" * 6 > total)
      .select($"lang").collect().map(_.getString(0)).toSet
    val expected = docs
      .filter($"lang".isin(maj.toSeq: _*))
      .groupBy($"source")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    assert(got == expected)
  }
}
