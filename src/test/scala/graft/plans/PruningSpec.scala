package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Partition-level scan economics — the properties that decide whether a
  * 100 TB monthly-partitioned table reads one month or the whole table:
  * static partition pruning (literal filter on the partition column),
  * DYNAMIC partition pruning (the filter arrives through a dim join at
  * runtime), and parquet schema evolution across partition generations.
  */
class PruningSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("t").toString

  /** Leaves of the FINAL plan — unwraps AQE's AdaptiveSparkPlanExec
    * (whose collectLeaves would return shell nodes without metrics).
    */
  private def finalLeaves(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      finalLeaves(a.executedPlan)
    case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      finalLeaves(qs.plan)
    case other =>
      // a childless node is a leaf even when it CARRIES subqueries (a
      // DPP'd scan holds its SubqueryBroadcast in subqueries)
      val self = if (other.children.isEmpty) Seq(other) else Seq.empty
      self ++ (other.children ++ other.subqueries).flatMap(finalLeaves)
  }

  private def fact(n: Int) = (0 until n).map { i =>
    (i.toLong, s"2026-${"%02d".format(i % 12 + 1)}", (i % 997).toDouble)
  }.toDF("id", "month_key", "value")

  test("static pruning: a literal month filter reads ONLY that partition's files") {
    val dir = tmp("prune-static")
    fact(12000).write.partitionBy("month_key").parquet(dir)
    val q = spark.read.parquet(dir).filter($"month_key" === "2026-03")
    q.collect()
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters:") && p.contains("month_key"), p)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .find(_.metrics.contains("numFiles")).get
    val filesRead = scan.metrics("numFiles").value
    val filesInPartition = new java.io.File(s"$dir/month_key=2026-03")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesRead == filesInPartition,
      s"read $filesRead files, partition holds $filesInPartition")
  }

  test("dynamic partition pruning: a dim-join filter prunes the fact scan at runtime") {
    val dir = tmp("prune-dpp")
    fact(12000).write.partitionBy("month_key").parquet(dir)
    // the dim must be a real relation (file scan), not a LocalTableScan —
    // DPP's pruning-side checks look for a filterable scan
    val dimDir = tmp("prune-dpp-dim")
    Seq(("2026-03", "Q1"), ("2026-06", "Q2"), ("2026-09", "Q3"))
      .toDF("m", "quarter").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try {
      val q = spark.read.parquet(dir)
        .join(broadcast(dim.filter($"quarter" === "Q1")), $"month_key" === $"m")
      q.collect()
      val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("dynamicpruning"),
        s"fact scan not dynamically pruned:\n$p")
      // the partitioned fact scan is the one carrying numPartitions
      // (the dim scan has numFiles only)
      val leaves = finalLeaves(q.queryExecution.executedPlan)
      val scan = leaves.find(_.metrics.contains("numPartitions")).getOrElse(
        fail(q.queryExecution.executedPlan.toString))
      assert(scan.metrics("numPartitions").value == 1,
        s"DPP left ${scan.metrics("numPartitions").value} partitions")
      // only 2026-03 survives the runtime filter; without DPP all 12
      // partitions' files would be read
      val filesRead = scan.metrics("numFiles").value
      val filesInPartition = new java.io.File(s"$dir/month_key=2026-03")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(filesRead == filesInPartition,
        s"DPP read $filesRead files, expected only the $filesInPartition of 2026-03")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", v)
      case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    }
  }

  test("schema evolution: mergeSchema reads old and new partition generations together") {
    val dir = tmp("prune-evolve")
    // generation 1: (id, month_key, value); generation 2 adds a column
    fact(100).write.partitionBy("month_key").parquet(dir)
    (0 until 100).map(i => (100L + i, "2027-01", i.toDouble, s"src${i % 3}"))
      .toDF("id", "month_key", "value", "source")
      .write.mode("append").partitionBy("month_key").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "month_key", "value", "source"))
    assert(merged.count() == 200)
    // old rows surface NULL for the new column — no rewrite required
    assert(merged.filter($"source".isNull).count() == 100)
    assert(merged.filter($"month_key" === "2027-01" && $"source".isNotNull).count() == 100)
  }
}
