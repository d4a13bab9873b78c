package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** e17: the persisted-index probe. The oracle pins the rows; this pins
  * the LAYOUT mechanics — the postings scan reads only the nprobe'd
  * cells' partitions, and the persisted path agrees with the in-memory
  * e4 path at rank 1.
  */
class IvfPersistedSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("postings scan partition-prunes to the probed cells") {
    val df = IvfIndex.ivfPersistedQuery(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.getOrElse("Location", "").contains("postings") => f
    }
    assert(scans.nonEmpty, "expected a postings FileSourceScanExec")
    val files = scans.head.selectedPartitions.toPartitionArray
      .map(_.urlEncodedPath).toSeq
    val cellDirs = files.flatMap(
      "cell_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).toSet
    // the scan's partitions must be exactly the probed cells — nothing
    // outside the nprobe'd set is read
    val layout = IvfIndex.persistedLayout(spark, sfDir)
    val probed = IvfIndex.probeCells(
      graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 16),
      IvfIndex.Ivf(spark.read.parquet(s"$layout/centroids"),
        spark.read.parquet(s"$layout/centroids")), nprobe = 4)
      .select($"cell_id").distinct().collect().map(_.getInt(0)).toSet
    assert(files.nonEmpty && cellDirs == probed,
      s"scan read $cellDirs but probes cover $probed")
  }

  test("persisted path agrees with the in-memory e4 path at rank 1") {
    val persisted = IvfIndex.ivfPersistedQuery(spark, sfDir)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val inMemory = IvfIndex.ivfQuery(spark, sfDir)
      .select($"query_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(persisted == inMemory)
  }
}
