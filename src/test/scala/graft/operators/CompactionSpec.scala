package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestKit

/** Compaction: fewer files, identical rows, atomic swap leaves no debris. */
class CompactionSpec extends AnyFunSuite with SparkTestKit {

  import spark.implicits._

  test("compaction collapses a many-file table without changing its rows") {
    val dir = Files.createTempDirectory("graft-compact").resolve("t").toString
    // simulate a streaming sink: 40 tiny files
    (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet

    val stats = Compaction.compact(spark, dir, targetFileBytes = 64L * 1024 * 1024)
    assert(stats.filesBefore >= 40, stats.toString)
    assert(stats.filesAfter < stats.filesBefore / 10, stats.toString)

    val after = spark.read.parquet(dir).collect().toSet
    assert(after == before)
    // no temp/old debris left behind
    val parent = new java.io.File(dir).getParentFile.list().toSeq
    assert(parent == Seq("t"), parent.toString)
  }

  test("refuses a partitioned table root (would flatten the layout)") {
    val dir = Files.createTempDirectory("graft-compact3").resolve("t").toString
    (1L to 100L).map(i => (i, i % 3)).toDF("id", "part")
      .write.partitionBy("part").parquet(dir)
    val e = intercept[IllegalArgumentException](Compaction.compact(spark, dir))
    assert(e.getMessage.contains("subdirectories"))
    // table untouched
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("recovers an interrupted swap: dir missing, data stranded in .compact.old") {
    val dir = Files.createTempDirectory("graft-compact4").resolve("t").toString
    (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8).write.parquet(dir)
    val before = spark.read.parquet(dir).collect().toSet
    // simulate a crash between the two swap renames: the table dir was
    // renamed aside but the compacted tmp never renamed in
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(dir + ".compact.old")))
    new java.io.File(dir + ".compact.tmp").mkdirs() // half-written debris

    val stats = Compaction.compact(spark, dir)
    assert(spark.read.parquet(dir).collect().toSet == before)
    assert(stats.filesBefore == 8, stats.toString)
    val parent = f.getParentFile.list().toSeq
    assert(parent == Seq("t"), parent.toString)
  }

  test("idempotent: compacting a compacted table is a no-op layout-wise") {
    val dir = Files.createTempDirectory("graft-compact2").resolve("t").toString
    (1L to 100L).toDF("id").repartition(10).write.parquet(dir)
    val s1 = Compaction.compact(spark, dir)
    val s2 = Compaction.compact(spark, dir)
    assert(s1.filesAfter == s2.filesAfter)
    assert(spark.read.parquet(dir).count() == 100)
  }
}
