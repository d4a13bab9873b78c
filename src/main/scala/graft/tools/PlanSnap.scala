package graft.tools

import org.apache.spark.sql.SparkSession

/** Batch plan capture for the optimization rounds: write
  * `.explain("formatted")` for each named registry query to
  * `<outDir>/<name>_<suffix>.txt` in ONE session (PlanDump spawns a JVM
  * per query; capturing a dozen before/after plans needs one).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PlanSnap \
  *   <outDir> <suffix> <sfDir> <name> [name ...]"
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // execute through the noop sink first (guide §1.4) so the dumped
      // plan is AQE's FINAL plan (runtime join strategies, coalesced
      // reads), not the initial estimate-based one
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"[plansnap] $name noop run failed: ${e.getMessage}") }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plansnap] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
