package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) — read as epoch-ns Long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/scan path once so per-query timings measure the
    // queries, not first-action initialization
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // min of two runs per query: the second run amortizes per-query JIT /
    // cache materialization noise, keeping totals comparable across rounds
    val results = SparkEntry.registry.map { q =>
      // a throwing query reports -1, NOT its time-to-exception — a broken
      // query must be visible in the JSON, not blended into the total
      def once(): Double = {
        val t0 = System.nanoTime()
        try { q.run(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      val a = once()
      q.name -> (if (a < 0) -1.0 else { val b = once(); if (b < 0) -1.0 else math.min(a, b) })
    }
    // bounded precision keeps the JSON line short: the driver captures only
    // the tail of the build output, and full-precision doubles pushed the
    // line past that window in round 2 (BENCH_r02 "parsed": null). Total at
    // ms, per-query at 10 ms — 100 queries × 1 saved char buys headroom.
    // Locale.ROOT: a comma-decimal default locale would print 0,123 and
    // break the driver's JSON parse
    def fmt(v: Double, p: String): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, p, Double.box(v))
    def ms(v: Double): String = fmt(v, "%.3f")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v, "%.2f") }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // the stdout line rides the driver's captured log TAIL and has been
    // truncated before (BENCH_r02 "parsed": null) — also write it as its
    // own file so BENCH_rN is always parseable with json.load
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    spark.stop()
  }
}
